from deeptreeattention_tpu.train import checkpoints, ecology, metrics, optim, steps  # noqa: F401
from deeptreeattention_tpu.train.trainer import Trainer  # noqa: F401
from deeptreeattention_tpu.train.treemodel import TreeModel  # noqa: F401
