from deeptreeattention_tpu.utils.config import read_config  # noqa: F401  (reference-compatible re-export)
from deeptreeattention_tpu.data.dataset import TreeDataset, Loader  # noqa: F401
from deeptreeattention_tpu.data.datamodule import TreeData  # noqa: F401
from deeptreeattention_tpu.data.filter import filter_data  # noqa: F401
from deeptreeattention_tpu.data.split import sample_plots, train_test_split  # noqa: F401
