from deeptreeattention_tpu.utils.config import read_config, default_config
from deeptreeattention_tpu.utils.logging import Experiment, get_logger
