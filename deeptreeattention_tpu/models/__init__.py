from deeptreeattention_tpu.models.hang2020 import (  # noqa: F401
    Classifier,
    ConvModule,
    Hang2020,
    SpatialAttention,
    SpatialNetwork,
    SpectralAttention,
    SpectralNetwork,
    VanillaCNN,
    load_from_backbone,
)
from deeptreeattention_tpu.models.year import LearnedEnsemble, load_year_backbones  # noqa: F401
from deeptreeattention_tpu.models.multi_stage import MultiStage  # noqa: F401
from deeptreeattention_tpu.models.metadata import (  # noqa: F401
    Metadata,
    MetadataModel,
    MetadataSensorFusion,
)
from deeptreeattention_tpu.models.resnet import ResNet  # noqa: F401
