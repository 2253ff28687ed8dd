from deeptreeattention_tpu.ops.preprocess import (
    clip_bands,
    load_image,
    minmax_scale_pixels,
    nearest_resize,
    preprocess_image,
    preprocess_batch,
    train_augmentation,
)
from deeptreeattention_tpu.ops import windows  # noqa: F401
