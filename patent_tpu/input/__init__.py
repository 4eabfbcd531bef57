"""Image input pipeline (decode/resize/normalize -> device batches)."""

from .pipeline import (  # noqa: F401
    CLIP_MEAN,
    CLIP_STD,
    IMAGE_SIZE,
    ImageBatcher,
    decode_image,
    list_images,
    normalize_array,
    shard_paths_per_host,
)
