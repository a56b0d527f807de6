"""Host-side input pipeline (decode, prefetch, caching).

The data-loading layer the reference never had: its estimators decode
inputs inline on the calling thread (reference image_entropy.py:39-49,
cross_modal.py:55-60).  Here ingestion is a pipeline stage of its own,
designed to keep the TPU fed: threaded decode, bounded prefetch queues
that overlap host IO with device compute, uint8 transport with on-device
normalization, and a decode-once cache shared by every signal stage.
"""

from .images import (
    ImageCache,
    decode_batch,
    decode_image_uint8,
    iter_padded_batches,
    resize_uint8,
)

__all__ = [
    "ImageCache",
    "decode_batch",
    "decode_image_uint8",
    "iter_padded_batches",
    "resize_uint8",
]
