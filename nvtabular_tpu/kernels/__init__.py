"""Device kernels for ragged/list data (see README.md for the v5e
measurements that shape these implementations)."""

from .ragged import (
    padded_embedding_bag,
    ragged_segment_reduce,
    ragged_slice_padded,
    ragged_to_padded,
)

__all__ = [
    "padded_embedding_bag",
    "ragged_segment_reduce",
    "ragged_slice_padded",
    "ragged_to_padded",
]
