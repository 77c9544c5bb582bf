"""Training-feed data loaders.

TPU-native re-design of the reference's loader stack
(nvtabular/loader/{backend,torch,tensorflow}.py wrapping the external
merlin-dataloader): chunked background reads, in-chunk shuffle, fixed-size
jax-array batches, multi-process sharding, ragged→padded multihot.
"""

from .device_loader import DeviceLoader
from .loader import Loader, augment_schema

__all__ = ["DeviceLoader", "Loader", "augment_schema"]
