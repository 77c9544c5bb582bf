"""Parallelism: device meshes, sharded training, distributed statistics.

The TPU replacement for the reference's dask.distributed backend
(SURVEY.md §2.8): no external scheduler — a multi-controller JAX runtime
with XLA collectives over ICI/DCN. The dask task graph becomes SPMD phases;
``LocalCUDACluster``/UCX setup (reference
bench/examples/dask-nvtabular-criteo-benchmark.py:174-194) becomes
``make_mesh`` + sharding annotations.
"""

from .mesh import initialize_distributed, make_mesh, local_mesh
from .embeddings import sharded_embedding_bag, sharded_embedding_lookup
from .sharded_vocab import sharded_value_counts
from .stats import sharded_moments
from .train import make_train_step, shard_batch, shard_params

__all__ = [
    "initialize_distributed",
    "local_mesh",
    "make_mesh",
    "make_train_step",
    "shard_batch",
    "shard_params",
    "sharded_embedding_bag",
    "sharded_embedding_lookup",
    "sharded_moments",
    "sharded_value_counts",
]
