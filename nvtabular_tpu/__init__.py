"""nvtabular_tpu — TPU-native tabular feature-engineering framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
NVIDIA-Merlin/NVTabular (reference mounted at /root/reference): the operator
library, Workflow facade, DAG engine, Dataset I/O, dataloaders, model
utilities, and tools — built for TPU hardware (jit-fused per-batch
transforms, psum/all-to-all statistics over a jax.sharding.Mesh) rather than
translated from the CUDA/dask implementation.
"""

__version__ = "0.1.0"

from . import dtypes
from . import ops
from .dag import ColumnSelector, Graph, Node
from .io import Dataset, Shuffle
from .schema import ColumnSchema, Schema
from .table import Column, TableBatch
from .tags import Tags, TagSet
from .workflow import Workflow, WorkflowNode

__all__ = [
    "ColumnSchema",
    "ColumnSelector",
    "Column",
    "Dataset",
    "Graph",
    "Node",
    "Schema",
    "Shuffle",
    "TableBatch",
    "Tags",
    "TagSet",
    "Workflow",
    "WorkflowNode",
    "dtypes",
    "ops",
]
