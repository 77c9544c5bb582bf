"""Dataset I/O: out-of-core columnar scans, shuffled parquet writes.

TPU-native re-creation of the external ``merlin.io`` engine used by the
reference (interface at reference nvtabular/workflow/workflow.py:33,239-248
and SURVEY.md §2.9): parquet/csv row-group streaming into host-RAM columnar
batches that the executor promotes to HBM, instead of dask_cudf partitions.
"""

from .dataset import Dataset
from .shuffle import Shuffle
from .writer import ParquetWriter

__all__ = ["Dataset", "Shuffle", "ParquetWriter"]
