"""Framework bridges.

The reference's model-side layers (framework_utils/{torch,tensorflow}/)
are re-designed as pure JAX in ``nvtabular_tpu.models``. This package keeps
the FRAMEWORK-FACING bridges: the TF feature-column → Workflow converter
and the tfrecords → parquet ingest tool.
"""

from .feature_column_utils import make_feature_column_workflow
from .tfrecords_to_parquet import convert_tfrecords_to_parquet

__all__ = ["convert_tfrecords_to_parquet", "make_feature_column_workflow"]
