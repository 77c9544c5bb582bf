"""Public StatOperator re-export (reference nvtabular/ops/stat_operator.py:16)."""

from ..dag.base_operator import StatOperator

__all__ = ["StatOperator"]
