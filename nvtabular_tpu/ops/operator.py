"""Public Operator base class (reference nvtabular/ops/operator.py:16-27)."""

from __future__ import annotations

from ..dag.base_operator import BaseOperator, Supports
from ..selector import ColumnSelector

__all__ = ["Operator", "ColumnSelector", "Supports"]


class Operator(BaseOperator):
    @property
    def supports(self) -> Supports:
        return Supports.CPU_DATAFRAME | Supports.CPU_DICT_ARRAY
