"""Clip op (reference nvtabular/ops/clip.py:21-57)."""

from __future__ import annotations

from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from .operator import Operator


class Clip(Operator):
    """Clamp continuous values to [min_value, max_value]."""

    jit_safe = True

    def __init__(self, min_value=None, max_value=None):
        if min_value is None and max_value is None:
            raise ValueError("Clip needs min_value and/or max_value")
        super().__init__()
        self.min_value = min_value
        self.max_value = max_value

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            vals = m.clip(col.values, self.min_value, self.max_value)
            out[name] = Column(vals, col.offsets, col.validity)
        return out

    def serialize_params(self):
        return {"min_value": self.min_value, "max_value": self.max_value}
