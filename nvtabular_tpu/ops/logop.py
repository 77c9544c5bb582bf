"""LogOp (reference nvtabular/ops/logop.py:29-63): log1p, list-aware,
output float32."""

from __future__ import annotations

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from .operator import Operator


class LogOp(Operator):
    jit_safe = True

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            vals = m.log1p(col.values.astype(np.float32 if m is np else "float32"))
            out[name] = Column(vals, col.offsets, col.validity)
        return out

    @property
    def output_dtype(self):
        return md.float32
