"""Dropna (reference nvtabular/ops/dropna.py:21-39): drop rows with nulls in
the selected columns. Data-dependent output shape → host path only."""

from __future__ import annotations

import numpy as np

from ..selector import ColumnSelector
from ..table import TableBatch
from .operator import Operator


class Dropna(Operator):
    jit_safe = False

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        batch = batch.to_host()
        mask = np.ones(batch.num_rows, dtype=bool)
        for name in col_selector.names:
            mask &= ~np.asarray(batch[name].is_null())
        return batch.filter(mask)

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        return input_schema
