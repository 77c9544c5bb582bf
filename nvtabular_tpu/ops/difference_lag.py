"""DifferenceLag (reference nvtabular/ops/difference_lag.py:23-105): lag/lead
differences within pre-sorted partitions, masking across partition-key
boundaries via shifted-key comparison."""

from __future__ import annotations

from typing import List, Union

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from .operator import Operator


class DifferenceLag(Operator):
    jit_safe = True

    def __init__(self, partition_cols: Union[str, List[str]], shift: Union[int, List[int]] = 1):
        super().__init__()
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.shifts = [shift] if isinstance(shift, int) else list(shift)

    @property
    def dependencies(self):
        return [ColumnSelector(self.partition_cols)]

    def column_mapping(self, col_selector: ColumnSelector):
        out = {}
        for shift in self.shifts:
            for name in col_selector.names:
                if name in self.partition_cols:
                    continue
                out[f"{name}_difference_lag_{shift}"] = [name]
        return out

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        sel = super().compute_selector(input_schema, selector, parents_selector, dependencies_selector)
        return ColumnSelector([n for n in sel.names if n not in self.partition_cols])

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        n = batch.num_rows
        # rows belong to the same group iff every partition key matches when shifted
        for shift in self.shifts:
            same = None
            for pcol in self.partition_cols:
                vals = batch[pcol].values
                m = xnp(vals)
                eq = _shift_equal(vals, shift, m)
                same = eq if same is None else (same & eq)
            for name in col_selector.names:
                if name in self.partition_cols:
                    continue
                col = batch[name]
                m = xnp(col.values)
                fvals = col.values.astype("float32")
                shifted = _shift(fvals, shift, m)
                diff = fvals - shifted
                diff = m.where(same, diff, m.asarray(np.nan, dtype=diff.dtype))
                out[f"{name}_difference_lag_{shift}"] = Column(diff.astype("float32"))
        return out

    @property
    def output_dtype(self):
        return md.float32

    def serialize_params(self):
        return {"partition_cols": self.partition_cols, "shift": self.shifts}

    @classmethod
    def deserialize_params(cls, params):
        return {"partition_cols": params["partition_cols"], "shift": params["shift"]}


def _shift(vals, shift, m):
    """Shift values by `shift` rows (positive = lag), fill with NaN-safe 0."""
    if m is np:
        out = np.empty_like(vals)
        if shift >= 0:
            out[:shift] = np.nan
            out[shift:] = vals[: len(vals) - shift] if shift else vals
        else:
            out[shift:] = np.nan
            out[:shift] = vals[-shift:]
        return out
    import jax.numpy as jnp

    rolled = jnp.roll(vals, shift)
    n = vals.shape[0]
    idx = jnp.arange(n)
    invalid = (idx < shift) if shift >= 0 else (idx >= n + shift)
    return jnp.where(invalid, jnp.nan, rolled)


def _shift_equal(vals, shift, m):
    """True where row i and row i-shift have equal key values."""
    if m is np:
        n = len(vals)
        eq = np.zeros(n, dtype=bool)
        if shift >= 0:
            eq[shift:] = vals[shift:] == vals[: n - shift] if shift else True
        else:
            eq[:shift] = vals[:shift] == vals[-shift:]
        return eq
    import jax.numpy as jnp

    rolled = jnp.roll(vals, shift)
    n = vals.shape[0]
    idx = jnp.arange(n)
    invalid = (idx < shift) if shift >= 0 else (idx >= n + shift)
    return jnp.where(invalid, False, vals == rolled)
