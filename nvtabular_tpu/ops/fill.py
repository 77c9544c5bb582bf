"""FillMissing / FillMedian (reference nvtabular/ops/fill.py:23-146).

FillMissing: constant fillna + optional `<col>_filled` bool indicators; has a
C++ serving fast path hook like the reference (fill.py:59-65).
FillMedian: per-column median from a streaming reservoir quantile (the
reference used dask's approximate quantile, fill.py:117-121).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from .operator import Operator
from .stat_operator import StatOperator
from .moments import ReservoirSample


def _fill_column(col: Column, fill_val: float, m) -> Column:
    nulls = col.is_null()
    if col.is_list:
        return col
    vals = col.values
    if vals.dtype.kind == "O":
        out = np.asarray(vals, dtype=object).copy()
        out[np.asarray(nulls)] = fill_val
        return Column(out)
    fill = m.asarray(fill_val, dtype=vals.dtype) if m is not np else np.asarray(
        fill_val
    ).astype(vals.dtype)
    filled = m.where(nulls, fill, vals)
    return Column(filled)


class FillMissing(Operator):
    jit_safe = True

    def __init__(self, fill_val=0, add_binary_cols: bool = False):
        super().__init__()
        self.fill_val = fill_val
        self.add_binary_cols = add_binary_cols

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            nulls = col.is_null()
            out[name] = _fill_column(col, self.fill_val, m)
            if self.add_binary_cols:
                out[f"{name}_filled"] = Column(nulls)
        return out

    def column_mapping(self, col_selector):
        mapping = {}
        for name in col_selector.names:
            mapping[name] = [name]
            if self.add_binary_cols:
                mapping[f"{name}_filled"] = [name]
        return mapping

    def _compute_dtype(self, col_schema, input_schema):
        from .. import dtypes as md

        if col_schema.name.endswith("_filled"):
            return col_schema.with_dtype(md.boolean)
        return super()._compute_dtype(col_schema, input_schema)

    def inference_initialize(self, col_selector, model_config=None):
        """C++ hash-free vectorized fill for serving (csrc/ extension)."""
        if self.add_binary_cols:
            return None
        try:
            from ..serving import native

            return native.FillTransform(self.fill_val)
        except Exception:
            return None

    def serialize_params(self):
        return {"fill_val": self.fill_val, "add_binary_cols": self.add_binary_cols}


class FillMedian(StatOperator):
    jit_safe = True

    def __init__(self, add_binary_cols: bool = False):
        super().__init__()
        self.add_binary_cols = add_binary_cols
        self.medians: Dict[str, float] = {}

    def fit_init(self, col_selector, input_schema):
        return {name: ReservoirSample() for name in col_selector.names}

    def fit_batch(self, col_selector, batch, state):
        for name in col_selector.names:
            col = batch[name].to_host()
            nulls = np.asarray(col.is_null())
            vals = np.asarray(col.values, dtype=np.float64)
            state[name].update(vals[~nulls] if not col.is_list else vals)
        return state

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            for name in out:
                out[name] = out[name].merge(s[name])
        return out

    def fit_finalize(self, state):
        for name, sample in state.items():
            self.medians[name] = sample.quantile(0.5)

    def clear(self):
        super().clear()
        self.medians = {}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            nulls = col.is_null()
            out[name] = _fill_column(col, self.medians.get(name, 0.0), m)
            if self.add_binary_cols:
                out[f"{name}_filled"] = Column(nulls)
        return out

    def column_mapping(self, col_selector):
        mapping = {}
        for name in col_selector.names:
            mapping[name] = [name]
            if self.add_binary_cols:
                mapping[f"{name}_filled"] = [name]
        return mapping

    def _compute_dtype(self, col_schema, input_schema):
        from .. import dtypes as md

        if col_schema.name.endswith("_filled"):
            return col_schema.with_dtype(md.boolean)
        return super()._compute_dtype(col_schema, input_schema)

    def serialize_params(self):
        return {"add_binary_cols": self.add_binary_cols}

    def serialize_state(self):
        if not self.fitted:
            return None
        return {"medians": self.medians}

    def deserialize_state(self, state):
        self.medians = dict(state["medians"])
        self.fitted = True
