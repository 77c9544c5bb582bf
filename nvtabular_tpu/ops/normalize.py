"""Normalize / NormalizeMinMax (reference nvtabular/ops/normalize.py:33-212).

Normalize: z-score standardization from single-pass streaming moments.
NormalizeMinMax: min-max scaling from streaming min/max.
Transform is pure elementwise math → fully jit-fusable on TPU.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .. import dtypes as md
from ..dispatch import annotate
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from ..tags import Tags
from .operator import Operator
from .stat_operator import StatOperator
from .moments import MomentsState


class Normalize(StatOperator):
    """(x - mean) / std; list columns normalize their flat values."""

    jit_safe = True

    def __init__(self, out_dtype=None):
        super().__init__()
        self.means: Dict[str, float] = {}
        self.stds: Dict[str, float] = {}
        self.out_dtype = out_dtype

    # --- fit ---------------------------------------------------------------
    def fit_init(self, col_selector: ColumnSelector, input_schema):
        return MomentsState(col_selector.names)

    def fit_batch(self, col_selector, batch, state: MomentsState):
        return state.update_batch(batch, col_selector.names)

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            out = out.merge(s)
        return out

    def fit_finalize(self, state: MomentsState):
        for name, mom in state.columns.items():
            self.means[name] = mom.mean
            self.stds[name] = mom.std

    def clear(self):
        super().clear()
        self.means, self.stds = {}, {}

    # --- transform ---------------------------------------------------------
    @annotate("Normalize.transform")
    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        tgt = md.normalize(self.out_dtype).numpy_dtype if self.out_dtype else np.float32
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            mean = self.means.get(name, 0.0)
            std = self.stds.get(name, 0.0)
            vals = col.values.astype(tgt if m is np else str(np.dtype(tgt)))
            if std > 0:
                vals = (vals - m.asarray(mean, dtype=vals.dtype)) / m.asarray(
                    std, dtype=vals.dtype
                )
            else:
                vals = vals - m.asarray(mean, dtype=vals.dtype)
            out[name] = Column(vals, col.offsets, col.validity)
        return out

    @property
    def output_dtype(self):
        return md.normalize(self.out_dtype) if self.out_dtype else md.float32

    @property
    def output_tags(self):
        return [Tags.CONTINUOUS]

    # --- persistence -----------------------------------------------------
    def serialize_params(self):
        return {"out_dtype": self.out_dtype if isinstance(self.out_dtype, (str, type(None))) else md.normalize(self.out_dtype).name}

    def serialize_state(self):
        if not self.fitted:
            return None
        return {"means": self.means, "stds": self.stds}

    def deserialize_state(self, state):
        self.means = dict(state["means"])
        self.stds = dict(state["stds"])
        self.fitted = True


class NormalizeMinMax(StatOperator):
    """(x - min) / (max - min) (reference normalize.py:127-212)."""

    jit_safe = True

    def __init__(self, out_dtype=None):
        super().__init__()
        self.mins: Dict[str, float] = {}
        self.maxs: Dict[str, float] = {}
        self.out_dtype = out_dtype

    def fit_init(self, col_selector, input_schema):
        return MomentsState(col_selector.names)

    def fit_batch(self, col_selector, batch, state):
        return state.update_batch(batch, col_selector.names)

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            out = out.merge(s)
        return out

    def fit_finalize(self, state: MomentsState):
        for name, mom in state.columns.items():
            self.mins[name] = mom.min if mom.count else 0.0
            self.maxs[name] = mom.max if mom.count else 0.0

    def clear(self):
        super().clear()
        self.mins, self.maxs = {}, {}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        tgt = md.normalize(self.out_dtype).numpy_dtype if self.out_dtype else np.float32
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            lo = self.mins.get(name, 0.0)
            hi = self.maxs.get(name, 0.0)
            vals = col.values.astype(tgt if m is np else str(np.dtype(tgt)))
            span = hi - lo
            if span > 0:
                vals = (vals - m.asarray(lo, dtype=vals.dtype)) / m.asarray(
                    span, dtype=vals.dtype
                )
            else:
                vals = m.zeros_like(vals)
            out[name] = Column(vals, col.offsets, col.validity)
        return out

    @property
    def output_dtype(self):
        return md.normalize(self.out_dtype) if self.out_dtype else md.float32

    @property
    def output_tags(self):
        return [Tags.CONTINUOUS]

    def serialize_params(self):
        return {"out_dtype": self.out_dtype if isinstance(self.out_dtype, (str, type(None))) else md.normalize(self.out_dtype).name}

    def serialize_state(self):
        if not self.fitted:
            return None
        return {"mins": self.mins, "maxs": self.maxs}

    def deserialize_state(self, state):
        self.mins = dict(state["mins"])
        self.maxs = dict(state["maxs"])
        self.fitted = True
