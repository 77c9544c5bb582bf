"""Bucketize (reference nvtabular/ops/bucketize.py:24-104): digitize against
per-column boundaries → int32 categorical."""

from __future__ import annotations

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from ..tags import Tags
from .operator import Operator


class Bucketize(Operator):
    jit_safe = True

    def __init__(self, boundaries):
        super().__init__()
        if isinstance(boundaries, (list, tuple)):
            self.boundaries = None
            self._list_boundaries = [float(b) for b in boundaries]
        elif isinstance(boundaries, dict):
            self.boundaries = {k: [float(x) for x in v] for k, v in boundaries.items()}
            self._list_boundaries = None
        else:
            raise TypeError("boundaries must be a list or dict of lists")

    def _bounds_for(self, name):
        if self.boundaries is not None:
            if name not in self.boundaries:
                raise ValueError(f"No boundaries given for column {name!r}")
            return self.boundaries[name]
        return self._list_boundaries

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            m = xnp(col.values)
            bounds = self._bounds_for(name)
            if m is np:
                codes = np.digitize(col.values, bounds, right=False).astype(np.int32)
            else:
                import jax.numpy as jnp

                codes = jnp.searchsorted(
                    jnp.asarray(bounds, dtype=col.values.dtype), col.values, side="right"
                ).astype(jnp.int32)
            out[name] = Column(codes, col.offsets, col.validity)
        return out

    @property
    def output_dtype(self):
        return md.int32

    @property
    def output_tags(self):
        return [Tags.CATEGORICAL]

    def serialize_params(self):
        return {"boundaries": self.boundaries if self.boundaries is not None else self._list_boundaries}
