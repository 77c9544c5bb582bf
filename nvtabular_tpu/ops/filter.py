"""Filter (reference nvtabular/ops/filter.py:28-64): row filter from a user
callable returning a boolean mask or filtered frame."""

from __future__ import annotations

import numpy as np

from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .operator import Operator


class Filter(Operator):
    jit_safe = False

    def __init__(self, f):
        if not callable(f):
            raise ValueError("Filter requires a callable")
        super().__init__()
        self.f = f

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        batch = batch.to_host()
        selected = batch.select([n for n in col_selector.names if n in batch])
        result = self.f(selected)
        if isinstance(result, TableBatch):
            return result
        if isinstance(result, Column):
            result = np.asarray(result.values)
        mask = np.asarray(result)
        if mask.dtype != np.bool_:
            raise ValueError("Filter callable must return a boolean mask or TableBatch")
        return selected.filter(mask)

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        return input_schema.apply(col_selector)

    def serialize_params(self):
        from ..workflow.callable_ref import callable_to_ref

        return {"f": callable_to_ref(self.f)}

    @classmethod
    def deserialize_params(cls, params):
        from ..workflow.callable_ref import ref_to_callable

        return {"f": ref_to_callable(params["f"])}
