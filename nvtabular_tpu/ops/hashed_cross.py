"""HashedCross (reference nvtabular/ops/hashed_cross.py:24-91): combine
per-column hashes into one crossed categorical feature ``a_X_b``."""

from __future__ import annotations

from typing import Dict, Union

import numpy as np

from .. import dtypes as md
from ..dispatch import hash_array
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from ..tags import Tags
from .operator import Operator


class HashedCross(Operator):
    def __init__(self, num_buckets: Union[int, Dict[str, int]]):
        if not isinstance(num_buckets, (int, dict)):
            raise TypeError("num_buckets must be int or dict")
        super().__init__()
        self.num_buckets = num_buckets

    def is_jit_safe(self, col_selector, input_schema):
        if input_schema is None:
            return False
        return all(
            not cs.dtype.is_string and cs.dtype.is_numeric for cs in input_schema
        )

    def _output_name(self, col_selector: ColumnSelector) -> str:
        return "_X_".join(sorted(col_selector.names))

    def column_mapping(self, col_selector: ColumnSelector):
        return {self._output_name(col_selector): list(col_selector.names)}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        nb = (
            self.num_buckets
            if isinstance(self.num_buckets, int)
            else self.num_buckets[self._output_name(col_selector)]
        )
        combined = None
        for name in sorted(col_selector.names):
            h = hash_array(batch[name].values)
            combined = h if combined is None else (combined * np.uint32(31) ^ h)
        m = xnp(combined)
        codes = (combined % np.uint32(nb)).astype(np.int32 if m is np else "int32")
        out[self._output_name(col_selector)] = Column(codes)
        return out

    @property
    def output_dtype(self):
        return md.int32

    @property
    def output_tags(self):
        return [Tags.CATEGORICAL]

    def _compute_properties(self, col_schema, input_schema):
        nb = (
            self.num_buckets
            if isinstance(self.num_buckets, int)
            else self.num_buckets.get(col_schema.name)
        )
        if nb:
            return col_schema.with_properties(
                {"domain": {"min": 0, "max": nb - 1, "name": col_schema.name}}
            )
        return col_schema

    def serialize_params(self):
        return {"num_buckets": self.num_buckets}
