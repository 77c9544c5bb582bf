"""HashBucket (reference nvtabular/ops/hash_bucket.py:32-131):
``hash(col) % num_buckets`` → int32 categorical; list-aware.

Unlike the reference (whose CPU and GPU hashes differ,
categorify.py:332-338), the uint32 murmur-style hash in dispatch.py gives
identical codes on host numpy and TPU."""

from __future__ import annotations

from typing import Dict, Union

import numpy as np

from .. import dtypes as md
from ..dispatch import hash_array
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from ..tags import Tags
from .operator import Operator


class HashBucket(Operator):
    def __init__(self, num_buckets: Union[int, Dict[str, int]]):
        if isinstance(num_buckets, dict):
            self.num_buckets = num_buckets
        elif isinstance(num_buckets, int):
            self.num_buckets = num_buckets
        else:
            raise TypeError("num_buckets must be int or dict of column->int")
        super().__init__()

    def is_jit_safe(self, col_selector, input_schema):
        if input_schema is None:
            return False
        for name in (col_selector.names if col_selector else input_schema.column_names):
            cs = input_schema.get(name)
            if cs is not None and (cs.dtype.is_string or not cs.dtype.is_numeric):
                return False
        return True

    def _nb(self, name: str) -> int:
        if isinstance(self.num_buckets, dict):
            return self.num_buckets[name]
        return self.num_buckets

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            nb = self._nb(name)
            h = hash_array(col.values)
            m = xnp(h)
            codes = (h % np.uint32(nb)).astype(np.int32 if m is np else "int32")
            out[name] = Column(codes, col.offsets)
        return out

    @property
    def output_dtype(self):
        return md.int32

    @property
    def output_tags(self):
        return [Tags.CATEGORICAL]

    def _compute_properties(self, col_schema, input_schema):
        nb = self._nb(col_schema.name)
        return col_schema.with_properties(
            {
                "domain": {"min": 0, "max": nb - 1, "name": col_schema.name},
                "embedding_sizes": {
                    "cardinality": nb,
                    "dimension": _emb_sz_rule(nb)[1],
                },
            }
        )

    def get_embedding_sizes(self, columns):
        return {name: _emb_sz_rule(self._nb(name)) for name in columns}

    def serialize_params(self):
        return {"num_buckets": self.num_buckets}


def _emb_sz_rule(n_cat: int, minimum_size=16, maximum_size=512):
    """Heuristic embedding width (reference categorify.py:687-688)."""
    return n_cat, min(max(minimum_size, round(1.6 * n_cat**0.56)), maximum_size)
