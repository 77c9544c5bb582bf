"""Groupby (reference nvtabular/ops/groupby.py:76-319): PARTITION-LOCAL
groupby-aggregation for sessionization. Like the reference, requires the
dataset to be pre-partitioned by the groupby keys (Dataset.shuffle_by_keys —
contract documented at reference groupby.py:26-40); rows for one key must not
span partitions.

Aggs: conventional (count/sum/mean/std/var/min/max, → int32/float32 coercion
per reference :255-260) and list-based ("list", "first", "last") which emit
ragged list columns / per-group scalars ordered by `sort_cols`."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .operator import Operator

_CONV_AGGS = ("count", "sum", "mean", "std", "var", "min", "max")
_LIST_AGGS = ("list", "first", "last")

AGG_DTYPES = {
    "count": np.int32,
    "mean": np.float32,
    "std": np.float32,
    "var": np.float32,
}


class Groupby(Operator):
    jit_safe = False

    def __init__(self, groupby_cols=None, sort_cols=None, aggs="list", name_sep="_", ascending=True):
        super().__init__()
        self.groupby_cols = [groupby_cols] if isinstance(groupby_cols, str) else list(groupby_cols or [])
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])
        self.ascending = ascending
        self.name_sep = name_sep

        if isinstance(aggs, str):
            aggs = {"__all__": [aggs]}
        elif isinstance(aggs, list):
            aggs = {"__all__": aggs}
        self.aggs: Dict[str, List[str]] = {
            col: ([a] if isinstance(a, str) else list(a)) for col, a in aggs.items()
        }
        for col, col_aggs in self.aggs.items():
            for a in col_aggs:
                if a not in _CONV_AGGS and a not in _LIST_AGGS:
                    raise ValueError(f"Unsupported agg {a!r}")

    @property
    def dependencies(self):
        extra = [c for c in self.groupby_cols + self.sort_cols]
        return [ColumnSelector(extra)] if extra else None

    def _col_aggs(self, name: str) -> List[str]:
        if name in self.aggs:
            return self.aggs[name]
        return self.aggs.get("__all__", [])

    def column_mapping(self, col_selector: ColumnSelector):
        mapping = {}
        for key in self.groupby_cols:
            mapping[key] = [key]
        for name in col_selector.names:
            if name in self.groupby_cols:
                continue
            for agg in self._col_aggs(name):
                mapping[f"{name}{self.name_sep}{agg}"] = [name]
        return mapping

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        sel = super().compute_selector(input_schema, selector, parents_selector, dependencies_selector)
        names = [n for n in sel.names if n not in self.groupby_cols]
        return ColumnSelector(names)

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        batch = batch.to_host()
        n = batch.num_rows
        # sort within the partition: group keys first, then sort_cols
        sort_arrays = []
        for c in reversed(self.sort_cols):
            sort_arrays.append(np.asarray(batch[c].values))
        key_arrays = [np.asarray(batch[k].values) for k in self.groupby_cols]
        for k in reversed(key_arrays):
            sort_arrays.append(k)
        if sort_arrays:
            order = np.lexsort(sort_arrays)
            if not self.ascending and self.sort_cols:
                # reverse sort_col order within groups: lexsort ascending on
                # negated sort keys isn't generic; re-sort descending instead
                order = _lexsort_desc_sortcols(batch, self.groupby_cols, self.sort_cols)
        else:
            order = np.arange(n)
        sorted_batch = batch.take(order)

        keys = [np.asarray(sorted_batch[k].values) for k in self.groupby_cols]
        # group boundaries on sorted keys
        if n == 0:
            starts = np.array([], dtype=np.int64)
        else:
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for k in keys:
                change[1:] |= k[1:] != k[:-1]
            starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        out = TableBatch()
        for key_col, k in zip(self.groupby_cols, keys):
            out[key_col] = Column(k[starts])
        for name in col_selector.names:
            if name in self.groupby_cols:
                continue
            vals = np.asarray(sorted_batch[name].values)
            for agg in self._col_aggs(name):
                out_name = f"{name}{self.name_sep}{agg}"
                if agg == "list":
                    offsets = np.concatenate([starts, [n]]).astype(np.int64)
                    out[out_name] = Column(vals.copy(), offsets)
                elif agg == "first":
                    out[out_name] = Column(vals[starts])
                elif agg == "last":
                    out[out_name] = Column(vals[ends - 1])
                else:
                    out[out_name] = Column(_segment_agg(vals, starts, ends, agg))
        return out

    def _compute_dtype(self, col_schema, input_schema):
        for agg, dtype in AGG_DTYPES.items():
            if col_schema.name.endswith(f"{self.name_sep}{agg}"):
                return col_schema.with_dtype(md.normalize(dtype))
        return col_schema

    def _compute_shape(self, col_schema, input_schema):
        if col_schema.name.endswith(f"{self.name_sep}list"):
            return col_schema.with_shape(md.Shape.list())
        return col_schema.with_shape(md.Shape.scalar())

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        return super().compute_output_schema(input_schema, col_selector, prev_output_schema)

    def serialize_params(self):
        return {
            "groupby_cols": self.groupby_cols,
            "sort_cols": self.sort_cols,
            "aggs": self.aggs,
            "name_sep": self.name_sep,
            "ascending": self.ascending,
        }


def _segment_agg(vals: np.ndarray, starts, ends, agg: str) -> np.ndarray:
    fvals = vals.astype(np.float64)
    nan = np.isnan(fvals) if fvals.dtype.kind == "f" else np.zeros(len(fvals), bool)
    safe = np.where(nan, 0.0, fvals)
    csum = np.concatenate([[0.0], np.cumsum(safe)])
    ccnt = np.concatenate([[0], np.cumsum(~nan)])
    s = csum[ends] - csum[starts]
    c = ccnt[ends] - ccnt[starts]
    if agg == "count":
        return c.astype(np.int32)
    if agg == "sum":
        return s
    if agg == "mean":
        with np.errstate(invalid="ignore", divide="ignore"):
            return (s / np.maximum(c, 1)).astype(np.float32)
    if agg in ("std", "var"):
        csq = np.concatenate([[0.0], np.cumsum(safe * safe)])
        sq = csq[ends] - csq[starts]
        with np.errstate(invalid="ignore", divide="ignore"):
            v = (sq - s * s / np.maximum(c, 1)) / np.maximum(c - 1, 1)
            v = np.where(c > 1, np.maximum(v, 0.0), np.nan)
        return (np.sqrt(v) if agg == "std" else v).astype(np.float32)
    if agg == "min":
        return np.minimum.reduceat(np.where(nan, np.inf, fvals), starts) if len(starts) else fvals[:0]
    if agg == "max":
        return np.maximum.reduceat(np.where(nan, -np.inf, fvals), starts) if len(starts) else fvals[:0]
    raise ValueError(agg)


def _lexsort_desc_sortcols(batch, groupby_cols, sort_cols):
    """Sort ascending by keys, descending by sort_cols."""
    import pandas as pd

    df = {}
    for c in groupby_cols + sort_cols:
        df[c] = np.asarray(batch[c].values)
    frame = pd.DataFrame(df)
    order = frame.sort_values(
        groupby_cols + sort_cols,
        ascending=[True] * len(groupby_cols) + [False] * len(sort_cols),
        kind="stable",
    ).index.to_numpy()
    return order
