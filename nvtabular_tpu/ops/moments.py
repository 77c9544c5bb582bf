"""Streaming moments accumulators — the statistics engine under
Normalize/DataStats/TargetEncoding's global mean.

Replaces the reference's dask tree-reduction (`nvtabular/ops/moments.py:28-116`:
per-partition {count, sum, sum²} → split_every=32 tree → mean/var/std with
ddof=1). Here the same algebra runs as a *streaming* accumulator: each batch
contributes {count, sum, sum²} (computed on device when the batch lives in
HBM — XLA reduces in one fused kernel), accumulated in float64 on host.
Across hosts, states merge by simple addition (`merge`), which the parallel
module maps onto `jax.lax.psum` over the mesh (SURVEY.md §2.8 P2).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from ..table import Column, TableBatch, xnp


class ColumnMoments:
    __slots__ = ("count", "sum", "sumsq", "min", "max", "null_count", "total_rows")

    def __init__(self):
        self.count = 0.0  # non-null element count
        self.sum = 0.0
        self.sumsq = 0.0
        self.min = math.inf
        self.max = -math.inf
        self.null_count = 0.0
        self.total_rows = 0.0

    def update_batch(self, col: Column):
        vals = col.values
        # fast path: flat numpy numeric column through ONE fused C++ pass
        # (GIL-releasing; NaN-as-null matches is_null()); ~10x the numpy
        # multi-pass formulation below, which remains for jax-backed /
        # list / bool / object columns
        if not col.is_list and isinstance(vals, np.ndarray) and vals.dtype.kind in "fi":
            from ..serving.native import moments_pass

            validity = (
                None if col.validity is None else np.asarray(col.validity)
            )
            stats = moments_pass(vals, validity)
            if stats is not None:
                cnt, s, ss, mn, mx, nulls_n = (float(x) for x in stats)
                if cnt > 0:
                    self.min = min(self.min, mn)
                    self.max = max(self.max, mx)
                self.count += cnt
                self.sum += s
                self.sumsq += ss
                self.null_count += nulls_n
                self.total_rows += len(col)
                return
        m = xnp(vals)
        nulls = col.is_null()
        n_rows = len(col)
        if col.is_list:
            data = vals
            valid = m.ones(data.shape, dtype=bool)
        else:
            data = vals
            valid = ~nulls
        if data.dtype.kind == "b" if m is np else str(data.dtype) == "bool":
            data = data.astype("float64" if m is np else "float32")
        fdata = data.astype("float64" if m is np else "float32")
        if not col.is_list and data.dtype.kind == "f" if m is np else False:
            pass
        zero = m.asarray(0, dtype=fdata.dtype)
        safe = m.where(valid, fdata, zero)
        # NaNs inside float data also excluded
        isnan = m.isnan(safe) if fdata.dtype.kind == "f" or m is not np else m.zeros(safe.shape, bool)
        valid = valid & ~isnan
        safe = m.where(valid, safe, zero)

        cnt = float(m.sum(valid))
        s = float(m.sum(safe))
        ss = float(m.sum(safe * safe))
        if cnt > 0:
            big = m.where(valid, fdata, m.asarray(-math.inf, dtype=fdata.dtype))
            small = m.where(valid, fdata, m.asarray(math.inf, dtype=fdata.dtype))
            self.max = max(self.max, float(m.max(big)))
            self.min = min(self.min, float(m.min(small)))
        self.count += cnt
        self.sum += s
        self.sumsq += ss
        self.null_count += float(np.sum(np.asarray(nulls)))
        self.total_rows += n_rows

    def merge(self, other: "ColumnMoments") -> "ColumnMoments":
        out = ColumnMoments()
        out.count = self.count + other.count
        out.sum = self.sum + other.sum
        out.sumsq = self.sumsq + other.sumsq
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out.null_count = self.null_count + other.null_count
        out.total_rows = self.total_rows + other.total_rows
        return out

    # --- derived statistics (ddof=1 like the reference, moments.py:96-111) --
    @property
    def mean(self) -> float:
        return self.sum / self.count if self.count else 0.0

    @property
    def var(self) -> float:
        if self.count <= 1:
            return 0.0
        v = (self.sumsq - self.sum * self.sum / self.count) / (self.count - 1)
        return max(v, 0.0)

    @property
    def std(self) -> float:
        return math.sqrt(self.var)


class MomentsState:
    """Per-column moments for a set of columns."""

    def __init__(self, columns: List[str]):
        self.columns = {name: ColumnMoments() for name in columns}

    def update_batch(self, batch: TableBatch, names: Optional[List[str]] = None):
        present = [n for n in (names or self.columns) if n in batch]
        # column-parallel scan: each moments_pass is a GIL-releasing native
        # call, so a multi-column batch fans across the shared encode pool
        # (the serial loop left 3 of 4 cores idle during the cont half of
        # the fit scan — measured 22.5M rows/s for 13 columns, the ONE-
        # thread native rate). Each job owns a distinct column's state.
        if len(present) >= 4 and all(
            not batch[n].is_list
            and isinstance(batch[n].values, np.ndarray)
            and batch[n].values.dtype.kind in "fi"
            for n in present
        ):
            from .categorify import _shared_pool

            list(
                _shared_pool().map(
                    lambda n: self.columns[n].update_batch(batch[n]), present
                )
            )
            return self
        for name in present:
            self.columns[name].update_batch(batch[name])
        return self

    def merge(self, other: "MomentsState") -> "MomentsState":
        out = MomentsState(list(self.columns))
        for name in self.columns:
            out.columns[name] = self.columns[name].merge(other.columns[name])
        return out


class ReservoirSample:
    """Bounded uniform sample for approximate quantiles (median).

    Exact below `capacity` rows; the reference used dask's approximate
    quantile (fill.py:117-121), so approximation parity is acceptable.
    """

    def __init__(self, capacity: int = 131072, seed: int = 0):
        self.capacity = capacity
        self.rng = np.random.default_rng(seed)
        self.buf = np.empty(0, dtype=np.float64)
        self.seen = 0

    def update(self, values: np.ndarray):
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        room = self.capacity - len(self.buf)
        if room > 0:
            take = min(room, len(values))
            self.buf = np.concatenate([self.buf, values[:take]])
            self.seen += take
            values = values[take:]
        if len(values) == 0:
            return
        # vectorized reservoir step: element i (stream position seen+i+1)
        # draws slot j ~ U[0, seen+i+1); accepted writes apply in stream
        # order (numpy fancy assignment is sequential), exactly matching
        # the classic per-element loop without its O(n) Python cost
        positions = self.seen + np.arange(1, len(values) + 1, dtype=np.float64)
        j = (self.rng.random(len(values)) * positions).astype(np.int64)
        accept = j < self.capacity
        self.buf[j[accept]] = values[accept]
        self.seen += len(values)

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        """Weight-correct distributed merge: each side contributes slots in
        proportion to how many stream rows its buffer represents — a plain
        uniform resample of the concatenation would over-represent the side
        that saw fewer rows (the multi-host fit merges per-host reservoirs
        through this)."""
        out = ReservoirSample(self.capacity)
        out.seen = self.seen + other.seen
        if len(self.buf) + len(other.buf) <= self.capacity:
            out.buf = np.concatenate([self.buf, other.buf])
            return out
        if out.seen <= 0:
            return out
        k = self.capacity
        na = int(round(k * (self.seen / out.seen)))
        na = min(max(na, k - len(other.buf)), len(self.buf), k)
        nb = k - na
        parts = []
        if na > 0:
            parts.append(self.buf[out.rng.choice(len(self.buf), na, replace=False)])
        if nb > 0:
            parts.append(other.buf[out.rng.choice(len(other.buf), nb, replace=False)])
        out.buf = np.concatenate(parts) if parts else np.empty(0, dtype=np.float64)
        return out

    def quantile(self, q: float) -> float:
        if len(self.buf) == 0:
            return 0.0
        return float(np.quantile(self.buf, q))
