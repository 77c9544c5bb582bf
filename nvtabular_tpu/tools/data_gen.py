"""Synthetic tabular data generation.

Re-design of reference nvtabular/tools/data_gen.py (UniformDistro:41,
PowerLawDistro:51 with the α=0.1 Criteo-like skew, DatasetGen:72, column
specs Col/ContCol/CatCol/LabelCol:382-446, JSON-schema loader
_get_cols_from_schema:448). Differences: vectorized numpy generation in
memory-budgeted batches streamed straight to parquet (no dask/cudf), and
distribution verification by Kolmogorov-Smirnov test mirroring
``DatasetGen.verify_df`` (reference :321-331).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from ..io.dataset import Dataset
from ..table import Column, TableBatch

_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz"))


class UniformDistro:
    """Uniform distribution over [min_val, max_val) (reference :41-49)."""

    def sample(self, rng: np.random.Generator, num_rows: int, min_val=0.0, max_val=1.0):
        return rng.uniform(min_val, max_val, num_rows)

    def verify(self, series) -> float:
        from scipy import stats

        arr = np.asarray(series, dtype=np.float64)
        lo, hi = arr.min(), arr.max()
        span = (hi - lo) or 1.0
        return stats.kstest((arr - lo) / span, "uniform").statistic


class PowerLawDistro:
    """Power-law (Criteo-like skew), default α=0.1 (reference :51-70)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha

    def sample(self, rng: np.random.Generator, num_rows: int, min_val=1.0, max_val=2.0):
        # inverse-CDF sampling of p(x) ∝ x^(α-1) over [min_val, max_val):
        # CDF ∝ x^α, so x = (lo^α + u·(hi^α − lo^α))^(1/α)
        a = self.alpha
        min_val = max(float(min_val), 1e-6)
        u = rng.random(num_rows)
        lo, hi = min_val ** a, float(max_val) ** a
        return (lo + u * (hi - lo)) ** (1.0 / a)

    def verify(self, series) -> float:
        from scipy import stats

        arr = np.asarray(series, dtype=np.float64)
        arr = arr[arr > 0]
        a = self.alpha
        lo, hi = arr.min() ** a, arr.max() ** a
        span = (hi - lo) or 1.0
        return stats.kstest((arr ** a - lo) / span, "uniform").statistic


class Col:
    def __init__(self, name: str, dtype, distro=None):
        self.name = name
        self.dtype = dtype
        self.distro = distro


class ContCol(Col):
    def __init__(
        self,
        name: str,
        dtype=np.float32,
        min_val=0,
        max_val=1,
        mean=None,
        std=None,
        per_nan=None,
        distro=None,
    ):
        super().__init__(name, dtype, distro)
        self.min_val = min_val
        self.max_val = max_val
        self.mean = mean
        self.std = std
        self.per_nan = per_nan


class CatCol(Col):
    def __init__(
        self,
        name: str,
        dtype=np.int64,
        cardinality=1,
        min_entry_size=None,
        max_entry_size=None,
        multi_min=None,
        multi_max=None,
        multi_avg=None,
        per_nan=None,
        permutate_index=False,
        distro=None,
    ):
        super().__init__(name, dtype, distro)
        self.cardinality = cardinality
        self.min_entry_size = min_entry_size  # string entries
        self.max_entry_size = max_entry_size
        self.multi_min = multi_min  # multihot list lengths
        self.multi_max = multi_max
        self.multi_avg = multi_avg
        self.per_nan = per_nan
        self.permutate_index = permutate_index


class LabelCol(Col):
    def __init__(self, name: str, dtype=np.int64, cardinality=2, per_nan=None, distro=None):
        super().__init__(name, dtype, distro)
        self.cardinality = cardinality
        self.per_nan = per_nan


class DatasetGen:
    """Generates datasets column-spec-wise in memory-budgeted batches
    (reference DatasetGen:72, get_batch:335-343)."""

    def __init__(self, distribution=None, seed: Optional[int] = None, gpu_frac: float = 0.8):
        self.distribution = distribution or PowerLawDistro()
        self.rng = np.random.default_rng(seed)
        self.gpu_frac = gpu_frac
        self.vocab: Dict[str, np.ndarray] = {}  # string vocab per cat col

    # ------------------------------------------------------------------
    def create_conts(self, size: int, conts_rep: Sequence[ContCol]) -> TableBatch:
        out = TableBatch()
        for col in conts_rep:
            distro = col.distro or self.distribution
            vals = distro.sample(self.rng, size, col.min_val, col.max_val)
            if col.mean is not None and col.std is not None:
                vals = (vals - vals.mean()) / (vals.std() or 1.0) * col.std + col.mean
            vals = vals.astype(col.dtype)
            if col.per_nan:
                nan_idx = self.rng.random(size) < col.per_nan
                vals = vals.astype(np.float64)
                vals[nan_idx] = np.nan
                vals = vals.astype(np.float32 if np.dtype(col.dtype).kind == "f" else np.float64)
            out[col.name] = Column(vals)
        return out

    def create_cats(self, size: int, cats_rep: Sequence[CatCol], entries: bool = False) -> TableBatch:
        out = TableBatch()
        for col in cats_rep:
            distro = col.distro or self.distribution
            if col.multi_min is not None or col.multi_avg is not None:
                out[col.name] = self._multihot(size, col, distro)
                continue
            ids = self._sample_ids(size, col, distro)
            if entries or col.min_entry_size:
                vocab = self._string_vocab(col)
                values = vocab[ids]
                if col.per_nan:
                    nulls = self.rng.random(size) < col.per_nan
                    values = values.astype(object)
                    values[nulls] = None
                out[col.name] = Column(values)
            else:
                out[col.name] = Column(ids.astype(col.dtype))
        return out

    def create_labels(self, size: int, labs_rep: Sequence[LabelCol]) -> TableBatch:
        out = TableBatch()
        for col in labs_rep:
            vals = self.rng.integers(0, col.cardinality, size).astype(col.dtype)
            out[col.name] = Column(vals)
        return out

    def _sample_ids(self, size: int, col: CatCol, distro) -> np.ndarray:
        card = max(int(col.cardinality), 1)
        raw = distro.sample(self.rng, size, 1.0, float(card + 1))
        ids = np.clip(raw.astype(np.int64) - 1, 0, card - 1)
        if col.permutate_index:
            # break the id↔frequency-rank correlation (reference :366-380)
            perm = np.random.default_rng(17).permutation(card)
            ids = perm[ids]
        return ids

    def _multihot(self, size: int, col: CatCol, distro) -> Column:
        lo = col.multi_min if col.multi_min is not None else 1
        hi = col.multi_max if col.multi_max is not None else max(lo + 1, int(col.multi_avg or 2) * 2)
        lengths = self.rng.integers(lo, max(hi, lo + 1), size)
        total = int(lengths.sum())
        flat_col = CatCol(col.name, col.dtype, col.cardinality, distro=col.distro)
        flat = self._sample_ids(total, flat_col, distro).astype(col.dtype)
        offsets = np.zeros(size + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        return Column(flat, offsets)

    def _string_vocab(self, col: CatCol) -> np.ndarray:
        if col.name not in self.vocab:
            card = int(col.cardinality)
            lo = int(col.min_entry_size or 1)
            hi = int(col.max_entry_size or 5)
            lengths = self.rng.integers(lo, hi + 1, card)
            letters = self.rng.integers(0, 26, int(lengths.sum()))
            words = []
            pos = 0
            for L in lengths:
                words.append("".join(_ALPHABET[letters[pos : pos + L]]))
                pos += L
            # suffix a unique id so entries are distinct
            self.vocab[col.name] = np.array(
                [f"{w}{i}" for i, w in enumerate(words)], dtype=object
            )
        return self.vocab[col.name]

    # ------------------------------------------------------------------
    def create_df(
        self,
        size: int,
        cols: Dict[str, list],
        entries: bool = False,
    ) -> TableBatch:
        """cols = {"conts": [...], "cats": [...], "labels": [...]}."""
        parts = []
        if cols.get("conts"):
            parts.append(self.create_conts(size, cols["conts"]))
        if cols.get("cats"):
            parts.append(self.create_cats(size, cols["cats"], entries=entries))
        if cols.get("labels"):
            parts.append(self.create_labels(size, cols["labels"]))
        out = TableBatch()
        for p in parts:
            for name, c in p.columns.items():
                out[name] = c
        return out

    def full_df_create(
        self,
        size: int,
        cols: Dict[str, list],
        entries: bool = False,
        output: str = ".",
        files_per_output: int = 1,
        rows_per_batch: int = 1 << 20,
    ) -> List[str]:
        """Stream `size` rows into parquet files under `output` in
        memory-budgeted batches (reference full_df_create:226-266)."""
        import pyarrow.parquet as pq

        os.makedirs(output, exist_ok=True)
        files_per_output = max(1, int(files_per_output))
        rows_per_file = -(-size // files_per_output)
        paths = []
        written_total = 0
        for fidx in range(files_per_output):
            n_file = min(rows_per_file, size - written_total)
            if n_file <= 0:
                break
            path = os.path.join(output, f"gen_{fidx}.parquet")
            writer = None
            written = 0
            while written < n_file:
                n = min(rows_per_batch, n_file - written)
                batch = self.create_df(n, cols, entries=entries)
                tbl = batch.to_arrow()
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
                written += n
            if writer is not None:
                writer.close()
            paths.append(path)
            written_total += n_file
        return paths

    def create_vocab(self, cats_rep: Sequence[CatCol], output: str) -> List[str]:
        """Persist the per-column string vocabularies (reference :268-297)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(output, exist_ok=True)
        paths = []
        for col in cats_rep:
            vocab = self._string_vocab(col)
            path = os.path.join(output, f"vocab_{col.name}.parquet")
            pq.write_table(pa.table({col.name: vocab.tolist()}), path)
            paths.append(path)
        return paths

    def verify_df(self, df_to_verify) -> List[float]:
        """K-S distance of each continuous column against the target
        distribution (reference verify_df:321-331)."""
        out = []
        cols = (
            df_to_verify.columns
            if isinstance(df_to_verify, TableBatch)
            else {c: df_to_verify[c] for c in df_to_verify.columns}
        )
        for name, col in cols.items():
            vals = np.asarray(col.values if isinstance(col, Column) else col)
            if vals.dtype.kind != "f":
                continue
            vals = vals[~np.isnan(vals)]
            out.append(self.distribution.verify(vals))
        return out


def cols_from_schema(schema: Union[str, Dict], distros: Optional[Dict] = None) -> Dict[str, list]:
    """JSON schema → column specs (reference _get_cols_from_schema:448-497).

    Schema format: {"conts": {name: {dtype, min_val, max_val, per_nan, ...}},
    "cats": {name: {dtype, cardinality, min_entry_size, max_entry_size,
    multi_min, multi_max, multi_avg, per_nan}}, "labels": {name: {dtype,
    cardinality}}, "num_rows": N}.
    """
    if isinstance(schema, str):
        with open(schema) as f:
            schema = json.load(f)
    distros = distros or {}

    def _distro(name):
        d = distros.get(name)
        if d is None:
            return None
        if isinstance(d, dict):
            if d.get("name") == "powerlaw":
                return PowerLawDistro(alpha=d.get("params", {}).get("alpha", 0.1))
            return UniformDistro()
        return d

    def _dt(spec):
        dt = spec.get("dtype")
        if dt is None:
            return None
        if isinstance(dt, str):
            return np.dtype(dt).type
        return dt

    out: Dict[str, list] = {"conts": [], "cats": [], "labels": []}
    for name, spec in (schema.get("conts") or {}).items():
        kwargs = {k: v for k, v in spec.items() if k != "dtype"}
        out["conts"].append(ContCol(name, _dt(spec) or np.float32, distro=_distro(name), **kwargs))
    for name, spec in (schema.get("cats") or {}).items():
        kwargs = {k: v for k, v in spec.items() if k != "dtype"}
        out["cats"].append(CatCol(name, _dt(spec) or np.int64, distro=_distro(name), **kwargs))
    for name, spec in (schema.get("labels") or {}).items():
        kwargs = {k: v for k, v in spec.items() if k != "dtype"}
        out["labels"].append(LabelCol(name, _dt(spec) or np.int64, distro=_distro(name), **kwargs))
    out["num_rows"] = schema.get("num_rows")
    return out
