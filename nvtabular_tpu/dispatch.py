"""Backend-agnostic kernel library (numpy host path / jax.numpy device path).

Analog of the reference's ``merlin.core.dispatch`` (cudf/pandas-agnostic
kernels — import sites at reference nvtabular/ops/categorify.py:43-48,
hash_bucket.py:20-26). Here the duality is numpy vs jax.numpy instead of
pandas vs cudf, and — unlike the reference, which warns that CPU and GPU
hashes differ (categorify.py:332-338) — our hash uses only uint32 arithmetic
so host and TPU produce IDENTICAL hashes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .table import Column, TableBatch, as_column, concat_columns, concat_rows, xnp

HAS_GPU = False  # legacy compat flag; device here means TPU


# ---------------------------------------------------------------------------
# Hashing: murmur3-style finalizers on uint32 lanes. Works identically under
# numpy (wrapping uint32) and jax.numpy (uint32 without x64). TPU VPU handles
# the shifts/multiplies natively; XLA fuses the whole chain into one kernel.
# ---------------------------------------------------------------------------

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _fmix32(h, m):
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def hash_lanes(lo, hi, seed: int = 0):
    """Hash two uint32 lanes to a uint32. Pure uint32 ops (host==device)."""
    m = xnp(lo, hi)
    lo = lo.astype(np.uint32) if m is np else lo.astype("uint32")
    hi = hi.astype(np.uint32) if m is np else hi.astype("uint32")
    h = _fmix32(lo * _C1 + np.uint32(seed), m)
    h = _fmix32(h ^ (hi * _C2), m)
    return h


def hash_array(values, seed: int = 0):
    """Deterministic per-element hash of a numeric array → uint32."""
    m = xnp(values)
    kind = np.dtype(values.dtype).kind if m is np else values.dtype.kind
    if kind == "O":  # strings: host-only vectorized murmur-like byte hash
        return _hash_strings(np.asarray(values, dtype=object), seed)
    if kind == "f":
        # canonicalize: hash bit pattern of float64 on host / float32 on device
        if m is np:
            bits = np.asarray(values, dtype=np.float64).view(np.uint64)
            lo = (bits & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (bits >> np.uint64(32)).astype(np.uint32)
        else:
            import jax.numpy as jnp
            import jax.lax as lax

            bits = lax.bitcast_convert_type(values.astype(jnp.float32), jnp.uint32)
            lo, hi = bits, jnp.zeros_like(bits)
        return hash_lanes(lo, hi, seed)
    if kind == "b":
        values = values.astype(np.int32 if m is np else "int32")
        kind = "i"
    # integers
    if m is np:
        v = np.asarray(values).astype(np.int64, copy=False).view(np.uint64)
        lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (v >> np.uint64(32)).astype(np.uint32)
    else:
        import jax.numpy as jnp

        v32 = values.astype(jnp.int32)
        lo = v32.astype(jnp.uint32)
        # sign-extended high lane so host int64 view matches for in-range ints
        hi = (v32 >> 31).astype(jnp.uint32)
    return hash_lanes(lo, hi, seed)


def _hash_strings(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a-style hash over utf-8 bytes, folded through fmix32.

    O(n * maxlen) with numpy column-at-a-time updates; includes the string
    length so prefixes don't collide with padding.
    """
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    encoded = [
        (s if isinstance(s, bytes) else str(s).encode("utf-8")) if s is not None else b""
        for s in values
    ]
    lengths = np.array([len(b) for b in encoded], dtype=np.int64)
    maxlen = int(lengths.max()) if n else 0
    if maxlen == 0:
        return np.full(n, hash_lanes(np.uint32(0), np.uint32(seed), seed), dtype=np.uint32)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(encoded):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, np.uint32(0x811C9DC5) ^ np.uint32(seed), dtype=np.uint32)
    prime = np.uint32(0x01000193)
    for j in range(maxlen):
        active = j < lengths
        updated = (h ^ buf[:, j].astype(np.uint32)) * prime
        h = np.where(active, updated, h)
    h = _fmix32(h ^ lengths.astype(np.uint32), np)
    return h


def hash_series(col: Column, seed: int = 0) -> Column:
    """Hash a column elementwise (list columns hash their flat values)."""
    hashed = hash_array(col.values, seed)
    return Column(hashed, col.offsets, col.validity)


# ---------------------------------------------------------------------------
# List-column helpers (values/offsets layout; reference analogs:
# flatten_list_column / encode_list_column / pull_apart_list in
# merlin.core.dispatch, used by categorify.py:1802-1828)
# ---------------------------------------------------------------------------


def is_list_dtype(col) -> bool:
    return isinstance(col, Column) and col.is_list


def flatten_list_column_values(col: Column):
    return col.values


def flatten_list_column(col: Column) -> Column:
    """List column → scalar column of its flat values."""
    return Column(col.values)


def encode_list_column(original: Column, encoded_values) -> Column:
    """Rebuild a list column from new flat values + the original offsets."""
    return Column(encoded_values, original.offsets, original.validity)


def pull_apart_list(col: Column):
    return col.values, col.offsets


def create_multihot_col(offsets, values) -> Column:
    return Column(values, offsets)


def list_lengths(col: Column):
    return col.offsets[1:] - col.offsets[:-1]


# ---------------------------------------------------------------------------
# Misc table helpers
# ---------------------------------------------------------------------------


def arange(size: int, like=None, dtype=np.int64):
    if like is not None and xnp(like) is not np:
        import jax.numpy as jnp

        return jnp.arange(size, dtype=jnp.int32)
    return np.arange(size, dtype=dtype)


def make_table(data: dict) -> TableBatch:
    return TableBatch.from_pydict(data)


def nullable_series(values, like_dtype=None) -> Column:
    return as_column(list(values))


def series_has_nulls(col: Column) -> bool:
    return col.has_nulls()


def annotate(name: str, color: Optional[str] = None, domain: str = "nvt_tpu"):
    """Profiling range decorator — analog of the reference's NVTX
    ``merlin.core.dispatch.annotate`` (applied to op fit/transform bodies,
    reference categorify.py:345,477 etc.). On TPU the range shows up in
    XProf/TensorBoard via ``jax.profiler.TraceAnnotation``; falls back to a
    no-op when jax is unavailable."""
    import functools

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            try:
                import jax.profiler as _prof

                with _prof.TraceAnnotation(f"{domain}:{name}"):
                    return func(*args, **kwargs)
            except ImportError:
                return func(*args, **kwargs)

        return wrapper

    return decorator


# --- compat surface (reference merlin.core.dispatch names) -------------------

DataFrameType = TableBatch
SeriesType = Column


def make_df(data: Optional[dict] = None) -> TableBatch:
    """Reference `make_df` — here always a TableBatch (no cudf/pandas split)."""
    return TableBatch.from_pydict(data or {})


def make_series(values) -> Column:
    return as_column(values)


def is_dataframe_object(obj) -> bool:
    return isinstance(obj, TableBatch)


def is_series_object(obj) -> bool:
    return isinstance(obj, Column)


def is_cpu_object(obj) -> bool:
    """True when host-resident (numpy-backed)."""
    if isinstance(obj, Column):
        return obj.backend == "numpy"
    if isinstance(obj, TableBatch):
        return all(c.backend == "numpy" for c in obj.columns.values())
    return isinstance(obj, np.ndarray)


def to_host(obj):
    """Device → host (reference `to_host`/`from_host` pair)."""
    return obj.to_host() if hasattr(obj, "to_host") else np.asarray(obj)


def from_host(obj):
    return obj.to_device() if hasattr(obj, "to_device") else obj


def random_state(seed: Optional[int] = None):
    """Seeded RNG (reference `random_state` returns a cupy/numpy state)."""
    return np.random.default_rng(seed)


def detect_format(data) -> str:
    """'table' | 'column' | 'array' | 'unknown' (reference detect_format/ExtData)."""
    if isinstance(data, TableBatch):
        return "table"
    if isinstance(data, Column):
        return "column"
    if isinstance(data, np.ndarray):
        return "array"
    mod = type(data).__module__
    if mod.startswith("pandas"):
        return "pandas"
    if mod.startswith("pyarrow"):
        return "arrow"
    return "unknown"


def convert_data(data, cpu: bool = True):
    """Normalize external data into a TableBatch (reference convert_data)."""
    if isinstance(data, TableBatch):
        return data.to_host() if cpu else data
    if detect_format(data) == "pandas":
        return TableBatch.from_pandas(data)
    if detect_format(data) == "arrow":
        return TableBatch.from_arrow(data)
    if isinstance(data, dict):
        return TableBatch.from_pydict(data)
    raise TypeError(f"cannot convert {type(data).__name__} to TableBatch")
