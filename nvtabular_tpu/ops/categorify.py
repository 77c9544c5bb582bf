"""Categorify — dictionary-encode categorical columns.

TPU-native re-design of the reference's flagship operator
(nvtabular/ops/categorify.py, 1916 LoC). Same semantics:

* Encoding layout (reference categorify.py:66-71 and the C++ kernel's
  NULL_INDEX=1/OOV_INDEX=2/UNIQUE_OFFSET=3): code 0 = padding, 1 = null,
  [2, 2+num_buckets) = out-of-vocabulary hash buckets (default 1 bucket),
  then vocabulary ids in descending-frequency order from 2+num_buckets.
* Options: per-column-dict-or-scalar `freq_threshold`, `max_size`,
  `num_buckets`; pre-supplied `vocabs`; `encode_type="joint"|"combo"`
  (shared vocab across a column subgroup vs. one crossed column);
  `single_table` (one contiguous global index space across all columns,
  reference categorify.py:404-415); parquet vocab artifacts; embedding-size
  rule `(n, clamp(round(1.6 n^0.56), 16, 512))` (reference :687-688).

TPU-first implementation differences (the whole point):

* Fit is a STREAMING single scan: each batch's value counts come from
  pyarrow's C++ hash aggregation (`value_counts`), partials are re-aggregated
  with arrow `Table.group_by("value").sum()` whenever they grow past a
  budget, and the final vocabulary is sorted by (-count, value) —
  deterministic, unlike the reference's dask-task ordering. Across hosts the
  partial (value, count) tables merge by concat+re-aggregate — the host-side
  analog of the reference's tree reduction (categorify.py:1344-1540), with
  jax all-to-all sharding available in parallel/sharded_vocab.py for
  pod-scale vocabularies (SURVEY.md §2.8 P3).
* Transform lookup is backend-split (same results everywhere; codes
  default to int32, TPU-friendly where the reference emits int64):
  - device: column-batched exact lookups — ONE gather over a concatenated
    dense direct-map for compact key ranges, TWO row-gathers over a packed
    bucketed-cuckoo table otherwise (ops/lookup.py; jnp.searchsorted is a
    20x-slower serial gather loop on TPU and is only a last resort);
  - host numeric: thread-parallel C++ hash-map encodes shared with the
    serving path (cpp/nvt_serving.cc — read-only tables, GIL released);
  - host strings: arrow `index_in` (C++ hash probe).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

LOG = logging.getLogger("nvtabular_tpu")

from .. import dtypes as md
from ..dispatch import annotate, hash_array
from ..selector import ColumnSelector
from ..table import Column, TableBatch, xnp
from ..tags import Tags
from .operator import Operator
from .stat_operator import StatOperator

PAD_INDEX = 0
NULL_INDEX = 1
OOV_OFFSET = 2

# monotonically unique names for per-vocab native tables (never reuse an id)
import itertools as _itertools

_VOCAB_TABLE_SEQ = _itertools.count()

# one shared pool for the fit/transform hot loops (per-batch executor
# creation would churn threads thousands of times over a streaming run)
_POOL = None


def _shared_pool():
    global _POOL
    if _POOL is None:
        import concurrent.futures as cf

        # one thread per core: the encode/cont-pipe kernels are compute/
        # memory-bound C calls, and oversubscription measurably hurts
        # (4 cores: 8 threads 7.3 M rows/s, 4 threads 8.25 M rows/s)
        workers = int(os.environ.get("NVT_ENCODE_THREADS", os.cpu_count() or 8))
        _POOL = cf.ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="nvt-encode"
        )
    return _POOL


def _pa_array(values: np.ndarray):
    """numpy → arrow array; object arrays sanitize NaN/None to null."""
    import pyarrow as pa

    if values.dtype.kind != "O":
        return pa.array(values)
    cleaned = [
        None if v is None or (isinstance(v, float) and np.isnan(v)) else v
        for v in values
    ]
    return pa.array(cleaned)

_ACCUM_REAGG_ROWS = 4_000_000  # re-aggregate partial counts past this size


def _per_column(option, key, default):
    """dict-or-scalar option pattern (reference categorify.py:206-343)."""
    if option is None:
        return default
    if isinstance(option, dict):
        return option.get(key, default)
    return option


def _emb_sz_rule(n_cat: int, minimum_size=16, maximum_size=512) -> Tuple[int, int]:
    return n_cat, min(max(minimum_size, round(1.6 * n_cat**0.56)), maximum_size)


class _VocabAccum:
    """Streaming (value, count) accumulator.

    Integer keys count through the native C++ open-addressing counter
    (serving/native.py NativeCounter — the fit hot loop, thread-safe per
    accumulator); other dtypes fall back to arrow value_counts + group_by.
    """

    def __init__(self, capacity_hint: int = 0):
        self.partials: List = []  # list of pa.Table(value, count)
        self.rows = 0
        self.null_count = 0
        self._counter = None  # NativeCounter for int keys
        self._use_native: Optional[bool] = None
        self._int_dtype: Optional[np.dtype] = None
        # Counter table sizing is NOT hint- or extrapolation-driven: both a
        # blanket reservation from max_size AND the adaptive mid-scan
        # reserve ladder this replaces measured strictly SLOWER than letting
        # the counter grow naturally (flat int32 table -> PCounter32 at the
        # partition threshold). Reservation synchronously rehashes and
        # first-touches fresh pages through this platform's throttled page
        # provisioning (~100-170MB/s cold): a 29.3s multi-epoch scan spent
        # 25s inside reserve() calls, and even discovery-heavy single-pass
        # fits ran ~2x faster without them. PCounter32's bucketed appends
        # absorb growth incrementally, so the ladder solves a problem the
        # partitioned design no longer has. capacity_hint only seeds the
        # INITIAL table (capped small — see update()).
        self._capacity_hint = min(
            int(capacity_hint or 0),
            int(os.environ.get("NVT_COUNTER_RESERVE_CAP", 1 << 26)),
        )

    @property
    def native(self) -> bool:
        """True once this accumulator is committed to the native counter."""
        return bool(self._use_native)

    def update(self, values: np.ndarray, validity: Optional[np.ndarray]):
        if validity is not None:
            self.null_count += int((~validity).sum())
            values = values[validity]
        if values.dtype.kind == "f":
            nan = np.isnan(values)
            if nan.any():
                self.null_count += int(nan.sum())
                values = values[~nan]
        if len(values) == 0:
            return
        if self._use_native is None:
            self._use_native = values.dtype.kind in ("i", "u") and _native_counter()
        if self._use_native and values.dtype.kind in ("i", "u"):
            if self._counter is None:
                from ..serving.native import NativeCounter

                # initial table capped at 1M slots (8MB): big vocabularies
                # grow through the counter's own ladder (flat int32 ->
                # PCounter32) instead of being reserved blind (see __init__
                # — reservation measured strictly slower on this platform)
                self._counter = NativeCounter(
                    initial_capacity=max(
                        min(self._capacity_hint * 10 // 7, 1 << 20), 1 << 14
                    )
                )
                self._int_dtype = values.dtype
            else:
                # joint groups mix member columns of different int widths
                # through ONE accumulator: promote so finalize can't wrap
                self._int_dtype = np.promote_types(self._int_dtype, values.dtype)
            self._counter.update(values)
            self.rows += len(values)
            return
        self._update_arrow(values)

    def _update_arrow(self, values: np.ndarray):
        import pyarrow as pa

        arr = _pa_array(values)
        vc = arr.value_counts()  # StructArray<values, counts>
        tbl = pa.table(
            {"value": vc.field("values"), "count": vc.field("counts").cast(pa.int64())}
        )
        self.partials.append(tbl)
        self.rows += tbl.num_rows
        if self.rows > _ACCUM_REAGG_ROWS:
            self._reaggregate()

    def _reaggregate(self):
        import pyarrow as pa
        import pyarrow.types as pat

        if not self.partials:
            return
        # unify value dtypes across partials (int widths can differ when
        # native-counter int64 keys merge into an int32 arrow side)
        vtypes = {t.schema.field("value").type for t in self.partials}
        if len(vtypes) > 1:
            if all(pat.is_integer(t) for t in vtypes):
                self.partials = [
                    t.set_column(0, "value", t.column("value").cast(pa.int64()))
                    for t in self.partials
                ]
            else:  # heterogenous non-int (shouldn't happen): string-normalize
                self.partials = [
                    t.set_column(0, "value", t.column("value").cast(pa.string()))
                    for t in self.partials
                ]
        merged = pa.concat_tables(self.partials)
        agg = merged.group_by("value").aggregate([("count", "sum")])
        agg = agg.rename_columns(["value", "count"])
        self.partials = [agg]
        self.rows = agg.num_rows

    def merge(self, other: "_VocabAccum") -> "_VocabAccum":
        if other._counter is not None:
            keys, counts = other._counter.extract()
            if self._counter is None and not self.partials:
                from ..serving.native import NativeCounter

                self._counter = NativeCounter()
                self._int_dtype = other._int_dtype
                self._use_native = True
            elif self._int_dtype is not None and other._int_dtype is not None:
                self._int_dtype = np.promote_types(self._int_dtype, other._int_dtype)
            if self._counter is not None:
                self._counter.add(keys, counts)
            else:  # mixed: fold native counts into the arrow side
                import pyarrow as pa

                self.partials.append(pa.table({"value": keys, "count": counts}))
        self.partials.extend(other.partials)
        self.rows += other.rows
        self.null_count += other.null_count
        return self

    def finalize(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """→ (values sorted by (-count, value), counts, null_count)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if self._counter is not None:
            if not self.partials:
                # pure-native path: one GIL-released C++ pass collects and
                # sorts by (-count, key) — replaces extract + np.lexsort
                # (measured ~4x faster, pool-parallel across columns)
                values, counts = self._counter.extract_sorted()
                # release the counter NOW (not at state-dict GC): its table
                # spans return to the C++ span pool while sibling columns
                # are still finalizing, so a following fit (or the pooled
                # finalize itself) recycles backed pages instead of
                # first-touching fresh ones through the VM's throttled
                # page provisioning
                self._counter = None
                if self._int_dtype is not None and self._int_dtype != np.dtype(np.int64):
                    info = np.iinfo(self._int_dtype)
                    if len(values) == 0 or (
                        values.min() >= info.min and values.max() <= info.max
                    ):
                        values = values.astype(self._int_dtype)
                    # else: keys exceed the narrow dtype — stay int64
                return values, counts, self.null_count
            keys, counts = self._counter.extract()
            import pyarrow.types as pat

            if all(
                pat.is_integer(t.schema.field("value").type)
                for t in self.partials
            ):
                # int-typed partials unify losslessly with the native
                # counter's int64 keys (mixed native/arrow arises in
                # multi-host merges when one host lacks the native library)
                self.partials = [
                    t.set_column(0, "value", t.column("value").cast(pa.int64()))
                    for t in self.partials
                ]
                self.partials.append(pa.table({"value": keys, "count": counts}))
            else:
                # non-integer partials (float/string keys): casting THEM
                # to int64 would truncate — instead fold the counter's
                # int keys into arrow under the partials' value type
                vtype = self.partials[0].schema.field("value").type
                self.partials.append(
                    pa.table(
                        {
                            "value": pa.array(keys).cast(vtype),
                            "count": pa.array(counts, type=pa.int64()),
                        }
                    )
                )
        if not self.partials:
            return np.array([], dtype=object), np.array([], dtype=np.int64), self.null_count
        self._reaggregate()
        tbl = self.partials[0]
        order = pc.sort_indices(
            tbl,
            sort_keys=[("count", "descending"), ("value", "ascending")],
        )
        tbl = tbl.take(order)
        values = tbl.column("value").to_numpy(zero_copy_only=False)
        counts = tbl.column("count").to_numpy(zero_copy_only=False)
        return values, counts, self.null_count


def _native_counter() -> bool:
    try:
        from ..serving.native import native_available

        return native_available()
    except Exception:
        return False


class _Vocab:
    """A fitted per-group vocabulary with host and device lookup paths."""

    __slots__ = (
        "values_by_code",
        "counts",
        "_sv",
        "_sc",
        "num_buckets",
        "start_index",
        "offset",
        "dtype_kind",
        "_device_cache",
        "_pa_value_set",
        "_lookup",
        "_lookup_built",
        "_lut_dev",
        "state_key",
        "_native",
        "artifact_path",
        "tier",
        "_n_values",
        "int32_safe",
    )

    def __init__(self, values_by_code, counts, num_buckets):
        self.values_by_code = values_by_code  # frequency-descending order
        self.counts = counts
        self.num_buckets = max(1, int(num_buckets))
        self.start_index = OOV_OFFSET + self.num_buckets
        self.offset = 0  # single_table shift
        self.artifact_path = None  # parquet backing (set once artifacts exist)
        self.tier = "host"  # cat_cache tier: device | host | disk
        self._n_values = len(values_by_code)
        self.dtype_kind = (
            np.asarray(values_by_code).dtype.kind if len(values_by_code) else "O"
        )
        # value-ascending order is LAZY (the sorted_values property): the
        # host encode probes the C++ hash table and never needs it, so
        # host-only pipelines skip one full argsort per vocab at finalize
        self._sv = None
        self._sc = None
        if self.dtype_kind != "O":
            vals = np.asarray(values_by_code)
            self.int32_safe = len(vals) == 0 or (
                vals.dtype.kind not in ("i", "u")
                or (
                    int(vals.min()) >= np.iinfo(np.int32).min
                    and int(vals.max()) <= np.iinfo(np.int32).max
                )
            )
        else:
            self.int32_safe = True
        self._device_cache = None
        self._pa_value_set = None
        self._lookup = None
        self._lookup_built = False
        self._lut_dev = None
        self._native = "unset"
        self.state_key = None  # set when the op publishes device_state

    @property
    def size(self) -> int:
        """Total domain size including pad/null/OOV."""
        return self.start_index + self._n_values

    def _ensure_sorted(self):
        if self._sv is None and self.dtype_kind != "O" and self.values_by_code is not None:
            vals = np.asarray(self.values_by_code)
            order = np.argsort(vals, kind="stable")
            self._sv = vals[order]
            self._sc = (order + self.start_index).astype(np.int64)

    @property
    def sorted_values(self):
        self._ensure_sorted()
        return self._sv

    @property
    def sorted_codes(self):
        self._ensure_sorted()
        return self._sc

    # --- memory hierarchy (reference cat_cache/on_host, categorify.py:169-173)
    @property
    def resident(self) -> bool:
        return self.values_by_code is not None

    def host_nbytes(self) -> int:
        """Bytes of host memory held by this vocab's lookup structures."""
        total = 0
        for arr in (
            self.values_by_code,
            self.counts,
            self._sv,  # raw slots: don't TRIGGER the lazy sort to size it
            self._sc,
        ):
            if arr is not None and getattr(arr, "nbytes", None) is not None:
                total += arr.nbytes if arr.dtype.kind != "O" else arr.size * 24
        lut = self._lookup
        if lut is not None and getattr(lut, "host_table", None) is not None:
            total += lut.host_table.nbytes
        if self._native not in ("unset", None):
            total += self._n_values * 16  # C++ open-addressing entries
        return total

    def release_host(self) -> int:
        """Drop every host/device lookup structure (metadata — size, offset,
        dtype — survives, so schemas stay valid). Requires a parquet
        artifact to reload from. Returns bytes released."""
        if not self.resident or self.artifact_path is None:
            return 0
        freed = self.host_nbytes()
        self.values_by_code = None
        self.counts = None
        self._sv = None
        self._sc = None
        self._device_cache = None
        self._pa_value_set = None
        self._lookup = None
        self._lookup_built = False
        self._lut_dev = None
        self._native = "unset"
        return freed

    def ensure_resident(self) -> bool:
        """Reload values/counts from the parquet artifact if released.
        Returns True when a disk reload happened."""
        if self.resident:
            return False
        if self.artifact_path is None:
            raise RuntimeError("vocab released without a parquet artifact")
        import pyarrow.parquet as pq

        tbl = pq.read_table(self.artifact_path)
        values = tbl.column(0).to_numpy(zero_copy_only=False)
        counts = (
            tbl.column(1).to_numpy(zero_copy_only=False)
            if tbl.num_columns > 1
            else np.zeros(len(values), dtype=np.int64)
        )
        self.values_by_code = values
        self.counts = counts
        self._n_values = len(values)
        # value-ascending order stays lazy (sorted_values property)
        return True

    # --- host lookup -------------------------------------------------------
    def encode_host(self, values: np.ndarray, validity: Optional[np.ndarray]) -> np.ndarray:
        import pyarrow as pa
        import pyarrow.compute as pc

        if self.dtype_kind != "O" and values.dtype.kind != "O":
            codes = self._encode_numeric_np(values)
        else:
            if self._pa_value_set is None:
                self._pa_value_set = _pa_array(np.asarray(self.values_by_code, dtype=object) if getattr(self.values_by_code, "dtype", np.dtype("O")).kind == "O" else np.asarray(self.values_by_code))
            arr = _pa_array(values)
            idx = pc.index_in(arr, value_set=self._pa_value_set)
            idx_np = idx.to_numpy(zero_copy_only=False)
            found = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else idx.is_valid().to_numpy(zero_copy_only=False)
            codes = np.where(
                found,
                np.nan_to_num(idx_np, nan=0).astype(np.int64) + self.start_index,
                self._oov_codes_np(values),
            )
        nulls = np.zeros(len(values), dtype=bool)
        if validity is not None:
            nulls |= ~validity
        if values.dtype.kind == "f":
            nulls |= np.isnan(values)
        elif values.dtype.kind == "O":
            nulls |= np.array([v is None for v in values], dtype=bool)
        codes = np.where(nulls, NULL_INDEX, codes)
        return codes + self.offset

    def _encode_numeric_np(self, values: np.ndarray) -> np.ndarray:
        if self.sorted_values is None or len(self.sorted_values) == 0:
            return self._oov_codes_np(values)
        pos = np.searchsorted(self.sorted_values, values, side="left")
        pos_c = np.clip(pos, 0, len(self.sorted_values) - 1)
        hit = self.sorted_values[pos_c] == values
        codes = np.where(hit, self.sorted_codes[pos_c], self._oov_codes_np(values))
        return codes

    def _oov_codes_np(self, values: np.ndarray) -> np.ndarray:
        if self.num_buckets == 1:
            return np.full(len(values), OOV_OFFSET, dtype=np.int64)
        h = hash_array(values)
        return (h % np.uint32(self.num_buckets)).astype(np.int64) + OOV_OFFSET

    # --- device lookup -------------------------------------------------------
    def device_arrays(self):
        """(sorted_values, sorted_codes) as jax arrays, cached in HBM —
        the worker-cache analog (reference merlin.io.worker, P4)."""
        if self._device_cache is None:
            import jax
            import jax.numpy as jnp

            sv = self.sorted_values
            if sv.dtype == np.int64:
                # narrow when safe: int32 searchsorted is faster on TPU
                if len(sv) == 0 or (
                    sv.min() >= np.iinfo(np.int32).min and sv.max() <= np.iinfo(np.int32).max
                ):
                    sv = sv.astype(np.int32)
            pair = (jnp.asarray(sv), jnp.asarray(self.sorted_codes.astype(np.int32)))
            if isinstance(pair[0], jax.core.Tracer):
                # under a jit trace: return the traced constants but don't
                # cache them (they'd leak out of the trace)
                return pair
            self._device_cache = pair
        return self._device_cache

    def lookup_struct(self):
        """Host-built single/double-gather lookup structure (lookup.py);
        built once per vocab, None when keys don't admit one."""
        if not self._lookup_built:
            from .lookup import build_lookup

            if self.sorted_values is not None and self.sorted_values.dtype.kind in ("i", "u"):
                self._lookup = build_lookup(
                    self.sorted_values, self.sorted_codes.astype(np.int32)
                )
            self._lookup_built = True
        return self._lookup

    def encode_device(self, values, validity):
        """Device lookup: 1 gather (DirectLookup) or 2 row-gathers
        (CuckooLookup); searchsorted only as last resort (it lowers to a
        serial gather loop — see lookup.py module docstring)."""
        import jax
        import jax.numpy as jnp

        from ..dag.device_state import get_device_state

        lut = self.lookup_struct() if len(self.values_by_code) else None
        if lut is not None:
            table_host = lut.host_table
            # prefer the traced argument (device_state), avoiding a large
            # constant baked into the program
            table_dev = get_device_state(self.state_key) if self.state_key else None
            if table_dev is None:
                table_dev = self._cached_dev(jnp.asarray(table_host))
            codes = lut.encode_dev(table_dev, values, self._oov_codes_dev(values))
        elif len(self.values_by_code):
            sv, sc = self.device_arrays()
            vals = values.astype(sv.dtype)
            pos = jnp.searchsorted(sv, vals, side="left")
            pos_c = jnp.clip(pos, 0, sv.shape[0] - 1)
            hit = sv[pos_c] == vals
            codes = jnp.where(hit, sc[pos_c], self._oov_codes_dev(values))
        else:
            codes = self._oov_codes_dev(values)
        nulls = jnp.zeros(values.shape, dtype=bool)
        if validity is not None:
            nulls |= ~validity
        if values.dtype.kind == "f":
            nulls |= jnp.isnan(values)
        codes = jnp.where(nulls, NULL_INDEX, codes)
        return codes + self.offset

    def native_table(self):
        """C++ hash table for the HOST encode fast path (read-only → safe
        for thread-parallel encodes); None when unsupported (string keys,
        multi-bucket OOV, toolchain missing)."""
        values = np.asarray(self.values_by_code) if len(self.values_by_code) else None
        if (
            self.num_buckets != 1
            or values is None
            or values.dtype.kind not in ("i", "u")  # float keys would truncate
        ):
            return None
        if getattr(self, "_native", "unset") != "unset":
            return self._native
        try:
            from ..serving.native import _ColumnTable

            codes = (np.arange(len(values)) + self.start_index).astype(np.int32)
            # collision-proof per-process name (id(self) could be recycled
            # across refits while a stale table still lives in the cache)
            table = _ColumnTable.from_arrays(
                f"vocab:{os.getpid()}:{next(_VOCAB_TABLE_SEQ)}", values, codes
            )
        except Exception:
            table = None
        self._native = table
        return table

    def _cached_dev(self, arr):
        """Cache a device constant on the vocab unless we're under a trace.
        Only the 'device' tier pins HBM here — host/disk tiers re-upload so
        releasing the vocab actually frees accelerator memory."""
        import jax

        if isinstance(arr, jax.core.Tracer):
            return arr
        if self.tier != "device":
            return arr
        if self._lut_dev is None:
            self._lut_dev = arr
        return self._lut_dev

    def _oov_codes_dev(self, values):
        import jax.numpy as jnp

        if self.num_buckets == 1:
            return jnp.full(values.shape, OOV_OFFSET, dtype=jnp.int32)
        h = hash_array(values)
        return (h % np.uint32(self.num_buckets)).astype(jnp.int32) + OOV_OFFSET


class Categorify(StatOperator):
    def __init__(
        self,
        freq_threshold: Union[int, Dict[str, int]] = 0,
        out_path: Optional[str] = None,
        cat_cache: Union[str, Dict[str, str]] = "host",
        dtype=None,
        on_host: bool = True,
        encode_type: str = "joint",
        vocabs: Optional[Dict[str, Any]] = None,
        max_size: Union[int, Dict[str, int]] = 0,
        num_buckets: Union[None, int, Dict[str, int]] = None,
        single_table: bool = False,
        search_sorted: bool = False,
        split_out=None,
        split_every=None,
        cardinality_memory_limit=None,
        name_sep: str = "_",
        **kwargs,
    ):
        super().__init__()
        if encode_type not in ("joint", "combo"):
            raise ValueError(f"encode_type must be 'joint' or 'combo', got {encode_type!r}")
        self.freq_threshold = freq_threshold
        self.out_path = out_path or "./categories"
        self.cat_cache = cat_cache
        self.dtype = dtype
        self.on_host = on_host
        self.encode_type = encode_type
        self.max_size = max_size
        self.num_buckets = num_buckets
        self.single_table = single_table
        self.search_sorted = search_sorted
        if search_sorted:
            # The reference offers a sorted-vocab searchsorted encode as an
            # alternative to its hash-merge (reference
            # nvtabular/ops/categorify.py:1779-1795). Here the gather-table
            # lookup (direct/cuckoo row-gathers) is measured ~20x faster on
            # TPU than a binary-search lowering and produces identical codes,
            # so the flag is accepted for API parity but the gather path
            # always runs. Warn once so the choice is observable.
            import warnings

            warnings.warn(
                "Categorify(search_sorted=True): the TPU gather-table lookup "
                "is used instead (measured faster, identical codes); "
                "search_sorted has no effect in nvtabular_tpu",
                UserWarning,
                stacklevel=2,
            )
        self.name_sep = name_sep
        # accepted for API parity; partitioning is handled by the engine
        self.split_out = split_out
        self.split_every = split_every
        self.cardinality_memory_limit = cardinality_memory_limit

        self.vocabs: Dict[str, _Vocab] = {}
        self.categories: Dict[str, str] = {}  # group key -> vocab parquet path
        self._batched_cache = None  # (id(vocabs) token, {kind: (blut, rows)})
        # vocab memory hierarchy (reference cat_cache/on_host/
        # cardinality_memory_limit, categorify.py:169-173,1627-1643):
        # per-key LRU over host-resident lookup structures; disk-tier vocabs
        # and over-budget vocabs are released to their parquet artifacts
        self._lru: Dict[str, int] = {}
        self._lru_tick = 0
        self.cache_stats = {"hits": 0, "reloads": 0, "releases": 0}
        if vocabs is not None:
            self._load_supplied_vocabs(vocabs)

    # ------------------------------------------------------------------
    # group structure
    # ------------------------------------------------------------------
    def _groups(self, col_selector: ColumnSelector) -> List[Tuple[str, List[str]]]:
        """→ [(group_key, member_columns)]. joint subgroups share one vocab;
        combo subgroups form one crossed output column."""
        groups: List[Tuple[str, List[str]]] = []
        for entry in col_selector.grouped_names:
            if isinstance(entry, tuple):
                key = self.name_sep.join(entry)
                groups.append((key, list(entry)))
            else:
                groups.append((entry, [entry]))
        return groups

    def column_mapping(self, col_selector: ColumnSelector) -> Dict[str, List[str]]:
        mapping: Dict[str, List[str]] = {}
        for key, members in self._groups(col_selector):
            if len(members) > 1 and self.encode_type == "combo":
                mapping[key] = members
            else:
                for mcol in members:
                    mapping[mcol] = [mcol]
        return mapping

    def _vocab_key(self, group_key: str, members: List[str], member: str) -> str:
        """Which vocab a column group uses."""
        if len(members) > 1:
            return group_key  # joint or combo share the group vocab
        return member

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------
    def fit_init(self, col_selector: ColumnSelector, input_schema):
        state: Dict[str, _VocabAccum] = {}
        for key, members in self._groups(col_selector):
            if key not in self.vocabs:  # pre-supplied vocabs skip fitting
                state[key] = _VocabAccum(
                    capacity_hint=_per_column(self.max_size, key, 0)
                )
        return state

    def fit_mesh_plan(self, col_selector, input_schema) -> Optional[List[str]]:
        """Columns this op can fit ON the device mesh, or None.

        Mesh fit moves the vocabulary count onto the chips (one all_to_all
        exchange+sort per column, parallel/sharded_vocab.py) so the fit
        SCAN scales with devices instead of host cores — the reference
        scales this phase with dask workers (categorify.py:955-1137).
        Supported: every vocab group is a single integer column whose
        values fit int32 (the exchange keys are int32; the int32 max value
        itself is reserved as the routing pad)."""
        cols: List[str] = []
        for key, members in self._groups(col_selector):
            if key in self.vocabs:
                continue
            if len(members) > 1:
                return None  # joint/combo groups mix columns: host path
            name = members[0]
            col_schema = input_schema.get(name) if input_schema else None
            if col_schema is None or col_schema.dtype is None:
                return None
            kind = np.dtype(col_schema.dtype.to_numpy()).kind
            if kind not in ("i", "u"):
                return None
            cols.append(name)
        return cols or None

    def fit_mesh(self, buffers: Dict[str, List], mesh, axis: str = "data"):
        """Device-mesh vocabulary count: per column, ONE SPMD program
        hash-routes keys to owner devices over the mesh all_to_all and
        sorts each owner's shard; the host run-length-encodes the disjoint
        shards into exact (value, count) pairs. Falls back to the host
        counter for any column whose values exceed int32 (checked on the
        actual data, not just the schema).

        ``buffers``: {column: [(values, validity), ...]} collected by the
        FitEngine during its scan. Returns standard fit state (a
        _VocabAccum per column) so reduce/finalize run unchanged."""
        from ..parallel.sharded_vocab import _PAD, sharded_value_counts_arrays

        state: Dict[str, _VocabAccum] = {}
        for name, parts in buffers.items():
            accum = _VocabAccum()
            chunks = []
            for vals, validity in parts:
                if validity is not None:
                    accum.null_count += int((~validity).sum())
                    vals = vals[validity]
                if len(vals) == 0:
                    continue
                accum._int_dtype = (
                    vals.dtype
                    if accum._int_dtype is None
                    else np.promote_types(accum._int_dtype, vals.dtype)
                )
                accum.rows += len(vals)
                chunks.append(vals)
            keys = (
                np.concatenate(chunks) if chunks else np.empty(0, dtype=np.int64)
            )
            in_range = keys.size == 0 or (
                keys.min() >= np.iinfo(np.int32).min and keys.max() < int(_PAD)
            )
            if not in_range:
                # values outside int32 (or colliding with the pad): count
                # on the host instead — same exact result
                accum = _VocabAccum()
                for vals, validity in parts:
                    accum.update(np.asarray(vals), validity)
                state[name] = accum
                continue
            vals64, cnts = sharded_value_counts_arrays(
                keys.astype(np.int32, copy=False), mesh, axis
            )
            if _native_counter():
                from ..serving.native import NativeCounter

                accum._counter = NativeCounter(
                    initial_capacity=max(len(vals64) * 10 // 7, 1 << 10)
                )
                accum._use_native = True
                accum._counter.add(vals64, cnts)
            else:  # pragma: no cover - host without the C++ toolchain
                import pyarrow as pa

                accum.partials = [pa.table({"value": vals64, "count": cnts})]
            state[name] = accum
        return state

    @annotate("Categorify.fit")
    def fit_batch(self, col_selector, batch: TableBatch, state):
        jobs = []  # (accum, values, validity)
        for key, members in self._groups(col_selector):
            if key not in state:
                continue
            accum = state[key]
            if len(members) > 1 and self.encode_type == "combo":
                values, validity = _combo_values(batch, members)
                jobs.append((accum, values, validity))
            else:
                for mcol in members:
                    col = batch[mcol].to_host()
                    vals = np.asarray(col.values)
                    validity = (
                        np.asarray(col.validity) if col.validity is not None else None
                    )
                    if col.is_list:
                        # flatten multihots for vocab counting
                        # (reference _maybe_flatten_list_column, :1828)
                        validity = None
                    jobs.append((accum, vals, validity))
        # Column threading: native-counter accumulators (int keys, pure C++,
        # GIL released) run in a pool, one thread per accumulator. Arrow
        # accumulators stay serial — concurrent pyarrow value_counts
        # segfaults in this environment.
        by_accum: Dict[int, List] = {}
        for job in jobs:
            by_accum.setdefault(id(job[0]), []).append(job)
        pooled, serial = [], []
        for group in by_accum.values():
            accum = group[0][0]
            all_int = all(j[1].dtype.kind in ("i", "u") for j in group)
            if all_int and accum._use_native is not False and _native_counter():
                pooled.append(group)
            else:
                serial.append(group)

        def run_group(group):
            for accum, vals, validity in group:
                accum.update(vals, validity)

        # NOTE: LPT ordering (big partitioned counters first) was tried and
        # measured slightly SLOWER: it schedules the big-table columns onto
        # all threads at once, and concurrent random access does not scale
        # on this host (see PCounter32) — the natural column order staggers
        # them between cache-resident small columns instead.
        if len(pooled) >= 4:
            list(_shared_pool().map(run_group, pooled))
        else:
            serial = pooled + serial
        for group in serial:
            run_group(group)
        return state

    def fit_batch_concurrent(self, state) -> bool:
        """True when every accumulator is committed to the native C++
        counter: fit_batch is then GIL-releasing and the FitEngine may run
        it on a side thread overlapped with other ops' numpy scans. Arrow
        accumulators (string keys) must stay on the main thread —
        concurrent pyarrow aggregation segfaults in this environment —
        and undecided accumulators (before their first batch) keep the
        first pass serial so the decision itself is race-free."""
        return bool(state) and all(
            accum._use_native is True and not accum.partials
            for accum in state.values()
        )

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            for key in out:
                out[key].merge(s[key])
        return out

    def fit_reduce_multihost(self, state):
        """Multi-process reduction of per-host vocab accumulators.

        Large int-key vocabularies exchange (key, count) pairs via ONE mesh
        all-to-all so each pair travels once and each host re-receives only
        the merged table — O(vocab) per host instead of the O(hosts × vocab)
        whole-accumulator pickle allgather (reference distributes this as a
        dask shuffled groupby, nvtabular/ops/categorify.py:1344-1540).
        Small or string-keyed accumulators take the allgather merge.

        Routing is decided from ALLGATHERED metadata so every host issues
        the identical collective sequence regardless of local shard skew.
        """
        import pyarrow as pa
        import pyarrow.types as pat

        from ..parallel.multihost import allgather_pyobj
        from ..parallel.sharded_vocab import (
            exchange_partial_counts,
            exchange_partial_string_counts,
        )

        threshold = int(os.environ.get("NVT_VOCAB_EXCHANGE_MIN", 65536))

        local_meta: Dict[str, tuple] = {}
        extracted: Dict[str, tuple] = {}
        for key in sorted(state):
            accum = state[key]
            if accum._counter is not None and not accum.partials:
                k, c = accum._counter.extract()
                extracted[key] = (k, c)
                flavor = "native"
                uniq = len(k)
            elif accum._counter is None and not accum.partials:
                extracted[key] = (
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.int64),
                )
                flavor = "empty"
                uniq = 0
            else:
                accum._reaggregate()
                vtype = accum.partials[0].schema.field("value").type
                if accum._counter is None and (
                    pat.is_string(vtype) or pat.is_large_string(vtype)
                ):
                    flavor = "str"
                    uniq = accum.partials[0].num_rows
                else:
                    flavor = "other"
                    uniq = accum.rows
            local_meta[key] = (
                flavor,
                uniq,
                str(accum._int_dtype) if accum._int_dtype is not None else None,
                accum.rows,
                accum.null_count,
            )

        all_meta = allgather_pyobj(local_meta)
        exchange_keys: List[str] = []
        gather_keys: List[str] = []
        str_exchange_keys: List[str] = []
        for key in sorted(state):
            flavors = {m[key][0] for m in all_meta}
            total_uniq = max(m[key][1] for m in all_meta)
            if flavors <= {"native", "empty"} and total_uniq >= threshold:
                exchange_keys.append(key)
            elif flavors <= {"str", "empty"} and total_uniq >= threshold:
                # string vocabularies ride the byte-lane all-to-all
                # (exchange_partial_string_counts): O(vocab-bytes) per host
                str_exchange_keys.append(key)
            else:
                gather_keys.append(key)
                if total_uniq >= threshold:
                    # only MIXED-flavor (or exotic-dtype) large vocabs still
                    # take the whole-accumulator allgather
                    LOG.warning(
                        "Categorify.fit: vocab %r (%d uniques, mixed/exotic "
                        "key flavors %s) reduces via whole-accumulator "
                        "allgather — O(hosts x bytes) per host.",
                        key,
                        total_uniq,
                        sorted(flavors),
                    )

        out: Dict[str, _VocabAccum] = {}
        for key in str_exchange_keys:
            accum = state[key]
            if accum.partials:
                tbl = accum.partials[0]
                vals = tbl.column("value").to_numpy(zero_copy_only=False)
                cnts = tbl.column("count").to_numpy(zero_copy_only=False)
            else:  # this shard saw no data for the column
                vals = np.empty(0, dtype=object)
                cnts = np.empty(0, dtype=np.int64)
            owned_v, owned_c = exchange_partial_string_counts(vals, cnts)
            shards = allgather_pyobj((owned_v, owned_c))
            full_v = np.concatenate([np.asarray(s[0], dtype=object) for s in shards])
            full_c = np.concatenate([np.asarray(s[1], dtype=np.int64) for s in shards])
            merged = _VocabAccum()
            merged.rows = sum(m[key][3] for m in all_meta)
            merged.null_count = sum(m[key][4] for m in all_meta)
            merged.partials = [
                pa.table(
                    {
                        "value": pa.array(full_v.tolist(), type=pa.string()),
                        "count": pa.array(full_c, type=pa.int64()),
                    }
                )
            ]
            out[key] = merged
        for key in exchange_keys:
            k, c = extracted[key]
            owned_k, owned_c = exchange_partial_counts(k, c)
            shards = allgather_pyobj((owned_k, owned_c))
            full_k = np.concatenate([s[0] for s in shards])
            full_c = np.concatenate([s[1] for s in shards])
            merged = _VocabAccum()
            merged.rows = sum(m[key][3] for m in all_meta)
            merged.null_count = sum(m[key][4] for m in all_meta)
            dtypes = [m[key][2] for m in all_meta if m[key][2] is not None]
            if dtypes:
                merged._int_dtype = np.dtype(dtypes[0])
                for d in dtypes[1:]:
                    merged._int_dtype = np.promote_types(merged._int_dtype, np.dtype(d))
            if _native_counter():
                from ..serving.native import NativeCounter

                merged._counter = NativeCounter()
                merged._use_native = True
                merged._counter.add(full_k, full_c)
            else:  # pragma: no cover - host without the C++ library
                import pyarrow as pa

                merged.partials = [pa.table({"value": full_k, "count": full_c})]
            out[key] = merged
        if gather_keys:
            sub = {key: state[key] for key in gather_keys}
            merged_sub = self.fit_merge(allgather_pyobj(sub))
            out.update(merged_sub)
        self.last_fit_reduce = {
            "exchange": exchange_keys,
            "str_exchange": str_exchange_keys,
            "gather": gather_keys,
        }
        return out

    def fit_finalize(self, state):
        def finalize_one(item):
            key, accum = item
            values, counts, _nulls = accum.finalize()
            ft = _per_column(self.freq_threshold, key, 0)
            nb = _per_column(self.num_buckets, key, 1) or 1
            mx = _per_column(self.max_size, key, 0)
            if ft > 0:
                keep = counts >= ft
                values, counts = values[keep], counts[keep]
            if mx and mx > 0:
                budget = max(0, mx - (OOV_OFFSET + nb))
                values, counts = values[:budget], counts[:budget]
            vocab = _Vocab(values, counts, nb)
            if (
                not self.single_table
                and self._memory_limit_bytes() is None
                and os.environ.get("NVT_PREBUILD_DEVICE_LUTS", "1") != "0"
            ):
                # pre-build the gather table inside the pool (C++ cuckoo
                # build releases the GIL) so the first transform doesn't
                # serialize 26 builds; skipped under single_table (offsets
                # not final yet), memory budgets (may release right away),
                # and NVT_PREBUILD_DEVICE_LUTS=0 (host-only pipelines never
                # touch the device gather tables — e.g. the end-to-end
                # fit→transform→write bench, whose consumer is a parquet
                # encoder on the host)
                vocab.lookup_struct()
            return key, vocab

        items = list(state.items())
        # native-counter finalize is numpy+C++ (thread-safe, GIL-released);
        # arrow-partial accums stay serial (concurrent pyarrow aggregation
        # segfaults in this environment — see CLAUDE.md)
        pooled = [it for it in items if it[1]._counter is not None and not it[1].partials]
        serial = [it for it in items if it not in pooled]
        if len(pooled) >= 4:
            results = list(_shared_pool().map(finalize_one, pooled))
        else:
            serial = pooled + serial
            results = []
        results.extend(finalize_one(it) for it in serial)
        for key, vocab in results:
            self.vocabs[key] = vocab
        if self.single_table:
            # contiguous global index space (reference fit_finalize:404-415)
            offset = 0
            for key in sorted(self.vocabs):
                self.vocabs[key].offset = offset
                offset += self.vocabs[key].size
        self._write_vocab_artifacts()
        limit = self._memory_limit_bytes()
        if limit is not None:
            total = sum(v.host_nbytes() for v in self.vocabs.values())
            if total > limit:
                LOG.warning(
                    "categorify vocabularies use %d bytes (> %d budget); "
                    "tables will spill to parquet under LRU",
                    total,
                    limit,
                )
        self._release_disk_tier()
        self._enforce_memory_limit()

    def _write_vocab_artifacts(self):
        """Persist each vocab as parquet, reference `_save_encodings` analog:
        one row per code starting at the null slot (categorify.py:811-819)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        out_dir = os.path.join(self.out_path, "categories")
        os.makedirs(out_dir, exist_ok=True)

        def write_one(item):
            key, vocab = item
            path = os.path.join(out_dir, f"unique.{_safe_name(key)}.parquet")
            vals = vocab.values_by_code
            arr = pa.array(vals.tolist() if getattr(vals, "dtype", np.dtype("O")).kind == "O" else vals)
            counts = pa.array(np.asarray(vocab.counts, dtype=np.int64))
            tbl = pa.table({key: arr, f"{key}_size": counts})
            # vocab values are unique by construction: dictionary encoding
            # is pure overhead (measured ~10x slower at multi-M keys);
            # zstd because artifact writes are disk-bound like io/writer.py;
            # DELTA/BYTE_STREAM_SPLIT pre-transforms for the same 2.8x
            # encode-rate win the output writer measured
            from ..io.writer import _column_encodings, _resolve_compression

            codec, level = _resolve_compression(
                os.environ.get("NVT_PARQUET_COMPRESSION", "auto"), tbl.schema
            )
            pq.write_table(
                tbl,
                path,
                use_dictionary=False,
                compression=codec,
                compression_level=level,
                column_encoding=_column_encodings(tbl.schema),
            )
            return key, path

        items = list(self.vocabs.items())
        if len(items) >= 4:
            # distinct files: arrow's parquet encoder releases the GIL
            # (same pattern as io/writer.py's parallel per-file encode)
            results = list(_shared_pool().map(write_one, items))
        else:
            results = [write_one(it) for it in items]
        for key, path in results:
            self.categories[key] = path
            self.vocabs[key].artifact_path = path
            self.vocabs[key].tier = self._tier(key)

    def clear(self):
        super().clear()
        self.vocabs = {}
        self.categories = {}
        self._batched_cache = None
        self._combo_luts = {}
        self._lru = {}
        self._lru_tick = 0
        self.cache_stats = {"hits": 0, "reloads": 0, "releases": 0}

    def set_storage_path(self, new_path, copy=False):
        import shutil

        os.makedirs(new_path, exist_ok=True)
        new_categories = {}
        for key, path in self.categories.items():
            dest = os.path.join(new_path, os.path.basename(path))
            if copy:
                shutil.copyfile(path, dest)
            else:
                shutil.move(path, dest)
            new_categories[key] = dest
            if key in self.vocabs:
                self.vocabs[key].artifact_path = dest
        self.categories = new_categories

    # ------------------------------------------------------------------
    # vocab memory hierarchy
    # ------------------------------------------------------------------
    def _tier(self, key: str) -> str:
        tier = _per_column(self.cat_cache, key, "host")
        return tier if tier in ("device", "host", "disk") else "host"

    def _memory_limit_bytes(self) -> Optional[int]:
        limit = self.cardinality_memory_limit
        if limit is None:
            return None
        if isinstance(limit, str):
            from ..io.dataset import _parse_bytes

            return _parse_bytes(limit)
        return int(limit)

    def _resident_vocab(self, key: str) -> _Vocab:
        """Fetch a vocab for use NOW: reload from parquet if released, touch
        the LRU, and release the least-recently-used vocabs past the
        configured memory budget (cache-hierarchy analog of the reference's
        per-worker cat_cache fetch, categorify.py:1627-1643)."""
        vocab = self.vocabs[key]
        vocab.tier = self._tier(key)
        if vocab.ensure_resident():
            self.cache_stats["reloads"] += 1
            LOG.info("categorify vocab %r reloaded from %s", key, vocab.artifact_path)
        else:
            self.cache_stats["hits"] += 1
        self._lru_tick += 1
        self._lru[key] = self._lru_tick
        self._enforce_memory_limit(protect=key)
        return vocab

    def _enforce_memory_limit(self, protect: Optional[str] = None):
        limit = self._memory_limit_bytes()
        if limit is None:
            return
        resident = [
            (self._lru.get(k, 0), k, v)
            for k, v in self.vocabs.items()
            if v.resident and v.artifact_path is not None and k != protect
        ]
        total = sum(v.host_nbytes() for _, _, v in resident)
        if protect is not None and protect in self.vocabs:
            total += self.vocabs[protect].host_nbytes()
        resident.sort()  # oldest LRU tick first
        for _, k, v in resident:
            if total <= limit:
                break
            freed = v.release_host()
            if freed:
                total -= freed
                self.cache_stats["releases"] += 1
                LOG.info("categorify vocab %r released (%d bytes)", k, freed)

    def _release_disk_tier(self):
        """disk-tier vocabs don't persist between transform calls."""
        for key, vocab in self.vocabs.items():
            if self._tier(key) == "disk" and vocab.release_host():
                self.cache_stats["releases"] += 1

    # ------------------------------------------------------------------
    # transform
    # ------------------------------------------------------------------
    def device_state(self):
        """Publish lookup tables as jit arguments (the per-worker vocab cache
        of the reference, merlin.io.worker / P4 — here the cache is device HBM
        and the executor owns placement). Column-batched concat tables are
        published for the vectorized path; per-vocab tables for solo columns."""
        from .lookup import BatchedStash

        state = {}
        batched = self._get_batched()
        covered = set()
        for bkey, (blut, row_index) in batched.items():
            state[f"categorify:{id(self)}:batched:{bkey}"] = blut.concat
            if isinstance(blut, BatchedStash):
                # the overflow stash rides as its own SMALL device array —
                # gather cost tracks operand size (kernels/README.md)
                state[f"categorify:{id(self)}:batched:{bkey}:overflow"] = (
                    blut.stash_concat
                )
            covered.update(row_index)
        for vkey, vocab in self.vocabs.items():
            if self._tier(vkey) == "disk":
                continue  # disk tier: no persistent HBM copy
            if vkey in covered:
                # every device encode for this vocab routes through the
                # batched concat — publishing the solo table too would
                # double the HBM + transfer (1.7 GB at 26x2.8M-key vocabs)
                vocab.state_key = None
                continue
            lut = self._resident_vocab(vkey).lookup_struct()
            if lut is None:
                continue
            key = f"categorify:{id(self)}:{vkey}"
            vocab.state_key = key
            state[key] = lut.host_table
        for ckey, struct in (getattr(self, "_combo_luts", None) or {}).items():
            if struct is None:
                continue
            state[f"categorify:{id(self)}:combo:{ckey}:hlut"] = struct[0].host_table
            state[f"categorify:{id(self)}:combo:{ckey}:h2"] = struct[1]
        return state

    def is_jit_safe(self, col_selector, input_schema):
        if input_schema is None or not self.vocabs:
            return False
        for cs in input_schema:
            if cs.dtype.is_string or not cs.dtype.is_numeric:
                return False
        for vocab in self.vocabs.values():
            # device arrays are ≤32-bit (jax x64 off): int keys beyond
            # int32 range would arrive truncated → host path.
            # (int32_safe is recorded at build so released vocabs answer too)
            if not vocab.int32_safe:
                return False
        if self.encode_type == "combo" and col_selector is not None:
            for key, members in self._groups(col_selector):
                if len(members) > 1 and self._combo_device_struct(key) is None:
                    return False  # crossed key needs its hash-pair lookup
        return True

    def _combo_device_struct(self, key: str):
        """(lut, h2_padded, width) encoding hashed int member TUPLES →
        vocab row index for combo groups, or None (host path). The fitted
        combo values are str-joined member tuples; all-int tuples parse
        back losslessly, hash into a collision-checked pair (same scheme as
        KeyedStats.hashed_lookup_struct), and the crossed column then stays
        inside the fused device program."""
        cache = getattr(self, "_combo_luts", None)
        if cache is None:
            cache = self._combo_luts = {}
        if key in cache:
            return cache[key]
        result = None
        vocab = self.vocabs.get(key)
        nb = _per_column(self.num_buckets, key, 1) or 1
        if vocab is not None and nb == 1:  # multi-bucket OOV hashes strings
            vocab.ensure_resident()
            vals = np.asarray(vocab.values_by_code)
            if len(vals) and vals.dtype.kind == "O":
                try:
                    # _combo_values joins member values with "_"
                    parts = [str(v).split("_") for v in vals]
                    width = len(parts[0])
                    if width >= 2 and all(len(p) == width for p in parts):
                        arrays = [
                            np.array([int(p[i]) for p in parts], dtype=np.int64)
                            for i in range(width)
                        ]
                        i32 = np.iinfo(np.int32)
                        if all(
                            a.min() >= i32.min and a.max() <= i32.max
                            for a in arrays
                        ):
                            from .groupby_stats import hash_multi_key
                            from .lookup import build_lookup

                            h1 = hash_multi_key(arrays, seed=0xA1)
                            if len(np.unique(h1)) == len(h1):
                                lut = build_lookup(
                                    h1.astype(np.int64)
                                    .astype(np.int32)
                                    .astype(np.int64),
                                    np.arange(len(h1), dtype=np.int32),
                                    tiny_max=512,  # solo probe per combo
                                )
                                if lut is not None:
                                    h2 = hash_multi_key(arrays, seed=0xB7)
                                    result = (
                                        lut,
                                        np.append(
                                            h2.astype(np.uint32), np.uint32(0)
                                        ),
                                        width,
                                    )
                except ValueError:
                    result = None
        cache[key] = result
        return result

    def _encode_combo_device(self, key: str, cols: List[Column], struct) -> Column:
        import jax.numpy as jnp

        from ..dag.device_state import get_device_state
        from .groupby_stats import hash_multi_key

        lut, h2_padded, _width = struct
        vocab = self.vocabs[key]
        miss = jnp.int32(len(h2_padded) - 1)
        table_dev = get_device_state(f"categorify:{id(self)}:combo:{key}:hlut")
        h2_dev = get_device_state(f"categorify:{id(self)}:combo:{key}:h2")
        if table_dev is None:
            table_dev = jnp.asarray(lut.host_table)
        if h2_dev is None:
            h2_dev = jnp.asarray(h2_padded)
        arrays = [c.values for c in cols]
        h1 = hash_multi_key(arrays, seed=0xA1).astype(jnp.int32)
        idx = lut.encode_dev(table_dev, h1, miss)
        found = (idx != miss) & (
            jnp.take(h2_dev, idx) == hash_multi_key(arrays, seed=0xB7)
        )
        codes = jnp.where(found, idx + vocab.start_index, OOV_OFFSET)
        nulls = jnp.zeros(codes.shape, dtype=bool)
        for c in cols:
            if c.validity is not None:
                nulls |= ~c.validity
            if c.values.dtype.kind == "f":
                nulls |= jnp.isnan(c.values)
        codes = jnp.where(nulls, NULL_INDEX, codes) + vocab.offset
        return Column(codes.astype(self._out_dtype_np()))

    @annotate("Categorify.transform")
    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        # jobs carry the vocab KEY, not the vocab: each encode path
        # materializes via _resident_vocab at its point of use, so the LRU
        # budget can spill vocabs between columns within one batch
        jobs: List[Tuple[str, str, Column]] = []  # preserve output order
        for key, members in self._groups(col_selector):
            if len(members) > 1 and self.encode_type == "combo":
                cols = [batch[m] for m in members]
                struct = self._combo_device_struct(key)
                if struct is not None and all(xnp(c.values) is not np for c in cols):
                    out[key] = self._encode_combo_device(key, cols, struct)
                    continue
                vocab = self._resident_vocab(key)
                values, validity = _combo_values(batch.to_host(), members)
                codes = vocab.encode_host(values, validity)
                out[key] = Column(codes.astype(self._out_dtype_np()))
            else:
                for mcol in members:
                    jobs.append((mcol, self._vocab_key(key, members, mcol), batch[mcol]))
        # Column-batched device lookup: every eligible column encodes through
        # ONE gather (direct group) + TWO row-gathers (cuckoo group) — the
        # per-column loop would emit 26 separate gather ops and bloat the
        # fused program (slow XLA compile, more dispatch).
        batched = self._encode_batched_device(jobs)
        # host fast path: thread-parallel C++ hash-map encodes (tables are
        # read-only; ctypes releases the GIL during the native call)
        batched.update(self._encode_batched_host_native(jobs, skip=batched))
        for name, vkey, col in jobs:
            if name in batched:
                codes = batched[name]
            else:
                vocab = self._resident_vocab(vkey)
                m = xnp(col.values)
                if m is np:
                    codes = vocab.encode_host(
                        np.asarray(col.values),
                        np.asarray(col.validity) if col.validity is not None else None,
                    ).astype(self._out_dtype_np())
                else:
                    codes = vocab.encode_device(col.values, col.validity).astype(
                        self._out_dtype_np()
                    )
            # multihot: re-wrap encoded flat values with original offsets
            # (reference encode_list_column, categorify.py:1802-1803)
            out[name] = Column(codes, col.offsets)
        self._release_disk_tier()
        return out

    def _get_batched(self):
        """Column-batched lookup structures over ALL fitted vocabs, built
        deterministically (sorted vocab key) so device_state and transform
        agree. Returns {bin_key: (batched_lut, {vocab_key: row_index})}
        where bin_key is "<kind>#<i>".

        Concats are SIZE-CAPPED into bins (NVT_BATCHED_CONCAT_LIMIT bytes,
        default 48 MB): v5e row-gathers run ~180 M probes/s while the
        operand stays under ~48 MB / 1.5M rows and cliff to ~66 M/s past
        it (bench/lookup_probe.py, kernels/README.md), so several
        fast-regime gathers beat one giant one; at small vocabs everything
        lands in one bin and the behavior is the round-1 single-gather."""
        from .lookup import (
            BatchedCuckoo,
            BatchedDirect,
            BatchedStash,
            BatchedTiny,
            DirectLookup,
            StashLookup,
            TinyLookup,
        )

        if self._memory_limit_bytes() is not None:
            # the batched concat duplicates every table — incompatible with
            # a bounded vocab memory budget; solo paths stay LRU-managed
            return {}
        token = tuple(sorted((k, id(v)) for k, v in self.vocabs.items()))
        if self._batched_cache is not None and self._batched_cache[0] == token:
            return self._batched_cache[1]
        by_kind: Dict[str, List[Tuple[str, Any]]] = {
            "tiny": [],
            "direct": [],
            "stash": [],
            "cuckoo": [],
        }
        for vkey in sorted(self.vocabs):
            if self._tier(vkey) == "disk":
                continue  # disk tier columns encode solo (no duplicate copy)
            vocab = self._resident_vocab(vkey)
            lut = vocab.lookup_struct() if len(vocab.values_by_code) else None
            if lut is None:
                continue
            if isinstance(lut, TinyLookup):
                kind = "tiny"
            elif isinstance(lut, DirectLookup):
                kind = "direct"
            elif isinstance(lut, StashLookup):
                kind = "stash"
            else:
                kind = "cuckoo"
            by_kind[kind].append((vkey, lut))
        if len(by_kind["tiny"]) == 1 and len(by_kind["tiny"][0][1].keys) > 512:
            # a LONE large-v compare column has no batch to ride (~9M
            # lookups/s single-column vs 135M/s for 2 gather probes):
            # demote it to a cuckoo table
            from .lookup import build_cuckoo

            vkey, lut = by_kind["tiny"].pop()
            by_kind["cuckoo"].append(
                (vkey, build_cuckoo(lut.keys.astype(np.int64), lut.codes))
            )
        out = {}
        builders = {
            "tiny": BatchedTiny,
            "direct": BatchedDirect,
            "stash": BatchedStash,
            "cuckoo": BatchedCuckoo,
        }
        limit = int(os.environ.get("NVT_BATCHED_CONCAT_LIMIT", 48 * 1024 * 1024))
        for kind, entries in by_kind.items():
            if not entries:
                continue
            if kind == "tiny":
                # ONE bin for every tiny column: measured compare-select
                # throughput scales with the BATCHED column count (v5e,
                # bench/lookup_probe.py attribution: a 1-column v=2048 bin
                # runs 8.9M lookups/s; 8 columns at v=4096 run 168M/s), and
                # the per-lookup rate is only weakly v-dependent below 4K —
                # so padding everything to the bin vmax costs less than
                # splitting columns into smaller bins ever saves
                bins = [entries]
            else:
                # First-fit-DECREASING by table bytes (ties broken by vkey
                # for determinism): real tabular data is size-skewed —
                # Criteo has ~5 multi-million-key columns and ~21 tiny ones
                # — and gather cost tracks the operand array's size
                # (kernels/README.md), so the small tables must share a
                # small cached-regime bin rather than interleave with the
                # big tables' bins.
                entries = sorted(entries, key=lambda e: (-e[1].nbytes, e[0]))
                bins = [[]]
                bin_sizes = [0]
                for vkey, lut in entries:
                    nb = lut.nbytes
                    for i, used in enumerate(bin_sizes):
                        if not bins[i] or used + nb <= limit:
                            bins[i].append((vkey, lut))
                            bin_sizes[i] += nb
                            break
                    else:
                        bins.append([(vkey, lut)])
                        bin_sizes.append(nb)
            for bi, bin_entries in enumerate(bins):
                luts = [l for _, l in bin_entries]
                blut = builders[kind](luts)
                out[f"{kind}#{bi}"] = (
                    blut,
                    {vkey: i for i, (vkey, _) in enumerate(bin_entries)},
                )
        self._batched_cache = (token, out)
        return out

    def _encode_batched_host_native(self, jobs, skip) -> Dict[str, Any]:
        """Thread-parallel native (C++) host encodes for numeric host
        columns. Returns {col_name: codes int32}; empty when the native
        library is unavailable."""
        work = []
        for name, vkey, col in jobs:
            if name in skip or xnp(col.values) is not np:
                continue
            values = np.asarray(col.values)
            if values.dtype.kind not in ("i", "u"):
                continue
            vocab = self._resident_vocab(vkey)
            table = vocab.native_table()
            if table is None:
                continue
            validity = np.asarray(col.validity) if col.validity is not None else None
            if col.is_list:
                validity = None
            work.append((name, vocab, table, values, validity))
        if not work:
            return {}
        out_dtype = self._out_dtype_np()

        def encode_one(item):
            name, vocab, table, values, validity = item
            codes = table.encode(
                values, validity,
                null_index=NULL_INDEX, oov_index=OOV_OFFSET, offset=vocab.offset,
            )
            return name, codes.astype(out_dtype, copy=False)

        if len(work) >= 4:
            # LPT order: biggest tables first so a multi-million-key column
            # never lands at the tail of one thread's queue while the others
            # drain tiny columns (the 5 large Criteo columns cost ~2x a
            # small one each — scheduling them first trims the makespan)
            work.sort(key=lambda it: -len(it[1].values_by_code))
            return dict(_shared_pool().map(encode_one, work))
        return dict(encode_one(w) for w in work)

    def _encode_batched_device(self, jobs) -> Dict[str, Any]:
        """Vectorize same-shape device columns through the column-batched
        lookup structures. Returns {col_name: codes} for columns handled."""
        from ..dag.device_state import get_device_state
        from .lookup import BatchedStash

        batched = self._get_batched()
        if not batched:
            return {}
        # which size-capped bin owns each vocab key
        bin_of: Dict[str, str] = {}
        for bkey, (_, row_index) in batched.items():
            for vk in row_index:
                bin_of[vk] = bkey
        groups: Dict[Tuple, List[Tuple[str, str, "_Vocab", Column]]] = {}
        for name, vkey, col in jobs:
            if xnp(col.values) is np:
                continue
            # list columns participate via their FLAT values array (their
            # own shape group); offsets re-wrap in the caller.
            # disk-tier (and budget-spilled) columns take the solo path
            bkey = bin_of.get(vkey)
            if bkey is None:
                continue
            vocab = self._resident_vocab(vkey)
            groups.setdefault(
                (bkey, col.values.shape, str(col.values.dtype)), []
            ).append((name, vkey, vocab, col))
        result: Dict[str, Any] = {}
        for (bkey, shape, _dt), items in groups.items():
            blut, row_index = batched[bkey]
            import jax.numpy as jnp

            sel = np.array([row_index[vk] for _, vk, _, _ in items], dtype=np.int64)
            state_key = f"categorify:{id(self)}:batched:{bkey}"
            concat_dev = get_device_state(state_key)
            if concat_dev is None:
                concat_dev = jnp.asarray(blut.concat)
            vals = jnp.stack([c.values for _, _, _, c in items]).astype(jnp.int32)
            miss = jnp.stack(
                [jnp.broadcast_to(v._oov_codes_dev(c.values), c.values.shape)
                 for _, _, v, c in items]
            )
            if isinstance(blut, BatchedStash):
                stash_dev = get_device_state(
                    f"categorify:{id(self)}:batched:{bkey}:overflow"
                )
                codes = blut.encode_dev(
                    concat_dev, vals, miss, sel=sel, stash_dev=stash_dev
                )
            else:
                codes = blut.encode_dev(concat_dev, vals, miss, sel=sel)
            # null handling + single_table offsets, vectorized (list
            # columns carry no per-value validity — matches the fit, which
            # flattens multihots with validity=None)
            valids = [None if c.is_list else c.validity for _, _, _, c in items]
            if any(v is not None for v in valids):
                nulls = jnp.stack(
                    [
                        (~v) if v is not None
                        else jnp.zeros(c.values.shape, dtype=bool)
                        for v, (_, _, _, c) in zip(valids, items)
                    ]
                )
                codes = jnp.where(nulls, NULL_INDEX, codes)
            offsets = jnp.asarray(
                np.array([v.offset for _, _, v, _ in items], dtype=np.int32)
            )[:, None]
            codes = (codes + offsets).astype(jnp.dtype(self._out_dtype_np()))
            for i, (name, _, _, _) in enumerate(items):
                result[name] = codes[i]
        return result

    def _out_dtype_np(self):
        if self.dtype is not None:
            return md.to_numpy(self.dtype)
        return np.dtype(np.int32)

    # ------------------------------------------------------------------
    # schema
    # ------------------------------------------------------------------
    @property
    def output_dtype(self):
        return md.normalize(self.dtype) if self.dtype is not None else md.int32

    @property
    def output_tags(self):
        return [Tags.CATEGORICAL]

    @property
    def dynamic_dtypes(self):
        return False

    def _compute_properties(self, col_schema, input_schema):
        key = col_schema.name
        vocab = self.vocabs.get(key)
        props: Dict[str, Any] = {}
        if vocab is not None:
            domain_max = vocab.size - 1 + vocab.offset
            card, dim = _emb_sz_rule(vocab.size)
            props = {
                "num_buckets": vocab.num_buckets if vocab.num_buckets > 1 else None,
                "freq_threshold": _per_column(self.freq_threshold, key, 0),
                "max_size": _per_column(self.max_size, key, 0),
                "cat_path": self.categories.get(key, os.path.join(self.out_path, "categories")),
                "domain": {"min": 0, "max": domain_max, "name": key},
                "embedding_sizes": {"cardinality": card, "dimension": dim},
            }
        return col_schema.with_properties(props)

    def get_embedding_sizes(self, columns: Sequence[str]) -> Dict[str, Tuple[int, int]]:
        out = {}
        for name in columns:
            vocab = self.vocabs.get(name)
            if vocab is not None:
                out[name] = _emb_sz_rule(vocab.size)
        return out

    # ------------------------------------------------------------------
    # pre-supplied vocabularies (reference `vocabs=` option)
    # ------------------------------------------------------------------
    def _load_supplied_vocabs(self, vocabs: Dict[str, Any]):
        for key, vocab in vocabs.items():
            if isinstance(vocab, str):
                import pyarrow.parquet as pq

                tbl = pq.read_table(vocab)
                values = tbl.column(0).to_numpy(zero_copy_only=False)
            elif isinstance(vocab, (list, np.ndarray)):
                values = np.asarray(vocab)
            elif isinstance(vocab, Column):
                values = np.asarray(vocab.values)
            else:
                values = np.asarray(vocab)
            nb = _per_column(self.num_buckets, key, 1) or 1
            self.vocabs[key] = _Vocab(values, np.zeros(len(values), dtype=np.int64), nb)
        self.fitted = len(self.vocabs) > 0
        # persist immediately so save/load round-trips and the disk tier has
        # a backing file (reference process_vocabs writes the parquet at
        # construction too, categorify.py:process_vocabs)
        self._write_vocab_artifacts()

    # ------------------------------------------------------------------
    # serving fast path (C++ hash-map lookup; reference categorify.py:602-609)
    # ------------------------------------------------------------------
    def inference_initialize(self, col_selector, model_config=None):
        """Swap in the native C++ hash-map transform for eager serving —
        the reference's fast path (categorify.py:602-609). Restrictions
        match the reference C++ kernel: single OOV bucket, no combo."""
        if self.encode_type == "combo":
            return None
        if self.num_buckets not in (None, 1):
            return None
        try:
            from ..serving import native

            start_index = OOV_OFFSET + 1
            offsets = {k: v.offset for k, v in self.vocabs.items()}
            return native.CategorifyTransform(
                self.categories, num_buckets=1, start_index=start_index, offsets=offsets
            )
        except Exception:
            return None

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------
    def serialize_params(self):
        return {
            "freq_threshold": self.freq_threshold,
            "out_path": self.out_path,
            "cat_cache": self.cat_cache,
            "dtype": md.normalize(self.dtype).name if self.dtype is not None else None,
            "on_host": self.on_host,
            "encode_type": self.encode_type,
            "max_size": self.max_size,
            "num_buckets": self.num_buckets,
            "single_table": self.single_table,
            "search_sorted": self.search_sorted,
            "name_sep": self.name_sep,
        }

    def serialize_state(self):
        if not self.fitted and not self.vocabs:
            return None
        return {
            "categories": self.categories,
            "num_buckets_by_key": {k: v.num_buckets for k, v in self.vocabs.items()},
            "offsets_by_key": {k: v.offset for k, v in self.vocabs.items()},
        }

    def deserialize_state(self, state):
        import pyarrow.parquet as pq

        self.categories = dict(state["categories"])
        nbs = state.get("num_buckets_by_key", {})
        offs = state.get("offsets_by_key", {})
        for key, path in self.categories.items():
            tbl = pq.read_table(path)
            values = tbl.column(0).to_numpy(zero_copy_only=False)
            counts = (
                tbl.column(1).to_numpy(zero_copy_only=False)
                if tbl.num_columns > 1
                else np.zeros(len(values), dtype=np.int64)
            )
            vocab = _Vocab(values, counts, nbs.get(key, 1))
            vocab.offset = offs.get(key, 0)
            vocab.artifact_path = path
            vocab.tier = self._tier(key)
            self.vocabs[key] = vocab
        self.fitted = True


def _combo_values(batch: TableBatch, members: List[str]) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Crossed key for combo encoding: string join of member values (host)."""
    cols = [batch[mcol].to_host() for mcol in members]
    parts = []
    validity = None
    for col in cols:
        vals = np.asarray(col.values)
        parts.append(vals.astype(str) if vals.dtype.kind != "O" else vals.astype(str))
        nulls = np.asarray(col.is_null())
        validity = ~nulls if validity is None else (validity & ~nulls)
    combined = parts[0]
    for p in parts[1:]:
        combined = np.char.add(np.char.add(combined.astype(str), "_"), p.astype(str))
    return combined.astype(object), validity


def _safe_name(name: str) -> str:
    return "".join(c if c.isalnum() or c in "._-" else "_" for c in name)


def get_embedding_sizes(source, output_dtypes=None) -> Dict[str, Tuple[int, int]]:
    """Embedding (cardinality, dimension) per categorical column from a fitted
    Workflow or node (reference categorify.py:616-663)."""
    from ..workflow.workflow import Workflow

    if isinstance(source, Workflow):
        schema = source.output_schema
        nodes = source.graph.nodes
    else:
        graph = source.graph if hasattr(source, "graph") else None
        schema = source.output_schema if hasattr(source, "output_schema") else None
        nodes = graph.nodes if graph else []

    out: Dict[str, Tuple[int, int]] = {}
    multihot: Dict[str, Tuple[int, int]] = {}
    if schema is not None:
        for cs in schema:
            emb = cs.properties.get("embedding_sizes")
            if emb:
                pair = (emb["cardinality"], emb["dimension"])
                if cs.is_list:
                    multihot[cs.name] = pair
                else:
                    out[cs.name] = pair
    if multihot:
        return out, multihot
    return out
