"""ctypes bridge to the C++ serving kernels (cpp/nvt_serving.cc).

The shared library is compiled on demand with g++ (cached next to the
source, keyed by source hash) — pybind11 is not available in this
environment, and the C ABI keeps the boundary trivial: numpy arrays in,
numpy arrays out, zero copies for the hot arrays.

Mirrors the reference's serving kernels:
* ``CategorifyTransform`` — per-column hash-map lookup with the 0/1/2+
  pad/null/OOV layout, vocab tables shared across instances through the
  C++ named cache (reference cpp/nvtabular/inference/categorify.cc).
* ``FillTransform`` — vectorized NaN fill (reference fill.cc).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Any, Dict, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPP = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "cpp", "nvt_serving.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_ERR is not None:
            raise RuntimeError(_LIB_ERR)
        try:
            with open(_CPP, "rb") as f:
                src = f.read()
            # -march=native is safe: the .so is built on demand on the
            # machine that runs it. -fno-trapping-math/-fno-math-errno do
            # not change IEEE results; they let g++ speculate FP divides so
            # the branch-free cont_pipe select chains vectorize (measured
            # 8x on the log1p chain, bit-identical output).
            flags = [
                "-O3",
                "-march=native",
                "-fno-trapping-math",
                "-fno-math-errno",
                "-std=c++17",
                "-pthread",  # HugeArray background populate threads
            ]
            tag = hashlib.sha256(src + " ".join(flags).encode()).hexdigest()[:16]
            cache_dir = os.environ.get(
                "NVT_TPU_NATIVE_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache", "nvtabular_tpu"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"libnvt_serving_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                cmd = ["g++", *flags, "-shared", "-fPIC", _CPP, "-o", tmp]
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    # exotic hosts where -march=native fails: portable build
                    cmd = [c for c in cmd if c != "-march=native"]
                    subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
        except Exception as e:  # g++ missing, compile error, load error
            _LIB_ERR = f"native serving library unavailable: {e}"
            raise RuntimeError(_LIB_ERR) from e
        _configure(lib)
        _LIB = lib
        return lib


def _configure(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.nvt_cat_lookup.restype = ctypes.c_void_p
    lib.nvt_cat_lookup.argtypes = [ctypes.c_char_p]
    lib.nvt_cat_create_i64.restype = ctypes.c_void_p
    lib.nvt_cat_create_i64.argtypes = [ctypes.c_char_p, i64p, i32p, ctypes.c_int64]
    lib.nvt_cat_create_str.restype = ctypes.c_void_p
    lib.nvt_cat_create_str.argtypes = [ctypes.c_char_p, ctypes.c_char_p, i64p, i32p, ctypes.c_int64]
    lib.nvt_cat_release.argtypes = [ctypes.c_void_p]
    lib.nvt_cat_encode_i64.argtypes = [
        ctypes.c_void_p, i64p, u8p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    lib.nvt_cat_encode_i32.argtypes = [
        ctypes.c_void_p, i32p, u8p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    lib.nvt_cat_encode_str.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, i64p, u8p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    lib.nvt_fill_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float]
    lib.nvt_fill_f64.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.nvt_moments_f32.argtypes = [ctypes.POINTER(ctypes.c_float), u8p, ctypes.c_int64, f64p]
    lib.nvt_moments_f64.argtypes = [f64p, u8p, ctypes.c_int64, f64p]
    lib.nvt_moments_i32.argtypes = [i32p, u8p, ctypes.c_int64, f64p]
    lib.nvt_moments_i64.argtypes = [i64p, u8p, ctypes.c_int64, f64p]
    lib.nvt_cache_size.restype = ctypes.c_int64
    lib.nvt_counter_create.restype = ctypes.c_void_p
    lib.nvt_counter_create.argtypes = [ctypes.c_int64]
    lib.nvt_counter_update.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int64]
    lib.nvt_counter_update32.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.nvt_counter_add.argtypes = [ctypes.c_void_p, i64p, i64p, ctypes.c_int64]
    lib.nvt_counter_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.nvt_counter_size.restype = ctypes.c_int64
    lib.nvt_counter_size.argtypes = [ctypes.c_void_p]
    lib.nvt_counter_extract.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.nvt_counter_extract_sorted.argtypes = [ctypes.c_void_p, i64p, i64p]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.nvt_counter32_create.restype = ctypes.c_void_p
    lib.nvt_counter32_create.argtypes = [ctypes.c_int64]
    lib.nvt_counter32_update.restype = ctypes.c_int32
    lib.nvt_counter32_update.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64]
    lib.nvt_counter32_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.nvt_counter32_size.restype = ctypes.c_int64
    lib.nvt_counter32_size.argtypes = [ctypes.c_void_p]
    lib.nvt_counter32_extract.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.nvt_counter32_extract_sorted.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.nvt_counter32_drain_into.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.nvt_counter32_free.argtypes = [ctypes.c_void_p]
    lib.nvt_counter_free.argtypes = [ctypes.c_void_p]
    lib.nvt_pcounter_create.restype = ctypes.c_void_p
    lib.nvt_pcounter_create.argtypes = []
    lib.nvt_pcounter_update.restype = ctypes.c_int32
    lib.nvt_pcounter_update.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int64]
    lib.nvt_pcounter_add.restype = ctypes.c_int32
    lib.nvt_pcounter_add.argtypes = [ctypes.c_void_p, i64p, i64p, ctypes.c_int64]
    lib.nvt_pcounter_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.nvt_pcounter_size.restype = ctypes.c_int64
    lib.nvt_pcounter_size.argtypes = [ctypes.c_void_p]
    lib.nvt_pcounter_extract.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.nvt_pcounter_extract_sorted.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.nvt_counter32_drain_into_p.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.nvt_pcounter_drain_into.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.nvt_pcounter_free.argtypes = [ctypes.c_void_p]
    lib.nvt_cuckoo_build.restype = ctypes.c_int64
    lib.nvt_cuckoo_build.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.nvt_cont_pipe_f32.argtypes = [
        f32p, f32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_float,       # has_fill, fill
        ctypes.c_int32, ctypes.c_float,       # has_lo, lo
        ctypes.c_int32, ctypes.c_float,       # has_hi, hi
        ctypes.c_int32,                       # do_log1p
        ctypes.c_int32, ctypes.c_float, ctypes.c_float,  # has_norm, sub, div
    ]
    lib.nvt_cont_pipe_f64.argtypes = [
        f64p, f64p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double, ctypes.c_double,
    ]
    vp = ctypes.c_void_p
    for name in ("nvt_gather1", "nvt_gather4", "nvt_gather8"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [vp, i64p, vp, ctypes.c_int64]
    for name in ("nvt_gather_scatter1", "nvt_gather_scatter4", "nvt_gather_scatter8"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [vp, i64p, vp, i64p, ctypes.c_int64]
    for name in ("nvt_gather_multi1", "nvt_gather_multi4", "nvt_gather_multi8"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.POINTER(ctypes.c_void_p), i64p, vp, ctypes.c_int64]
    lib.nvt_permute_prep.restype = None
    lib.nvt_permute_prep.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), i64p,
    ]
    for name in ("nvt_permute_apply1", "nvt_permute_apply4", "nvt_permute_apply8"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), i64p,
            ctypes.POINTER(ctypes.c_int32), i64p, vp, vp, ctypes.c_int64,
        ]


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except RuntimeError:
        return False


class _ColumnTable:
    """One column's native hash table (int64 or string keys)."""

    @classmethod
    def from_arrays(cls, name: str, keys: "np.ndarray", codes: "np.ndarray"):
        """Build directly from vocab arrays (no parquet artifact) — used by
        the host transform fast path. `name` keys the cross-instance cache."""
        lib = _build_and_load()
        self = cls.__new__(cls)
        self.lib = lib
        self.start_index = None
        self.is_str = False
        handle = lib.nvt_cat_lookup(name.encode())
        if handle:
            self.handle = handle
            return self
        keys = np.ascontiguousarray(keys.astype(np.int64))
        codes = np.ascontiguousarray(codes.astype(np.int32))
        self.handle = lib.nvt_cat_create_i64(
            name.encode(),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(keys),
        )
        if not self.handle:
            raise RuntimeError(f"failed to build native table {name}")
        return self

    def __init__(self, path: str, start_index: int):
        import pyarrow.parquet as pq

        lib = _build_and_load()
        self.lib = lib
        self.start_index = start_index
        name = os.path.abspath(path).encode()
        handle = lib.nvt_cat_lookup(name)
        self.is_str = None
        if handle:
            self.handle = handle
            # key kind must be re-derived for encode dispatch
            tbl = pq.read_table(path)
            self.is_str = str(tbl.schema.field(0).type) in ("string", "large_string")
            return
        tbl = pq.read_table(path)
        col = tbl.column(0)
        values = col.to_numpy(zero_copy_only=False)
        codes = (np.arange(len(values)) + start_index).astype(np.int32)
        self.is_str = values.dtype.kind in ("O", "U", "S")
        if self.is_str:
            strs = [("" if v is None else str(v)).encode() for v in values]
            blob = b"".join(strs)
            offsets = np.zeros(len(strs) + 1, dtype=np.int64)
            np.cumsum([len(s) for s in strs], out=offsets[1:])
            self.handle = lib.nvt_cat_create_str(
                name, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(strs),
            )
        else:
            keys = np.ascontiguousarray(values.astype(np.int64))
            self.handle = lib.nvt_cat_create_i64(
                name,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(keys),
            )
        if not self.handle:
            raise RuntimeError(f"failed to build native table for {path}")

    def __del__(self):
        handle = getattr(self, "handle", None)
        if handle and self.lib is not None:
            try:
                self.lib.nvt_cat_release(handle)
            except Exception:
                pass

    def encode(self, values: np.ndarray, validity: Optional[np.ndarray],
               null_index: int = 1, oov_index: int = 2, offset: int = 0) -> np.ndarray:
        lib = self.lib
        n = len(values)
        out = np.empty(n, dtype=np.int32)
        valid_ptr = None
        if values.dtype.kind == "f":
            nan = np.isnan(values)
            validity = (~nan) if validity is None else (validity & ~nan)
        if validity is not None:
            v8 = np.ascontiguousarray(validity.astype(np.uint8))
            valid_ptr = v8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if self.is_str:
            # None and float-NaN (pandas object-column nulls) are both null
            nulls = [v is None or (isinstance(v, float) and v != v) for v in values]
            strs = [b"" if isnull else str(v).encode() for v, isnull in zip(values, nulls)]
            if validity is None and any(nulls):
                v8 = np.array([not x for x in nulls], dtype=np.uint8)
                valid_ptr = v8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            blob = b"".join(strs)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum([len(s) for s in strs], out=offsets[1:])
            lib.nvt_cat_encode_str(
                self.handle, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                valid_ptr, n, null_index, oov_index, offset,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        elif values.dtype == np.int32:
            # int32 values probe directly — skips a full astype(int64)
            # copy pass per column per batch (26 x 2 MB on the bench)
            vals = np.ascontiguousarray(values)
            lib.nvt_cat_encode_i32(
                self.handle,
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                valid_ptr, n, null_index, oov_index, offset,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        else:
            vals = np.ascontiguousarray(values.astype(np.int64))
            lib.nvt_cat_encode_i64(
                self.handle,
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                valid_ptr, n, null_index, oov_index, offset,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return out


class NativeCounter:
    """Streaming integer value counter (C++ open-addressing map) — the
    fit-time vocabulary-count hot loop. Single-writer; picklable as its
    extracted (keys, counts) arrays so multi-host fit_merge works.

    Dual width: int32-typed key streams count through 8-byte-entry tables
    (half the footprint of the int64 map — the scan is DRAM-latency
    bound, so the doubled cache-resident fraction is a direct speedup);
    the counter transparently PROMOTES itself to the 64-bit map when a
    count crosses 2^31, a later batch brings 64-bit keys, or a merge
    adds arbitrary (key, count) pairs. Counts stay exact throughout."""

    # Flat-table size past which an int32 counter migrates to the
    # radix-partitioned map (cpp PCounter32): at 256K used keys the open
    # table spans ~4MB — past per-core L2, into the random-access regime
    # that does not scale across threads (see the PCounter32 rationale).
    PARTITION_THRESHOLD = int(os.environ.get("NVT_PCOUNTER_THRESHOLD", 1 << 18))

    def __init__(self, initial_capacity: int = 1 << 14):
        self.lib = _build_and_load()
        self.handle = None  # 64-bit map (created on demand)
        self.handle32 = None  # 32-bit map (first int32 stream)
        self.phandle = None  # radix-partitioned int32 map (high cardinality)
        self._capacity_hint = int(initial_capacity)

    # -- internal ------------------------------------------------------
    def _ensure64(self) -> None:
        """Create the 64-bit map, draining the 32-bit/partitioned one."""
        if self.handle is not None:
            return
        cap = self._capacity_hint
        if self.handle32 is not None:
            cap = max(cap, int(self.lib.nvt_counter32_size(self.handle32)) * 10 // 7)
        if self.phandle is not None:
            cap = max(cap, int(self.lib.nvt_pcounter_size(self.phandle)) * 10 // 7)
        self.handle = self.lib.nvt_counter_create(cap)
        if self.handle32 is not None:
            self.lib.nvt_counter32_drain_into(self.handle, self.handle32)
            self.lib.nvt_counter32_free(self.handle32)
            self.handle32 = None
        if self.phandle is not None:
            self.lib.nvt_pcounter_drain_into(self.handle, self.phandle)
            self.lib.nvt_pcounter_free(self.phandle)
            self.phandle = None

    def _ensure_partitioned(self) -> None:
        """Migrate the flat 32-bit map into the partitioned one."""
        if self.phandle is not None or self.handle is not None:
            return
        self.phandle = self.lib.nvt_pcounter_create()
        if self._capacity_hint:
            self.lib.nvt_pcounter_reserve(self.phandle, self._capacity_hint)
        if self.handle32 is not None:
            self.lib.nvt_counter32_drain_into_p(self.phandle, self.handle32)
            self.lib.nvt_counter32_free(self.handle32)
            self.handle32 = None

    def update(self, values: np.ndarray) -> None:
        int32_typed = values.dtype.kind == "i" and values.dtype.itemsize <= 4
        if self.phandle is not None and self.handle is None:
            if int32_typed:
                vals = np.ascontiguousarray(values, dtype=np.int32)
                promote = self.lib.nvt_pcounter_update(
                    self.phandle,
                    vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    len(vals),
                )
                if promote:  # a count crossed 2^31 — continue in 64-bit
                    self._ensure64()
                return
            self._ensure64()  # 64-bit keys arrived: leave the int32 maps
        if self.handle is None and int32_typed:
            vals = np.ascontiguousarray(values, dtype=np.int32)
            if self.handle32 is None:
                self.handle32 = self.lib.nvt_counter32_create(self._capacity_hint)
            promote = self.lib.nvt_counter32_update(
                self.handle32,
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(vals),
            )
            if promote:  # a count crossed 2^31 — continue in 64-bit
                self._ensure64()
            elif (
                self.PARTITION_THRESHOLD
                and int(self.lib.nvt_counter32_size(self.handle32))
                > self.PARTITION_THRESHOLD
            ):
                self._ensure_partitioned()
            return
        self._ensure64()
        # int32 (and narrower signed) inputs go through the int32 entry
        # point: the C++ side sign-extends in-register, skipping the
        # int64 numpy copy per column batch
        if values.dtype.kind == "i" and values.dtype.itemsize <= 4:
            vals = np.ascontiguousarray(values, dtype=np.int32)
            self.lib.nvt_counter_update32(
                self.handle,
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(vals),
            )
            return
        vals = np.ascontiguousarray(values, dtype=np.int64)
        self.lib.nvt_counter_update(
            self.handle, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(vals)
        )

    def reserve(self, n: int) -> None:
        """Pre-size for ~n distinct keys (one rehash instead of a ladder).

        A hint past the partition threshold migrates an int32 stream to
        the partitioned map immediately — the extrapolated cardinality
        says the flat table is about to outgrow L2 anyway."""
        self._capacity_hint = max(self._capacity_hint, int(n))
        if (
            self.PARTITION_THRESHOLD
            and self.handle is None
            and self.phandle is None
            and self.handle32 is not None
            and int(n) > self.PARTITION_THRESHOLD
        ):
            self._ensure_partitioned()
        if self.phandle is not None:
            self.lib.nvt_pcounter_reserve(self.phandle, int(n))
        if self.handle32 is not None:
            self.lib.nvt_counter32_reserve(self.handle32, int(n))
        if self.handle is not None:
            self.lib.nvt_counter_reserve(self.handle, int(n))

    def add(self, keys: np.ndarray, counts: np.ndarray) -> None:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        counts = np.ascontiguousarray(counts, dtype=np.int64)
        if (
            self.phandle is not None
            and self.handle is None
            and (len(keys) == 0 or (
                keys.min() >= -(2**31) and keys.max() < 2**31
                and counts.max(initial=0) < 2**31
            ))
        ):
            promote = self.lib.nvt_pcounter_add(
                self.phandle,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(keys),
            )
            if promote:
                self._ensure64()
            return
        self._ensure64()  # merge pairs carry arbitrary keys/counts
        self.lib.nvt_counter_add(
            self.handle,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(keys),
        )

    def _size(self) -> int:
        if self.handle is not None:
            return int(self.lib.nvt_counter_size(self.handle))
        if self.phandle is not None:
            return int(self.lib.nvt_pcounter_size(self.phandle))
        if self.handle32 is not None:
            return int(self.lib.nvt_counter32_size(self.handle32))
        return 0

    def _extract_via(self, fn64, fn32, fnp):
        n = self._size()
        keys = np.empty(n, dtype=np.int64)
        counts = np.empty(n, dtype=np.int64)
        if n:
            kp = keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
            cp = counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
            if self.handle is not None:
                fn64(self.handle, kp, cp)
            elif self.phandle is not None:
                fnp(self.phandle, kp, cp)
            else:
                fn32(self.handle32, kp, cp)
        return keys, counts

    def extract(self):
        stash = getattr(self, "_stash", None)
        if stash is not None:
            return stash
        if self.handle is None and self.handle32 is None and self.phandle is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return self._extract_via(
            self.lib.nvt_counter_extract,
            self.lib.nvt_counter32_extract,
            self.lib.nvt_pcounter_extract,
        )

    def extract_sorted(self):
        """(keys, counts) in vocabulary order — count desc, key asc — via
        one GIL-released C++ sort (replaces extract + np.lexsort in
        Categorify.fit_finalize)."""
        stash = getattr(self, "_stash", None)
        if stash is not None:
            keys, counts = stash
            order = np.lexsort((keys, -counts))
            return keys[order], counts[order]
        if self.handle is None and self.handle32 is None and self.phandle is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return self._extract_via(
            self.lib.nvt_counter_extract_sorted,
            self.lib.nvt_counter32_extract_sorted,
            self.lib.nvt_pcounter_extract_sorted,
        )

    def __getstate__(self):
        keys, counts = self.extract()
        return {"keys": keys, "counts": counts}

    def __setstate__(self, state):
        # a host WITHOUT the native toolchain must still be able to receive
        # a pickled counter from a peer during multi-host fit_merge — fall
        # back to carrying the arrays (extract() serves them to the merge)
        self.handle = None
        self.handle32 = None
        self.phandle = None
        self._capacity_hint = max(len(state["keys"]) * 2, 1024)
        try:
            self.lib = _build_and_load()
        except RuntimeError:
            self.lib = None
            self._stash = (np.asarray(state["keys"]), np.asarray(state["counts"]))
            return
        if len(state["keys"]):
            self.add(state["keys"], state["counts"])

    def __del__(self):
        lib = getattr(self, "lib", None)
        if lib is None:
            return
        try:
            if getattr(self, "handle", None):
                lib.nvt_counter_free(self.handle)
            if getattr(self, "handle32", None):
                lib.nvt_counter32_free(self.handle32)
            if getattr(self, "phandle", None):
                lib.nvt_pcounter_free(self.phandle)
        except Exception:
            pass


class CategorifyTransform:
    """Native eager Categorify: dict-of-numpy in, dict-of-numpy out.

    Restrictions mirror the reference C++ kernel (categorify.py:603-605):
    single OOV bucket, no combo encoding.
    """

    def __init__(self, categories: Dict[str, str], num_buckets: int = 1,
                 start_index: int = 3, offsets: Optional[Dict[str, int]] = None):
        if num_buckets not in (None, 1):
            raise ValueError("native CategorifyTransform supports a single OOV bucket")
        self.tables = {
            key: _ColumnTable(path, start_index) for key, path in categories.items()
        }
        self.offsets = offsets or {}

    def transform(self, col_selector, tensors: Dict[str, Any]) -> Dict[str, Any]:
        names = getattr(col_selector, "names", col_selector)
        out = dict(tensors)
        for name in names:
            table = self.tables.get(name)
            if table is None:
                continue
            values = np.asarray(tensors[name])
            out[name] = table.encode(values, None, offset=self.offsets.get(name, 0))
        return out


class FillTransform:
    """Native eager NaN fill (float32/float64; ints pass through)."""

    def __init__(self, fill_val: float = 0.0):
        self.lib = _build_and_load()
        self.fill_val = float(fill_val)

    def transform(self, col_selector, tensors: Dict[str, Any]) -> Dict[str, Any]:
        names = getattr(col_selector, "names", col_selector)
        out = dict(tensors)
        for name in names:
            values = np.asarray(tensors[name])
            if values.dtype == np.float32:
                vals = np.ascontiguousarray(values.copy())
                self.lib.nvt_fill_f32(
                    vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(vals), self.fill_val,
                )
                out[name] = vals
            elif values.dtype == np.float64:
                vals = np.ascontiguousarray(values.copy())
                self.lib.nvt_fill_f64(
                    vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    len(vals), self.fill_val,
                )
                out[name] = vals
        return out


_GATHER_BY_ITEMSIZE = {1: "nvt_gather1", 4: "nvt_gather4", 8: "nvt_gather8"}


def take_rows(values: "np.ndarray", indices: "np.ndarray") -> Optional["np.ndarray"]:
    """GIL-releasing row gather (shuffle permutations): out[i] =
    values[indices[i]]. Returns None when the native library or the dtype's
    itemsize is unsupported — caller falls back to numpy fancy indexing.
    Indices must already be in range (callers pass permutations)."""
    import ctypes as ct

    if values.dtype.kind not in "iufb":  # NEVER object/str: refcounted ptrs
        return None
    name = _GATHER_BY_ITEMSIZE.get(values.dtype.itemsize)
    if name is None or values.ndim != 1:
        return None
    try:
        lib = _build_and_load()
    except RuntimeError:
        return None
    arr = np.ascontiguousarray(values)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty(len(idx), dtype=arr.dtype)
    getattr(lib, name)(
        arr.ctypes.data_as(ct.c_void_p),
        idx.ctypes.data_as(ct.POINTER(ct.c_int64)),
        out.ctypes.data_as(ct.c_void_p),
        len(idx),
    )
    return out


_GATHER_SCATTER_BY_ITEMSIZE = {
    1: "nvt_gather_scatter1",
    4: "nvt_gather_scatter4",
    8: "nvt_gather_scatter8",
}


def gather_scatter(
    values: "np.ndarray", indices: "np.ndarray", out: "np.ndarray", positions: "np.ndarray"
) -> bool:
    """GIL-releasing fused gather-scatter: out[positions[i]] =
    values[indices[i]]. Returns False when unsupported (caller falls back
    to numpy). Indices/positions must be in range."""
    import ctypes as ct

    if values.dtype.kind not in "iufb" or values.dtype != out.dtype:
        return False
    name = _GATHER_SCATTER_BY_ITEMSIZE.get(values.dtype.itemsize)
    if name is None or values.ndim != 1 or out.ndim != 1:
        return False
    try:
        lib = _build_and_load()
    except RuntimeError:
        return False
    arr = np.ascontiguousarray(values)
    if not out.flags["C_CONTIGUOUS"]:
        return False
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    getattr(lib, name)(
        arr.ctypes.data_as(ct.c_void_p),
        idx.ctypes.data_as(ct.POINTER(ct.c_int64)),
        out.ctypes.data_as(ct.c_void_p),
        pos.ctypes.data_as(ct.POINTER(ct.c_int64)),
        len(idx),
    )
    return True


_GATHER_MULTI_BY_ITEMSIZE = {
    1: "nvt_gather_multi1",
    4: "nvt_gather_multi4",
    8: "nvt_gather_multi8",
}

_PERMUTE_APPLY_BY_ITEMSIZE = {
    1: "nvt_permute_apply1",
    4: "nvt_permute_apply4",
    8: "nvt_permute_apply8",
}

# bucket dest range = 2^shift rows; 16K rows × 8B = 128KB stays L2-resident
_PERMUTE_BUCKET_SHIFT = 14


class PermutePlan:
    """Shared two-pass permutation plan for one shuffle window: built once
    from the destination positions (in source order), applied to every
    column. ``apply`` runs the bucketed two-pass permute — all memory access
    streaming or cache-local — at ~5-10x the one-pass random gather/scatter
    rate. Returns None from ``build`` when the native library is missing."""

    __slots__ = ("n", "dest_slot", "dpos", "lib", "_scratch")

    @classmethod
    def build(cls, positions: "np.ndarray"):
        import ctypes as ct

        try:
            lib = _build_and_load()
        except RuntimeError:
            return None
        self = cls()
        pos = np.ascontiguousarray(positions, dtype=np.int64)
        n = len(pos)
        self.n = n
        self.lib = lib
        self.dest_slot = np.empty(n, dtype=np.int32)
        self.dpos = np.empty(n, dtype=np.int64)
        self._scratch = {}
        if n:
            lib.nvt_permute_prep(
                pos.ctypes.data_as(ct.POINTER(ct.c_int64)),
                n,
                _PERMUTE_BUCKET_SHIFT,
                self.dest_slot.ctypes.data_as(ct.POINTER(ct.c_int32)),
                self.dpos.ctypes.data_as(ct.POINTER(ct.c_int64)),
            )
        return self

    def apply(self, sources, packed_src: "np.ndarray", out: "np.ndarray") -> bool:
        """out[dpos] = sources[packed_src >> 48][packed_src & mask], where
        packed_src is in SOURCE order (parallel to the positions the plan
        was built from). Falls back (returns False) on unsupported dtypes."""
        import ctypes as ct

        dt = out.dtype
        name = _PERMUTE_APPLY_BY_ITEMSIZE.get(dt.itemsize)
        if (
            name is None
            or dt.kind not in "iufb"
            or out.ndim != 1
            or not out.flags["C_CONTIGUOUS"]
        ):
            return False
        for s in sources:
            if s.dtype != dt or s.ndim != 1 or not s.flags["C_CONTIGUOUS"]:
                return False
        if self.n == 0:
            return True
        scratch = self._scratch.get(dt.itemsize)
        if scratch is None or len(scratch) < self.n * dt.itemsize:
            scratch = np.empty(self.n * dt.itemsize, dtype=np.uint8)
            self._scratch[dt.itemsize] = scratch
        g = np.ascontiguousarray(packed_src, dtype=np.int64)
        ptrs = (ct.c_void_p * len(sources))(
            *(s.ctypes.data_as(ct.c_void_p).value for s in sources)
        )
        getattr(self.lib, name)(
            ptrs,
            g.ctypes.data_as(ct.POINTER(ct.c_int64)),
            self.dest_slot.ctypes.data_as(ct.POINTER(ct.c_int32)),
            self.dpos.ctypes.data_as(ct.POINTER(ct.c_int64)),
            scratch.ctypes.data_as(ct.c_void_p),
            out.ctypes.data_as(ct.c_void_p),
            self.n,
        )
        return True

GATHER_MULTI_ROW_BITS = 48  # g[i] = (piece << 48) | row


def gather_multi(sources, packed_idx: "np.ndarray", out: "np.ndarray") -> bool:
    """GIL-releasing multi-source gather: out[i] = sources[p][r] where
    p = packed_idx[i] >> 48 and r = packed_idx[i] & (2**48 - 1). The inverse
    formulation of ``gather_scatter`` — random READS instead of random
    writes — used by the shuffled parquet writer's flush. Returns False when
    unsupported (caller falls back to numpy)."""
    import ctypes as ct

    if not sources or out.ndim != 1:
        return False
    dt = out.dtype
    if dt.kind not in "iufb":
        return False
    name = _GATHER_MULTI_BY_ITEMSIZE.get(dt.itemsize)
    if name is None:
        return False
    for s in sources:
        if s.dtype != dt or s.ndim != 1 or not s.flags["C_CONTIGUOUS"]:
            return False
    if not out.flags["C_CONTIGUOUS"]:
        return False
    try:
        lib = _build_and_load()
    except RuntimeError:
        return False
    g = np.ascontiguousarray(packed_idx, dtype=np.int64)
    ptrs = (ct.c_void_p * len(sources))(
        *(s.ctypes.data_as(ct.c_void_p).value for s in sources)
    )
    getattr(lib, name)(
        ptrs,
        g.ctypes.data_as(ct.POINTER(ct.c_int64)),
        out.ctypes.data_as(ct.c_void_p),
        len(g),
    )
    return True


def cont_pipe(
    values: "np.ndarray",
    fill: Optional[float] = None,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    log1p: bool = False,
    sub: Optional[float] = None,
    div: Optional[float] = None,
) -> "np.ndarray":
    """One fused memory pass over a float column: NaN-fill -> clip ->
    log1p -> (v - sub) / div, each stage optional. The C call releases the
    GIL, so the hetero host worker thread overlaps with device dispatch.
    Stage math mirrors the Python ops exactly (same expressions, same float
    rounding); see dag/host_fuse.py for the chain extraction.
    """
    lib = _build_and_load()
    arr = np.ascontiguousarray(values)
    out = np.empty_like(arr)
    if arr.dtype == np.float32:
        fn, ptr = lib.nvt_cont_pipe_f32, ctypes.POINTER(ctypes.c_float)
    elif arr.dtype == np.float64:
        fn, ptr = lib.nvt_cont_pipe_f64, ctypes.POINTER(ctypes.c_double)
    else:
        raise TypeError(f"cont_pipe needs float32/float64, got {arr.dtype}")
    fn(
        arr.ctypes.data_as(ptr), out.ctypes.data_as(ptr), arr.size,
        int(fill is not None), float(fill or 0.0),
        int(lo is not None), float(lo if lo is not None else 0.0),
        int(hi is not None), float(hi if hi is not None else 0.0),
        int(bool(log1p)),
        int(div is not None), float(sub if sub is not None else 0.0),
        float(div if div is not None else 1.0),
    )
    return out


_MOMENTS_FNS = {
    "f4": ("nvt_moments_f32", ctypes.c_float),
    "f8": ("nvt_moments_f64", ctypes.c_double),
    "i4": ("nvt_moments_i32", ctypes.c_int32),
    "i8": ("nvt_moments_i64", ctypes.c_int64),
}


def moments_pass(values: "np.ndarray", validity: Optional["np.ndarray"]):
    """ONE fused, GIL-releasing pass computing a flat numeric column's
    streaming-moments contribution: (count, sum, sumsq, min, max, nulls),
    NaN treated as null (Column.is_null semantics), float64 accumulation.
    Returns None when the dtype has no native kernel (caller falls back to
    the numpy formulation). Replaces ~10 numpy passes + float64 temps per
    column per batch in the fit scan (see cpp nvt_moments_*)."""
    spec = _MOMENTS_FNS.get(f"{values.dtype.kind}{values.dtype.itemsize}")
    if spec is None:
        return None
    try:
        lib = _build_and_load()
    except RuntimeError:
        return None
    name, ctype = spec
    arr = np.ascontiguousarray(values)
    out = np.empty(6, dtype=np.float64)
    vptr = None
    if validity is not None:
        v = np.ascontiguousarray(validity, dtype=np.uint8)
        vptr = v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    getattr(lib, name)(
        arr.ctypes.data_as(ctypes.POINTER(ctype)),
        vptr,
        arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
