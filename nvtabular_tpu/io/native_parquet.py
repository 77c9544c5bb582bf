"""Native parquet writer bridge (cpp/nvt_parquet.cc via ctypes).

The shuffled-write stream is CPU-bound on the parquet encode (arrow's
single-threaded encoder measured 2.0M rows/s on the 40-column Criteo
output profile; the separate shuffle-permute landing pass cost another
0.35 us/row). This module routes the hot path through a purpose-built
C++ encoder that fuses the shuffle window's gather into the encode and
writes DELTA_BINARY_PACKED / BYTE_STREAM_SPLIT pages directly.

Split of responsibilities:
  * C++ (hot): gather + encode + zstd + page headers, appended to the file.
  * Python (cold): thrift compact-protocol ``FileMetaData`` footer, written
    once at close. Output is standard parquet, readable by pyarrow — the
    round-trip is asserted in tests/unit/io/test_native_parquet.py.

Scope: flat REQUIRED (non-null) int32/int64/float32/float64 columns — the
shape of every encoded ETL output. Anything else (lists, strings, nulls)
falls back to the arrow writer in io/writer.py.

Reference counterpart: cudf's GPU parquet encode behind ``to_parquet``
(reference bench/examples/MultiGPUBench.md "Output-File Count").
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPP = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "cpp", "nvt_parquet.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None

# parquet.thrift enums
_TYPE = {"int32": 1, "int64": 2, "float32": 4, "float64": 5}
_DTYPE_CODE = {"int32": 0, "int64": 1, "float32": 2, "float64": 3}
_IN_DTYPE = {
    0: np.dtype(np.int32),
    1: np.dtype(np.int64),
    2: np.dtype(np.float32),
    3: np.dtype(np.float64),
}
ENC_PLAIN = 0
ENC_DELTA = 5
ENC_BYTE_STREAM_SPLIT = 9
CODEC_UNCOMPRESSED = 0
CODEC_ZSTD = 6


class NvtpqOp(ctypes.Structure):
    """ctypes mirror of cpp/nvt_parquet.cc::NvtpqOp — a per-column fused
    transform (cat probe / cont pipe) applied between the shuffle gather and
    the page encode. ``fn`` is the raw address of the SERVING library's
    kernel (nvt_cat_encode_* / nvt_cont_pipe_*), so the fused write's output
    is bit-identical to the two-phase host transform."""

    _fields_ = [
        ("kind", ctypes.c_int32),      # 0=none 1=cat 2=cont
        ("in_dtype", ctypes.c_int32),  # 0=i32 1=i64 2=f32 3=f64 (raw source)
        ("fn", ctypes.c_void_p),
        ("table", ctypes.c_void_p),
        ("null_index", ctypes.c_int32),
        ("oov_index", ctypes.c_int32),
        ("offset", ctypes.c_int32),
        ("has_fill", ctypes.c_int32),
        ("fill", ctypes.c_double),
        ("lo", ctypes.c_double),
        ("hi", ctypes.c_double),
        ("sub", ctypes.c_double),
        ("div", ctypes.c_double),
        ("has_lo", ctypes.c_int32),
        ("has_hi", ctypes.c_int32),
        ("do_log", ctypes.c_int32),
        ("has_norm", ctypes.c_int32),
    ]


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
            flags = ["-O3", "-march=native", "-std=c++17"]
            tag = hashlib.sha256(src + " ".join(flags).encode()).hexdigest()[:16]
            cache_dir = os.environ.get(
                "NVT_TPU_NATIVE_CACHE",
                os.path.join(os.path.expanduser("~"), ".cache", "nvtabular_tpu"),
            )
            os.makedirs(cache_dir, exist_ok=True)
            so_path = os.path.join(cache_dir, f"libnvt_parquet_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                cmd = ["g++", *flags, "-shared", "-fPIC", _CPP, "-o", tmp, "-lzstd"]
                try:
                    subprocess.run(cmd, check=True, capture_output=True)
                except subprocess.CalledProcessError:
                    cmd = [c for c in cmd if c != "-march=native"]
                    subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
        except Exception as e:  # g++/zstd missing, compile error
            _LIB_ERR = f"native parquet writer unavailable: {e}"
            raise RuntimeError(_LIB_ERR) from e
        lib.nvtpq_open.argtypes = [ctypes.c_char_p]
        lib.nvtpq_open.restype = ctypes.c_void_p
        lib.nvtpq_write_column.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int,
            ctypes.c_void_p,  # gidx (int64*) or None
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.nvtpq_write_column.restype = ctypes.c_int
        lib.nvtpq_write_column_op.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int,
            ctypes.c_void_p,  # gidx (int64*) or None
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,  # NvtpqOp* or None
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.nvtpq_write_column_op.restype = ctypes.c_int
        lib.nvtpq_tell.argtypes = [ctypes.c_void_p]
        lib.nvtpq_tell.restype = ctypes.c_longlong
        lib.nvtpq_build_window_index.argtypes = [
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_ulonglong),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_ulonglong,
            ctypes.c_void_p,  # gidx out (int64*)
        ]
        lib.nvtpq_build_window_index.restype = ctypes.c_longlong
        lib.nvtpq_close.argtypes = [ctypes.c_void_p]
        lib.nvtpq_close.restype = ctypes.c_int
        lib.nvtpq_op_sizeof.restype = ctypes.c_longlong
        csize = int(lib.nvtpq_op_sizeof())
        if csize != ctypes.sizeof(NvtpqOp):  # pragma: no cover - build skew
            _LIB_ERR = (
                f"NvtpqOp layout skew: C sizeof {csize} != ctypes "
                f"{ctypes.sizeof(NvtpqOp)} — rebuild or fix the mirror"
            )
            raise RuntimeError(_LIB_ERR)
        _LIB = lib
        return lib


def native_parquet_available() -> bool:
    if os.environ.get("NVT_NATIVE_PARQUET", "1") == "0":
        return False
    try:
        _build_and_load()
        return True
    except RuntimeError:
        return False


# --------------------------------------------------------------------------
# Thrift compact-protocol writer — only what FileMetaData needs.
# Types: I32=5, I64=6, BINARY=8, LIST=9, STRUCT=12.
class _Compact:
    __slots__ = ("b", "_last", "_stack")

    def __init__(self):
        self.b = bytearray()
        self._last = 0
        self._stack: List[int] = []

    def _uleb(self, v: int):
        while v >= 0x80:
            self.b.append((v & 0x7F) | 0x80)
            v >>= 7
        self.b.append(v)

    def _zz(self, v: int):
        self._uleb(((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))

    def _header(self, fid: int, ttype: int):
        delta = fid - self._last
        if 1 <= delta <= 15:
            self.b.append((delta << 4) | ttype)
        else:
            self.b.append(ttype)
            self._zz(fid)
        self._last = fid

    def i32(self, fid: int, v: int):
        self._header(fid, 5)
        self._zz(v)

    def i64(self, fid: int, v: int):
        self._header(fid, 6)
        self._zz(v)

    def binary(self, fid: int, v: bytes):
        self._header(fid, 8)
        self._uleb(len(v))
        self.b += v

    def begin_struct(self, fid: int):
        self._header(fid, 12)
        self._stack.append(self._last)
        self._last = 0

    def end_struct(self):
        self.b.append(0)
        self._last = self._stack.pop()

    def list_header(self, fid: int, size: int, elem_type: int):
        self._header(fid, 9)
        if size < 15:
            self.b.append((size << 4) | elem_type)
        else:
            self.b.append(0xF0 | elem_type)
            self._uleb(size)

    def list_i32(self, fid: int, values: Sequence[int]):
        self.list_header(fid, len(values), 5)
        for v in values:
            self._zz(v)

    def list_binary(self, fid: int, values: Sequence[bytes]):
        self.list_header(fid, len(values), 8)
        for v in values:
            self._uleb(len(v))
            self.b += v

    # list elements that are structs reset the field-id context themselves
    def struct_elem(self):
        self._stack.append(self._last)
        self._last = 0


class _ChunkMeta:
    __slots__ = ("page_offset", "comp", "uncomp", "num_values", "encoding", "codec")

    def __init__(self, page_offset, comp, uncomp, num_values, encoding, codec):
        self.page_offset = page_offset
        self.comp = comp
        self.uncomp = uncomp
        self.num_values = num_values
        self.encoding = encoding
        self.codec = codec


def default_column_plan(name: str, dtype: np.dtype) -> Tuple[int, int, int]:
    """(encoding, codec, level) for one column under the 'auto' policy:
    ints ship DELTA_BINARY_PACKED uncompressed (zstd over the delta stream
    costs ~15% encode rate for ~0.5 B/row — bench/write_codec_probe.py),
    floats BYTE_STREAM_SPLIT + zstd. NVT_PARQUET_ENCODINGS=0 selects
    PLAIN + zstd everywhere (parity escape hatch, matches io/writer.py).

    NVT_PARQUET_FLOAT_CODEC=none drops the float zstd pass — the single
    largest CPU block of the write stream (measured 0.13 us-core/row to
    save ~20 B/row; the e2e stream runs ~20% faster without it). Floats
    then ship PLAIN, not BYTE_STREAM_SPLIT: with no codec downstream the
    transpose buys nothing and costs a pass. Right when storage outruns
    the cores (tmpfs/NVMe); the zstd default wins on slow disks."""
    level = int(os.environ.get("NVT_PARQUET_ZSTD_LEVEL", 1))
    if os.environ.get("NVT_PARQUET_ENCODINGS", "1") == "0":
        return ENC_PLAIN, CODEC_ZSTD, level
    kind = np.dtype(dtype).kind
    if kind in "iu":
        return ENC_DELTA, CODEC_UNCOMPRESSED, 0
    if os.environ.get("NVT_PARQUET_FLOAT_CODEC", "zstd") == "none":
        return ENC_PLAIN, CODEC_UNCOMPRESSED, 0
    return ENC_BYTE_STREAM_SPLIT, CODEC_ZSTD, level


class NativeParquetFile:
    """One output parquet file: C++ appends pages, Python writes the footer.

    ``write_row_group(columns, gidx, num_rows)`` takes, per column, a list
    of source arrays (window pieces); ``gidx`` packs (piece << 48) | row in
    destination order and is shared by every column, so the shuffle
    permutation is applied once per window inside the encode itself.
    """

    def __init__(self, path: str, schema: List[Tuple[str, np.dtype]],
                 plan=None):
        self._lib = _build_and_load()
        self.path = path
        self.schema = [(n, np.dtype(d)) for n, d in schema]
        for name, dt in self.schema:
            if dt.name not in _DTYPE_CODE:
                raise ValueError(f"unsupported dtype for native parquet: {name}: {dt}")
        self._plan = [
            (plan or default_column_plan)(n, d) for n, d in self.schema
        ]
        self._h = self._lib.nvtpq_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")
        self._row_groups: List[Tuple[int, List[_ChunkMeta]]] = []
        self._num_rows = 0
        self._closed = False

    def write_row_group(
        self,
        columns: Sequence[Sequence[np.ndarray]],
        gidx: Optional[np.ndarray],
        num_rows: int,
        ops: Optional[Sequence[Optional[NvtpqOp]]] = None,
    ):
        """columns[i] = list of contiguous source arrays for schema column i.

        ``ops[i]`` (optional) is an NvtpqOp fused transform: the sources are
        then the RAW input arrays (dtype = op.in_dtype) and the schema dtype
        describes the op's OUTPUT (the encoded page)."""
        if num_rows == 0:
            return
        if gidx is not None:
            gidx = np.ascontiguousarray(gidx, dtype=np.int64)
            gptr = gidx.ctypes.data_as(ctypes.c_void_p)
        else:
            gptr = None
        metas: List[_ChunkMeta] = []
        out = (ctypes.c_longlong * 4)()
        for i, ((name, dt), (enc, codec, level), pieces) in enumerate(
            zip(self.schema, self._plan, columns)
        ):
            op = ops[i] if ops is not None else None
            pieces = [np.ascontiguousarray(p) for p in pieces]
            expect = dt if op is None or op.kind == 0 else _IN_DTYPE[op.in_dtype]
            for p in pieces:
                if p.dtype != expect:
                    raise ValueError(f"{name}: piece dtype {p.dtype} != {expect}")
            srcs = (ctypes.c_void_p * len(pieces))(
                *[p.ctypes.data_as(ctypes.c_void_p).value for p in pieces]
            )
            if op is None:
                rc = self._lib.nvtpq_write_column(
                    self._h, srcs, len(pieces), gptr, num_rows,
                    _DTYPE_CODE[dt.name], enc, codec, level, out,
                )
            else:
                rc = self._lib.nvtpq_write_column_op(
                    self._h, srcs, len(pieces), gptr, num_rows,
                    _DTYPE_CODE[dt.name], enc, codec, level,
                    ctypes.byref(op), out,
                )
            if rc != 0:
                raise OSError(f"native parquet write failed (rc={rc}) on {name}")
            metas.append(
                _ChunkMeta(out[0], out[1], out[2], num_rows, enc, codec)
            )
        self._row_groups.append((num_rows, metas))
        self._num_rows += num_rows

    def close(self):
        if self._closed:
            return
        self._closed = True
        rc = self._lib.nvtpq_close(self._h)
        self._h = None
        if rc != 0:
            raise OSError(f"close failed on {self.path}")
        footer = self._footer()
        with open(self.path, "ab") as f:
            f.write(footer)
            f.write(struct.pack("<I", len(footer)))
            f.write(b"PAR1")

    def __del__(self):
        if getattr(self, "_h", None) is not None and not self._closed:
            try:
                self._lib.nvtpq_close(self._h)
            except Exception:
                pass

    # ------------------------------------------------------------- footer
    def _footer(self) -> bytes:
        t = _Compact()
        t.i32(1, 2)  # version
        # schema: root element + one leaf per column
        t.list_header(2, 1 + len(self.schema), 12)
        t.struct_elem()
        t.binary(4, b"schema")
        t.i32(5, len(self.schema))  # num_children
        t.end_struct()
        for name, dt in self.schema:
            t.struct_elem()
            t.i32(1, _TYPE[dt.name])  # type
            t.i32(3, 0)  # repetition_type = REQUIRED
            t.binary(4, name.encode())
            t.end_struct()
        t.i64(3, self._num_rows)
        # row groups
        t.list_header(4, len(self._row_groups), 12)
        for num_rows, metas in self._row_groups:
            t.struct_elem()
            t.list_header(1, len(metas), 12)  # columns
            for (name, dt), m in zip(self.schema, metas):
                t.struct_elem()  # ColumnChunk
                t.i64(2, m.page_offset)  # file_offset
                t.begin_struct(3)  # meta_data
                t.i32(1, _TYPE[dt.name])
                t.list_i32(2, [m.encoding])
                t.list_binary(3, [name.encode()])
                t.i32(4, m.codec)
                t.i64(5, m.num_values)
                t.i64(6, m.uncomp)
                t.i64(7, m.comp)
                t.i64(9, m.page_offset)  # data_page_offset
                t.end_struct()
                t.end_struct()
            t.i64(2, sum(m.comp for m in metas))  # total_byte_size
            t.i64(3, num_rows)
            t.end_struct()
        t.binary(6, b"nvtabular_tpu")
        t.b.append(0)  # end FileMetaData struct
        return bytes(t.b)


def build_window_index(
    piece_rows: Sequence[int], piece_seeds: Sequence[int], nfiles: int,
    file_k: int, shuffle_seed: int,
) -> np.ndarray:
    """This file's shuffled destination-order gather index for a window of
    whole pieces, built GIL-free in C++ (cpp/nvt_parquet.cc
    nvtpq_build_window_index). Entries pack (piece << 48) | row."""
    lib = _build_and_load()
    npieces = len(piece_rows)
    rows = (ctypes.c_longlong * npieces)(*[int(r) for r in piece_rows])
    seeds = (ctypes.c_ulonglong * npieces)(*[int(s) & (2**64 - 1) for s in piece_seeds])
    gidx = np.empty(int(sum(piece_rows)), dtype=np.int64)
    cnt = lib.nvtpq_build_window_index(
        rows, seeds, npieces, int(nfiles), int(file_k),
        int(shuffle_seed) & (2**64 - 1),
        gidx.ctypes.data_as(ctypes.c_void_p),
    )
    return gidx[: int(cnt)]


def hash_split(seed: int, n: int, nfiles: int) -> np.ndarray:
    """File assignment (0..nfiles-1) for each of n rows under the streamed
    shuffle's hash split — the arrow fallback's numpy twin of the C++
    predicate in nvtpq_build_window_index (Fibonacci multiply-shift with a
    32x32 range map). MUST stay bit-identical to the C++ side
    (test_native_parquet.py asserts it): a window whose files straddle the
    native/arrow writers would otherwise drop or duplicate rows."""
    with np.errstate(over="ignore"):
        h = (
            np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) ^ np.uint64(int(seed) & (2**64 - 1))
        return (((h >> np.uint64(32)) * np.uint64(nfiles)) >> np.uint64(32)).astype(
            np.int64
        )


def pack_gather_index(piece_indices: Sequence[np.ndarray], perm: np.ndarray) -> np.ndarray:
    """Build the destination-order gather index for a shuffle window.

    ``piece_indices[k]`` selects this file's rows of piece k (or None for
    all rows); ``perm[i]`` is the destination position of source element i
    (concatenated piece order) — the writer's existing permute contract."""
    gsrc = np.concatenate(
        [
            (np.int64(k) << np.int64(48)) | np.asarray(idx, dtype=np.int64)
            for k, idx in enumerate(piece_indices)
        ]
    )
    gidx = np.empty_like(gsrc)
    gidx[perm] = gsrc
    return gidx
