"""Shuffled multi-file parquet writer.

Analog of the reference's write-time shuffle (`Shuffle.PER_PARTITION` /
`PER_WORKER` appends to N files per worker — reference behavior documented at
bench/examples/MultiGPUBench.md "Shuffling"/"Output-File Count", exercised at
tests/unit/test_dask_nvt.py:105-112).

Design: ONE worker thread per output file, fed by a bounded queue. Each
incoming partition is split by a fresh random permutation into one piece per
file; the per-file worker gathers its piece (native GIL-releasing take),
locally buffers a few pieces, permutes the small concat, and appends it as a
row group. So the shuffle window spans `buffer_partitions` input partitions
(same window as the reference's worker buffer) while the permute, arrow
conversion, and parquet encode of ALL files run concurrently with the
producer's transform of the NEXT partition — the write phase was previously
serialized behind a whole-window concat (measured 5.1 s of an 8.4 s write
phase at 4M rows).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import numpy as np

from ..table import TableBatch, concat_rows
from .shuffle import Shuffle

_SENTINEL = object()

_NATIVE_DTYPES = {"int32", "int64", "float32", "float64"}
# include the C-alias dtypes (np.intc/np.longlong and unsigned-free friends)
# whose type NUM differs from the canonical int32/int64 even though the name
# matches — a window mixing 'l' and 'q' int64 arrays must not trip the
# mid-stream schema check
_NATIVE_DTYPE_NUMS = frozenset(
    np.dtype(t).num
    for t in (np.int32, np.int64, np.float32, np.float64, np.intc, np.longlong)
    if np.dtype(t).name in _NATIVE_DTYPES
)


def _native_plan(compression):
    """Per-column (encoding, codec, level) plan for the native writer, or
    None when the requested codec needs the arrow path (e.g. snappy).
    ``compression`` is the _FileWorker's resolved setting: "auto", a codec
    name, or None for uncompressed."""
    from . import native_parquet as npq

    if compression == "auto":
        return npq.default_column_plan
    level = int(os.environ.get("NVT_PARQUET_ZSTD_LEVEL", 1))
    plain = os.environ.get("NVT_PARQUET_ENCODINGS", "1") == "0"

    def enc_for(dtype):
        if plain:
            return npq.ENC_PLAIN
        return npq.ENC_DELTA if np.dtype(dtype).kind in "iu" else npq.ENC_BYTE_STREAM_SPLIT

    if compression is None:
        return lambda n, d: (enc_for(d), npq.CODEC_UNCOMPRESSED, 0)
    if compression == "zstd":
        return lambda n, d: (enc_for(d), npq.CODEC_ZSTD, level)
    return None  # snappy/gzip/...: arrow path


def _window_native_ok(batches, compression, first_window: bool = False) -> bool:
    """True when every column of every batch in the window fits the native
    writer: flat (non-list), supported numeric dtype, no real nulls (an
    all-true validity mask is dropped — identical semantics). The first
    window must also clear a size floor: tiny writes (spill buckets,
    unit-test crumbs) gain nothing from the native encoder but would pin
    its per-file buffers."""
    from .native_parquet import native_parquet_available

    if _native_plan(compression) is None or not native_parquet_available():
        return False
    names = batches[0].column_names
    for b in batches:
        if b.column_names != names:
            return False
        for nm in names:
            c = b[nm]
            if c.is_list:
                return False
            dt = getattr(c.values, "dtype", None)
            # compare dtype nums, not names: the stringify path showed up
            # at ~7% of the write wall (per column per batch per worker)
            if dt is None or getattr(dt, "num", -1) not in _NATIVE_DTYPE_NUMS:
                return False
            if c.validity is not None and not np.asarray(c.validity).all():
                return False
    return True


class _FileWorker:
    """Single-writer thread for one output parquet file."""

    def __init__(self, path: str, compression, row_group_size, buffer_pieces: int, queue_depth: int, seed: int = 0,
                 file_k: int = 0, nfiles: int = 1, transform=None, fused_spec=None):
        self.path = path
        self.compression = compression
        self.row_group_size = row_group_size
        self.buffer_pieces = max(1, buffer_pieces)
        self.file_k = file_k
        self.nfiles = nfiles
        self.transform = transform
        self.fused_spec = fused_spec  # io.stream_fuse.FusedStreamSpec
        self.q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
        self.writer = None
        self.native = None  # NativeParquetFile when the fast path engages
        self._native_decided = False
        self.error: Optional[BaseException] = None
        self.rng = np.random.default_rng(seed)
        self.thread = threading.Thread(target=self._loop, daemon=True, name=f"nvt-write-{os.path.basename(path)}")
        self.started = False

    def submit(self, item):
        if self.error is not None:
            raise self.error
        if not self.started:
            self.thread.start()
            self.started = True
        self.q.put(item)

    def _loop(self):
        buf: List = []  # (batch, idx) pairs — gathers are DEFERRED to flush
        try:
            while True:
                item = self.q.get()
                if item is _SENTINEL:
                    if buf:
                        self._flush(buf)
                    return
                batch, idx, shuffled, seed = item
                if not shuffled and self.fused_spec is not None:
                    # un-shuffled fused append: raw piece -> per-column
                    # gather(+idx)+op+encode, same machinery as the seeded
                    # windows but with an identity (or explicit) index
                    piece = batch if idx is None else batch
                    n_rows = batch.num_rows if idx is None else len(idx)
                    if n_rows and self._use_native_fused([piece], n_rows):
                        gidx = (
                            None
                            if idx is None
                            else np.ascontiguousarray(idx, dtype=np.int64)
                        )
                        spec = self.fused_spec
                        self.native.write_row_group(
                            [
                                [np.ascontiguousarray(piece[c.source].values)]
                                for c in spec.columns
                            ],
                            gidx,
                            n_rows,
                            ops=spec.make_ops(),
                        )
                        continue
                if self.transform is not None and not shuffled:
                    piece = batch.take(idx) if idx is not None else batch
                    batch, idx = self.transform(piece), None
                if shuffled:
                    buf.append((batch, idx, seed))
                    if len(buf) >= self.buffer_pieces:
                        self._flush(buf)
                        buf = []
                elif self._use_native(
                    [batch], batch.num_rows if idx is None else len(idx)
                ):
                    gidx = None if idx is None else np.asarray(idx, dtype=np.int64)
                    n = batch.num_rows if idx is None else len(gidx)
                    self.native.write_row_group(
                        [[np.asarray(batch[nm].values)] for nm in batch.column_names],
                        gidx,
                        n,
                    )
                else:
                    piece = batch.take(idx) if idx is not None else batch
                    self._write(piece.to_arrow())
        except BaseException as e:  # surfaced by submit()/close()
            self.error = e
            # drain so producers never block on a dead worker
            while True:
                try:
                    if self.q.get_nowait() is _SENTINEL:
                        return
                except queue.Empty:
                    return

    def _use_native(self, batches, window_rows: int) -> bool:
        """Decide (once, at the first window) whether this file is written
        by the native C++ encoder (cpp/nvt_parquet.cc — flat non-null
        numeric columns, the shape of encoded ETL output) or by arrow.
        A later window that no longer qualifies is a hard error: a parquet
        file cannot switch writers mid-stream. Tiny first windows (spill
        buckets, test crumbs) stay on arrow — no native gain there."""
        if not self._native_decided:
            self._native_decided = True
            min_rows = int(os.environ.get("NVT_NATIVE_PARQUET_MIN_ROWS", 16384))
            if window_rows >= min_rows and _window_native_ok(batches, self.compression):
                from .native_parquet import NativeParquetFile

                b0 = batches[0]
                schema = [
                    (nm, np.asarray(b0[nm].values).dtype) for nm in b0.column_names
                ]
                self.native = NativeParquetFile(
                    self.path, schema, plan=_native_plan(self.compression)
                )
            return self.native is not None
        if self.native is None:
            return False
        if not _window_native_ok(batches, self.compression):
            raise RuntimeError(
                f"{self.path}: batch schema changed mid-stream (lists/nulls/"
                "dtype no longer fit the native parquet writer); rerun with "
                "NVT_NATIVE_PARQUET=0"
            )
        return True

    def _flush(self, buf: List):
        """Land the buffered pieces in globally-permuted order. Native path:
        ONE destination-order gather index is built for the window and the
        C++ encoder applies the permutation inside the encode itself (no
        landing pass, no arrow). Arrow fallback: the two-pass bucketed
        permute (PermutePlan) then pyarrow encode — measured 2.3x the
        one-pass random scatter it replaced (126 vs 56M elem/s 1-thread).

        Two piece protocols arrive here (never mixed in one window):
          * seeded (streamed PER_WORKER/PER_PARTITION): entries are
            (batch, None, seed) — this file's rows are the hash split
            hash_split(seed, row) == file_k (Fibonacci multiply-shift),
            and the whole window index (split + Fisher-Yates) is built
            GIL-FREE in C++ (nvtpq_build_window_index); the arrow
            fallback computes the same split with the numpy twin.
          * explicit (FULL shuffle): entries are (batch, idx, None) with
            idx a random subset in random order from the producer's
            permutation."""
        if buf and buf[0][2] is not None:
            if self.fused_spec is not None:
                # fused native stream first; _flush_seeded degrades any
                # non-conforming window to the transform fallback itself
                return self._flush_seeded(buf)
            if self.transform is not None:
                return self._flush_seeded_transform(buf)
            return self._flush_seeded(buf)
        pieces = [(b, i if i is not None else np.arange(b.num_rows)) for b, i, _ in buf]
        lens = [len(i) for _, i in pieces]
        total = int(sum(lens))
        perm = self.rng.permutation(total)
        names = pieces[0][0].column_names
        if self.transform is None and self._use_native([b for b, _ in pieces], total):
            from .native_parquet import pack_gather_index

            gidx = pack_gather_index([i for _, i in pieces], perm)
            self.native.write_row_group(
                [
                    [np.asarray(b[nm].values) for b, _ in pieces]
                    for nm in names
                ],
                gidx,
                total,
            )
            return
        fused_ok = all(
            b.column_names == names and not any(b[n].is_list for n in names)
            for b, _ in pieces
        )
        if not fused_ok:  # list columns / mismatched schemas: classic path
            merged = concat_rows([b.take(i) for b, i in pieces]).take(perm)
            if self.transform is not None:
                merged = self.transform(merged)
            self._write(merged.to_arrow())
            return
        from ..serving.native import PermutePlan
        from ..table import Column, TableBatch as _TB

        bounds = np.cumsum([0] + lens)
        # perm IS the destination positions in source order (piece k's
        # elements occupy perm[bounds[k]:bounds[k+1]])
        plan = PermutePlan.build(perm)
        gsrc = np.concatenate(
            [
                (np.int64(k) << np.int64(48)) | np.asarray(idx, dtype=np.int64)
                for k, (_, idx) in enumerate(pieces)
            ]
        ) if plan is not None else None

        out = _TB()
        ones_cache: dict = {}

        def _all_valid(batch):
            key = id(batch)
            if key not in ones_cache:
                ones_cache[key] = np.ones(batch.num_rows, dtype=bool)
            return ones_cache[key]

        def _land(sources, dtype):
            dest = np.empty(total, dtype=dtype)
            if plan is None or not plan.apply(sources, gsrc, dest):
                for k, ((_, idx), src) in enumerate(zip(pieces, sources)):
                    dest[perm[bounds[k] : bounds[k + 1]]] = src[idx]
            return dest

        for name in names:
            cols = [b[name] for b, _ in pieces]
            srcs = [np.asarray(c.values) for c in cols]
            dest = _land(srcs, srcs[0].dtype)
            has_valid = any(c.validity is not None for c in cols)
            dvalid = None
            if has_valid:
                vsrcs = [
                    np.asarray(c.validity) if c.validity is not None else _all_valid(b)
                    for c, (b, _) in zip(cols, pieces)
                ]
                dvalid = _land(vsrcs, np.dtype(bool))
            out[name] = Column(dest, None, dvalid)
        if self.transform is not None:
            out = self.transform(out)
        self._write(out.to_arrow())

    def _flush_seeded_transform(self, buf: List):
        """Seeded-window flush with the transform FUSED into the worker
        (write_dataset(transform=...)): gather this file's RAW shard (hash
        split + Fisher-Yates, same window index as _flush_seeded), run the
        row-wise transform on the shard, then encode the already-shuffled
        result sequentially (no gather inside the encode). This is the
        reference's to_parquet execution shape — dask materializes the lazy
        transform inside the write task (reference workflow.py:239-248,
        to_parquet on the transformed ddf) — and it skips the two full
        memory passes the two-phase form pays to materialize and re-gather
        the transformed batch."""
        batches = [b for b, _, _ in buf]
        seeds = [s for _, _, s in buf]
        names = batches[0].column_names
        shard = None
        flat = all(
            not b[nm].is_list
            and b[nm].validity is None
            and isinstance(b[nm].values, np.ndarray)
            for b in batches
            for nm in names
        ) and all(
            # one dtype per column across the window: gather_multi would
            # decline a mixed window and the numpy fallback would silently
            # cast (e.g. truncate int64 into int32); the take/concat path
            # below applies concat_rows' promotion rules instead
            len({np.asarray(b[nm].values).dtype for b in batches}) == 1
            for nm in names
        )
        if flat:
            from ..serving.native import gather_multi
            from ..table import Column
            from .native_parquet import build_window_index

            try:
                gidx = build_window_index(
                    [b.num_rows for b in batches],
                    seeds,
                    self.nfiles,
                    self.file_k,
                    int(self.rng.integers(0, 2**63)),
                )
            except RuntimeError:
                gidx = None
            if gidx is not None:
                if len(gidx) == 0:
                    return
                shard = TableBatch()
                for nm in names:
                    srcs = [np.ascontiguousarray(b[nm].values) for b in batches]
                    dest = np.empty(len(gidx), dtype=srcs[0].dtype)
                    if not gather_multi(srcs, gidx, dest):
                        piece = np.asarray(gidx) >> 48
                        row = np.asarray(gidx) & ((1 << 48) - 1)
                        for k, s in enumerate(srcs):
                            mask = piece == k
                            dest[mask] = s[row[mask]]
                    shard[nm] = Column(dest)
        if shard is None:
            # list/validity columns or no native lib: numpy-twin split +
            # take/concat (same rows, same shuffle semantics)
            from .native_parquet import hash_split

            taken = []
            for b, s in zip(batches, seeds):
                if self.nfiles <= 1:
                    idx = np.arange(b.num_rows)
                else:
                    idx = np.flatnonzero(
                        hash_split(s, b.num_rows, self.nfiles) == self.file_k
                    )
                if len(idx):
                    taken.append(b.take(idx))
            if not taken:
                return
            shard = concat_rows(taken)
            shard = shard.take(self.rng.permutation(shard.num_rows))
        out = self.transform(shard)
        n = out.num_rows
        if n == 0:
            return
        if self._use_native([out], n):
            # order by the FILE schema (not the batch): with a fused_spec
            # the file was opened on the spec's column order, which the
            # fallback transform's output order must not silently override
            self.native.write_row_group(
                [[np.asarray(out[nm].values)] for nm, _ in self.native.schema],
                None,
                n,
            )
        else:
            self._write(out.to_arrow())

    def _window_fused_ok(self, batches) -> bool:
        """True when every spec source column of every batch in the window
        can feed the fused native path: flat numpy array, no validity, the
        exact raw dtype the spec's op expects."""
        spec = self.fused_spec
        for b in batches:
            for c in spec.columns:
                if c.source not in b:
                    return False
                col = b[c.source]
                v = col.values
                if (
                    col.is_list
                    or col.validity is not None
                    or not isinstance(v, np.ndarray)
                    or v.ndim != 1
                    or v.dtype != c.in_dtype
                ):
                    return False
        return True

    def _use_native_fused(self, batches, window_rows: int) -> bool:
        """Fused-stream native decision. First conforming window creates the
        native file with the SPEC's output schema; a non-conforming window
        before the decision leaves it open (the transform fallback decides
        from its transformed output, which carries the same schema)."""
        if not self._native_decided:
            min_rows = int(os.environ.get("NVT_NATIVE_PARQUET_MIN_ROWS", 16384))
            if (
                window_rows < min_rows
                or _native_plan(self.compression) is None
                or not self._window_fused_ok(batches)
            ):
                return False
            from .native_parquet import native_parquet_available

            if not native_parquet_available():
                return False
            from .native_parquet import NativeParquetFile

            self._native_decided = True
            self.native = NativeParquetFile(
                self.path, self.fused_spec.schema(), plan=_native_plan(self.compression)
            )
            return True
        return self.native is not None and self._window_fused_ok(batches)

    def _flush_seeded(self, buf: List):
        """Flush a window of WHOLE pieces under the seeded hash-split
        protocol (see _flush). Hot path: one C++ call builds this file's
        shuffled gather index, one C++ call per column encodes — no numpy
        permutation, no scatter, no GIL-held landing pass.

        With a ``fused_spec`` the pieces are RAW batches: each column's
        C++ call gathers the raw shard, applies the workflow op (cat probe /
        cont pipe via the serving kernels), and encodes the result — the
        transform itself runs inside the write worker, shard-local and
        GIL-free (see io/stream_fuse.py)."""
        batches = [b for b, _, _ in buf]
        seeds = [s for _, _, s in buf]
        total = sum(b.num_rows for b in batches)
        if self.fused_spec is not None:
            if self._use_native_fused(batches, max(1, total // max(1, self.nfiles))):
                from .native_parquet import build_window_index

                gidx = build_window_index(
                    [b.num_rows for b in batches],
                    seeds,
                    self.nfiles,
                    self.file_k,
                    int(self.rng.integers(0, 2**63)),
                )
                if len(gidx) == 0:
                    return
                spec = self.fused_spec
                self.native.write_row_group(
                    [
                        [np.ascontiguousarray(b[c.source].values) for b in batches]
                        for c in spec.columns
                    ],
                    gidx,
                    len(gidx),
                    ops=spec.make_ops(),
                )
                return
            if self.transform is None:
                raise RuntimeError(
                    f"{self.path}: window does not fit the fused native "
                    "stream and no transform fallback was provided; rerun "
                    "with NVT_FUSED_WRITE=0"
                )
            return self._flush_seeded_transform(buf)
        if self._use_native(batches, max(1, total // max(1, self.nfiles))):
            from .native_parquet import build_window_index

            gidx = build_window_index(
                [b.num_rows for b in batches],
                seeds,
                self.nfiles,
                self.file_k,
                int(self.rng.integers(0, 2**63)),
            )
            if len(gidx) == 0:
                return
            names = batches[0].column_names
            self.native.write_row_group(
                [[np.asarray(b[nm].values) for b in batches] for nm in names],
                gidx,
                len(gidx),
            )
            return
        # arrow fallback: materialize this file's subset with the numpy
        # twin of the C++ hash split, then reuse the explicit-idx flush
        from .native_parquet import hash_split

        legacy = []
        for b, s in zip(batches, seeds):
            if self.nfiles <= 1:
                idx = np.arange(b.num_rows)
            else:
                idx = np.flatnonzero(hash_split(s, b.num_rows, self.nfiles) == self.file_k)
            legacy.append((b, self.rng.permutation(idx) if len(idx) else idx, None))
        if sum(len(i) for _, i, _ in legacy) == 0:
            return
        self._flush(legacy)

    def _write(self, table):
        import pyarrow.parquet as pq

        if self.writer is None:
            # use_dictionary=False: high-cardinality int codes make arrow's
            # dictionary encoding ~10x slower AND larger (measured 0.24 vs
            # 2.3 M rows/s on 26 int32 code columns)
            compression, level = _resolve_compression(self.compression, table.schema)
            self.writer = pq.ParquetWriter(
                self.path,
                table.schema,
                use_dictionary=False,
                compression=compression,
                compression_level=level,
                column_encoding=_column_encodings(table.schema),
            )
        self.writer.write_table(table, row_group_size=self.row_group_size)

    def close(self):
        if self.started:
            self.q.put(_SENTINEL)
            self.thread.join()
        if self.error is not None:
            raise self.error
        if self.native is not None:
            self.native.close()
            return True
        if self.writer is not None:
            self.writer.close()
            return True
        return False


def _column_encodings(schema):
    """Per-column parquet encodings: DELTA_BINARY_PACKED for top-level int
    columns, BYTE_STREAM_SPLIT for floats (defaults elsewhere). The
    pre-transform leaves zstd almost nothing to do — measured 2.8x the
    encode rate AND slightly smaller files than PLAIN+zstd on
    frequency-sorted code columns (0.61 -> 1.73M rows/s single-thread).
    NVT_PARQUET_ENCODINGS=0 opts out."""
    import pyarrow as pa

    if os.environ.get("NVT_PARQUET_ENCODINGS", "1") == "0":
        return None
    float_raw = os.environ.get("NVT_PARQUET_FLOAT_CODEC", "zstd") == "none"
    enc = {}
    for field in schema:
        if pa.types.is_integer(field.type):
            enc[field.name] = "DELTA_BINARY_PACKED"
        elif pa.types.is_floating(field.type) and not float_raw:
            enc[field.name] = "BYTE_STREAM_SPLIT"
    return enc or None


def _compression_level(compression):
    """zstd level 1 by default: measured 1.5x the encode rate of arrow's
    default level at equal output size on encoded tabular data."""
    if compression == "zstd":
        return int(os.environ.get("NVT_PARQUET_ZSTD_LEVEL", 1))
    return None


def _resolve_compression(compression, schema):
    """Map the writer's codec setting to pyarrow (compression, level).

    ``auto`` (the default) picks per column: integer columns ship
    DELTA_BINARY_PACKED **uncompressed** — zstd over the delta stream costs
    ~15% single-thread encode rate for ~0.5 B/row (bench/write_codec_probe.py:
    1.65 → 1.89M rows/s at 81.0 vs 81.5 B/row) — while float (BYTE_STREAM_SPLIT)
    and string columns keep zstd level 1. Any explicit codec applies to every
    column as before."""
    if compression != "auto":
        return compression, _compression_level(compression)
    import pyarrow as pa

    if os.environ.get("NVT_PARQUET_ENCODINGS", "1") == "0":
        # no DELTA pass to lean on: plain ints still want the codec
        return "zstd", _compression_level("zstd")
    codec = {}
    level = {}
    zstd_level = int(os.environ.get("NVT_PARQUET_ZSTD_LEVEL", 1))
    float_raw = os.environ.get("NVT_PARQUET_FLOAT_CODEC", "zstd") == "none"
    for field in schema:
        if pa.types.is_integer(field.type) or (
            float_raw and pa.types.is_floating(field.type)
        ):
            codec[field.name] = "NONE"
        else:
            codec[field.name] = "ZSTD"
            level[field.name] = zstd_level
    return codec, (level or None)


class ParquetWriter:
    """Append-mode writer over a fixed set of output files, one worker
    thread per file (arrow's parquet encode and the native row gather both
    release the GIL, so N files encode N-way parallel and overlap the
    producer)."""

    def __init__(
        self,
        output_path: str,
        num_files: int = 1,
        row_group_size: Optional[int] = None,
        compression: Optional[str] = None,
        buffer_partitions: int = 4,
        queue_depth: int = 4,
        seed: int = 42,
        transform=None,
        fused_spec=None,
    ):
        os.makedirs(output_path, exist_ok=True)
        self.output_path = output_path
        self.num_files = max(1, num_files)
        self.row_group_size = row_group_size
        # "auto" default: per-column codecs (delta-packed ints uncompressed,
        # floats/strings zstd-1 — see _resolve_compression); zstd beats
        # snappy by ~27% bytes on this data (168 raw / 124 snappy / 91 zstd
        # MB per 1M rows) and delta already does zstd's work on the ints
        if compression is None:
            compression = os.environ.get("NVT_PARQUET_COMPRESSION", "auto")
        self.compression = None if compression in ("none", "") else compression
        self._paths = [
            os.path.join(output_path, f"part_{i}.parquet") for i in range(self.num_files)
        ]
        self._workers = [
            _FileWorker(
                p, self.compression, row_group_size, buffer_partitions, queue_depth,
                seed=seed * 1000 + i, file_k=i, nfiles=self.num_files,
                transform=transform, fused_spec=fused_spec,
            )
            for i, p in enumerate(self._paths)
        ]
        self._next = 0
        self._seed_rng = np.random.default_rng(seed)

    def append(self, batch: TableBatch, file_idx: Optional[int] = None):
        if batch.num_rows == 0:
            return
        idx = self._next if file_idx is None else file_idx % self.num_files
        if file_idx is None:
            self._next = (self._next + 1) % self.num_files
        self._workers[idx].submit((batch, None, False, None))

    def append_shuffled(self, batch: TableBatch):
        """Streamed shuffle: hand the WHOLE batch + a fresh seed to every
        file worker; each selects its disjoint hash-split subset and
        shuffles inside its window (GIL-free in C++ on the native path).
        Replaces the producer-side permutation+slice of append_split —
        the permutation cost moves off the producer thread entirely."""
        if batch.num_rows == 0:
            return
        seed = int(self._seed_rng.integers(0, 2**63))
        for w in self._workers:
            w.submit((batch, None, True, seed))

    def append_split(self, batch: TableBatch, perm=None, shuffled: Optional[bool] = None):
        """Split one batch across all output files (parallel encode).

        With ``perm`` (a permutation of the batch's rows), file ``i``
        receives a uniform random subset in random order; each worker then
        re-permutes across its buffered pieces, extending the shuffle
        window over ``buffer_partitions`` input partitions."""
        n = batch.num_rows
        if n == 0:
            return
        if shuffled is None:
            shuffled = perm is not None
        per = max(1, n // self.num_files)
        start = 0
        for i in range(self.num_files):
            length = per if i < self.num_files - 1 else n - start
            if length <= 0:
                break
            idx = perm[start : start + length] if perm is not None else None
            piece = (batch, idx, shuffled, None) if idx is not None else (
                batch.slice(start, length),
                None,
                shuffled,
                None,
            )
            self._workers[i].submit(piece)
            start += length

    def close(self) -> List[str]:
        paths = []
        errors = []
        for p, w in zip(self._paths, self._workers):
            try:
                if w.close():
                    paths.append(p)
            except BaseException as e:
                errors.append(e)
        if errors:
            raise errors[0]
        return paths


def write_dataset(
    dataset,
    output_path: str,
    shuffle: Optional[Shuffle] = None,
    out_files: int = 1,
    row_group_size: Optional[int] = None,
    buffer_partitions: int = 4,
    seed: int = 42,
    compression: Optional[str] = None,
    transform=None,
    fused_spec=None,
):
    """Write batches to ``out_files`` parquet files, optionally shuffled.

    ``transform`` fuses a ROW-WISE TableBatch->TableBatch function into the
    file workers: each worker gathers its raw shard (hash split + window
    shuffle), transforms it, and encodes the result — the execution shape of
    the reference's lazy to_parquet, where dask materializes the transform
    inside the write task (reference workflow.py:239-248). Requirements: the
    function must be thread-safe (it runs concurrently on every file worker;
    Workflow executors' transform_batch is — heavy kernels share one global
    encode pool) and per-row (position-dependent transforms would see
    shard-local row positions).

    When to use: when the PRODUCER is the bottleneck (slow decode, a
    single-threaded Python generator) — fusing moves the transform onto the
    N worker threads. When the producer transform is already parallel and
    overlapped, the two-phase form measures FASTER (interleaved A/B on the
    Criteo stream: 4.8 two-phase vs 3.5M rows/s fused): the seeded encode
    fuses its shuffle gather INTO the page encode, so two-phase touches
    memory transform(write T) + encode(gather-read T), while the fused form
    must materialize the gathered raw shard first — one extra full pass.

    ``fused_spec`` (io.stream_fuse.FusedStreamSpec) is the NATIVE form of
    the fused stream: the dataset yields RAW batches and each file worker
    gathers its shard + applies the workflow ops (cat probe / cont pipe)
    + encodes, all inside one C++ call per column — no intermediate
    transformed batch at all. Windows that don't conform (lists, validity,
    dtype drift) degrade to the ``transform`` fallback, so pass both."""
    writer = ParquetWriter(
        output_path,
        out_files,
        row_group_size,
        compression,
        buffer_partitions=buffer_partitions if shuffle in (Shuffle.PER_WORKER, Shuffle.FULL) else 1,
        seed=seed,
        transform=transform,
        fused_spec=(
            fused_spec
            if shuffle in (Shuffle.PER_WORKER, Shuffle.PER_PARTITION, None)
            else None
        ),
    )
    rng = np.random.default_rng(seed)

    if shuffle == Shuffle.FULL:
        table = dataset.to_table()
        writer.append_split(table, perm=rng.permutation(table.num_rows))
    elif shuffle in (Shuffle.PER_WORKER, Shuffle.PER_PARTITION):
        # streamed scatter-shuffle: every partition is hash-split over all
        # files as it arrives (seeded, computed inside each file worker);
        # PER_WORKER additionally re-permutes across each worker's buffered
        # pieces (the multi-partition window)
        for batch in dataset.to_batches(prefetch=1):
            writer.append_shuffled(batch.to_host())
    else:
        for batch in dataset.to_batches(prefetch=1):
            writer.append(batch.to_host())
    paths = writer.close()
    _write_metadata(output_path, paths)
    return paths


def _write_metadata(output_path: str, paths: List[str]):
    import json

    meta = {"files": [os.path.basename(p) for p in paths]}
    with open(os.path.join(output_path, "_metadata.json"), "w") as f:
        json.dump(meta, f)
