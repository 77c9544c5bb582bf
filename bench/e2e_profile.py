"""Phase profile of the end-to-end host ETL stream (transform -> shuffled
parquet write) — the pipeline bench.py's etl_end_to_end phase measures.

Runs host-only (no device, no tunnel): JAX_PLATFORMS=cpu is forced before
import so this is safe on the TPU VM without touching the axon tunnel.

Phases timed separately (same data, same fitted workflow):
  transform        host FusedHostExecutor.transform_batch only
  perm             rng.permutation per batch (the shuffle index cost)
  write_pre        writer fed PRE-transformed batches (encode+gather+IO only)
  stream           full transform->write pipeline (what bench.py times)
plus single-thread nvtpq_write_column micro-splits per encoding/codec.

Usage: python bench/e2e_profile.py [--parts 4] [--rows 262144] [--epochs 2]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=4)
    ap.add_argument("--rows", type=int, default=1 << 18)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out-files", type=int, default=max(2, min(8, os.cpu_count() or 4)))
    ap.add_argument("--tmpfs", action="store_true", default=True)
    args = ap.parse_args()

    os.environ["NVT_BENCH_ROWS_PER_PART"] = str(args.rows)
    os.environ["NVT_BENCH_PARTS"] = str(args.parts)
    os.environ.setdefault("NVT_PREBUILD_DEVICE_LUTS", "0")

    import bench as hb  # repo-root bench.py

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
    from nvtabular_tpu.io.shuffle import check_shuffle_arg
    from nvtabular_tpu.io.writer import write_dataset
    from nvtabular_tpu.table import TableBatch

    parts = [TableBatch.from_pydict(hb.make_part(s)) for s in range(args.parts)]
    dataset = nvt.Dataset(parts)
    rows_per_epoch = args.parts * args.rows

    cat_names = [f"C{i}" for i in range(hb.NUM_CATS)]
    cont_names = [f"I{i}" for i in range(hb.NUM_CONTS)]
    cats = cat_names >> ops.Categorify(max_size=10_000_000)
    conts = cont_names >> ops.FillMissing() >> ops.Clip(min_value=0.0) >> ops.LogOp() >> ops.Normalize()
    workflow = nvt.Workflow(cats + conts + ["label"])

    t0 = time.perf_counter()
    workflow.fit(dataset)
    fit_s = time.perf_counter() - t0
    print(f"fit: {fit_s:.2f}s")

    host = FusedHostExecutor()
    out_node = workflow.graph.output_node
    batches = list(dataset.to_batches())

    # warm (table builds, spec extraction)
    outs = [host.transform_batch(b, out_node) for b in batches]

    def timed(label, fn, rows):
        t = time.perf_counter()
        fn()
        dt = time.perf_counter() - t
        print(f"{label:14s} {dt:7.3f}s  {rows/dt/1e6:6.2f}M rows/s")
        return dt

    # --- transform only
    def do_transform():
        for _ in range(args.epochs):
            for b in batches:
                host.transform_batch(b, out_node)

    timed("transform", do_transform, rows_per_epoch * args.epochs)

    # --- permutation cost
    rng = np.random.default_rng(0)

    def do_perm():
        for _ in range(args.epochs):
            for b in batches:
                rng.permutation(b.num_rows)

    timed("perm", do_perm, rows_per_epoch * args.epochs)

    import shutil
    import tempfile

    base = "/dev/shm" if args.tmpfs and os.path.isdir("/dev/shm") else None

    class _Stream:
        def __init__(self, items, epochs):
            self.items, self.epochs = items, epochs

        def to_batches(self, prefetch=1, **kw):
            for _ in range(self.epochs):
                yield from iter(self.items)

    class _TransformStream(_Stream):
        def to_batches(self, prefetch=1, **kw):
            for _ in range(self.epochs):
                for b in self.items:
                    yield host.transform_batch(b, out_node)

    def run_write(stream):
        d = tempfile.mkdtemp(prefix="nvt_prof_", dir=base)
        try:
            t = time.perf_counter()
            write_dataset(stream, d, shuffle=check_shuffle_arg("per_worker"), out_files=args.out_files)
            dt = time.perf_counter() - t
            nbytes = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return dt, nbytes

    # --- write only (pre-transformed)
    rows = rows_per_epoch * args.epochs
    t = time.perf_counter()
    dt, nbytes = run_write(_Stream(outs, args.epochs))
    print(f"{'write_pre':14s} {dt:7.3f}s  {rows/dt/1e6:6.2f}M rows/s  {nbytes/rows:5.1f} B/row  {nbytes/dt/1e6:6.1f} MB/s")

    # --- full stream (two-phase: producer transform -> worker encode)
    dt, nbytes = run_write(_TransformStream(batches, args.epochs))
    print(f"{'stream2phase':14s} {dt:7.3f}s  {rows/dt/1e6:6.2f}M rows/s  {nbytes/rows:5.1f} B/row  {nbytes/dt/1e6:6.1f} MB/s")

    # --- FUSED stream (workers gather+probe+encode raw shards)
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    spec = extract_stream_spec(workflow)
    if spec is not None:
        def fallback(b):
            from nvtabular_tpu.dag.executor import _enforce_dtypes

            return _enforce_dtypes(
                host.transform_batch(b, out_node).to_host(), workflow.output_dtypes
            )

        d = tempfile.mkdtemp(prefix="nvt_prof_", dir=base)
        try:
            t = time.perf_counter()
            write_dataset(
                _Stream(batches, args.epochs), d,
                shuffle=check_shuffle_arg("per_worker"),
                out_files=args.out_files, fused_spec=spec, transform=fallback,
            )
            dt = time.perf_counter() - t
            nbytes = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        finally:
            shutil.rmtree(d, ignore_errors=True)
        print(f"{'streamfused':14s} {dt:7.3f}s  {rows/dt/1e6:6.2f}M rows/s  {nbytes/rows:5.1f} B/row  {nbytes/dt/1e6:6.1f} MB/s")
    else:
        print("streamfused    (spec not applicable)")

    # --- single-thread encode micro-splits on one transformed batch
    from nvtabular_tpu.io import native_parquet as npq

    b0 = outs[0]
    n = b0.num_rows
    gidx = np.random.default_rng(1).permutation(n).astype(np.int64)
    cols = {nm: np.ascontiguousarray(np.asarray(b0[nm].values)) for nm in b0.column_names}

    def enc_time(label, plan, reps=3):
        d = tempfile.mkdtemp(prefix="nvt_enc_", dir=base)
        path = os.path.join(d, "x.parquet")
        schema = [(nm, v.dtype) for nm, v in cols.items()]
        best = 1e9
        for _ in range(reps):
            f = npq.NativeParquetFile(path + "_", schema, plan=plan)
            t = time.perf_counter()
            f.write_row_group([[v] for v in cols.values()], gidx, n)
            dt = time.perf_counter() - t
            f.close()
            best = min(best, dt)
        sz = os.path.getsize(path + "_")
        shutil.rmtree(d, ignore_errors=True)
        print(f"enc[{label:22s}] {best*1e3:7.1f}ms  {n/best/1e6:6.2f}M rows/s(1T)  {sz/n:5.1f} B/row")

    enc_time("auto(default)", npq.default_column_plan)
    enc_time("delta/bss,no-zstd", lambda nm, d: (
        (npq.ENC_DELTA if np.dtype(d).kind in "iu" else npq.ENC_BYTE_STREAM_SPLIT),
        npq.CODEC_UNCOMPRESSED, 0))
    enc_time("delta/bss,zstd1-all", lambda nm, d: (
        (npq.ENC_DELTA if np.dtype(d).kind in "iu" else npq.ENC_BYTE_STREAM_SPLIT),
        npq.CODEC_ZSTD, 1))
    enc_time("plain,no-zstd", lambda nm, d: (npq.ENC_PLAIN, npq.CODEC_UNCOMPRESSED, 0))
    enc_time("plain,zstd1", lambda nm, d: (npq.ENC_PLAIN, npq.CODEC_ZSTD, 1))

    # gather-only (plain, no codec, no shuffle vs shuffle) isolates the gather
    f = npq.NativeParquetFile("/dev/shm/nvt_g.parquet" if base else "/tmp/nvt_g.parquet",
                              [(nm, v.dtype) for nm, v in cols.items()], plan=lambda nm, d: (npq.ENC_PLAIN, npq.CODEC_UNCOMPRESSED, 0))
    t = time.perf_counter()
    f.write_row_group([[v] for v in cols.values()], None, n)
    seq = time.perf_counter() - t
    f.close()
    os.unlink(f.path)
    print(f"enc[plain,seq,no-gather  ] {seq*1e3:7.1f}ms  {n/seq/1e6:6.2f}M rows/s(1T)")


if __name__ == "__main__":
    main()
