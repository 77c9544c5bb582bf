"""Local profile of the HOST-side ETL phases: fit (scan vs finalize) and the
streamed transform->shuffled-write pipeline. No device work — runs anywhere.

Usage: python bench/e2e_profile.py [--parts 16] [--write-mult 1] [--out DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--write-mult", type=int, default=1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--out-files", type=int, default=8)
    ap.add_argument("--profile-write", action="store_true")
    args = ap.parse_args()

    import bench as _b  # bench.py at repo root

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.table import TableBatch

    t0 = time.perf_counter()
    parts = [TableBatch.from_pydict(_b.make_part(s)) for s in range(args.parts)]
    print(f"datagen: {time.perf_counter()-t0:.2f}s", flush=True)
    dataset = nvt.Dataset(parts)

    cat_names = [f"C{i}" for i in range(_b.NUM_CATS)]
    cont_names = [f"I{i}" for i in range(_b.NUM_CONTS)]
    cats = cat_names >> ops.Categorify(max_size=10_000_000)
    conts = (
        cont_names >> ops.FillMissing() >> ops.Clip(min_value=0.0) >> ops.LogOp() >> ops.Normalize()
    )
    workflow = nvt.Workflow(cats + conts + ["label"])

    t0 = time.perf_counter()
    workflow.fit(dataset)
    fit_s = time.perf_counter() - t0
    st = workflow.last_fit_stats
    rows = sum(p.num_rows for p in parts)
    print(
        f"fit: {fit_s:.2f}s total | scan {st['scan_seconds']:.2f}s "
        f"({rows/max(st['scan_seconds'],1e-9)/1e6:.2f}M rows/s) | "
        f"finalize {st['finalize_seconds']:.2f}s | rows {rows}",
        flush=True,
    )

    # streamed host transform -> shuffled write
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
    from nvtabular_tpu.io.shuffle import check_shuffle_arg
    from nvtabular_tpu.io.writer import write_dataset

    host_executor = FusedHostExecutor()
    out_node = workflow.graph.output_node

    # warm the host chains (table builds) outside the timed region
    t0 = time.perf_counter()
    host_executor.transform_batch(parts[0], out_node)
    print(f"host warm: {time.perf_counter()-t0:.2f}s", flush=True)

    class _Stream:
        def to_batches(self, prefetch=1, **kw):
            for _ in range(args.write_mult):
                for b in parts:
                    yield host_executor.transform_batch(b, out_node)

    import tempfile

    write_dir = args.out or tempfile.mkdtemp(prefix="nvt_e2e_prof_")
    total_rows = rows * args.write_mult

    def timed_write():
        t0 = time.perf_counter()
        write_dataset(
            _Stream(), write_dir, shuffle=check_shuffle_arg("per_worker"), out_files=args.out_files
        )
        return time.perf_counter() - t0

    if args.profile_write:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        w_s = timed_write()
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
    else:
        w_s = timed_write()

    bytes_written = sum(
        os.path.getsize(os.path.join(write_dir, f)) for f in os.listdir(write_dir)
    )
    print(
        f"transform+write: {w_s:.2f}s | {total_rows/w_s/1e6:.2f}M rows/s | "
        f"{bytes_written/1e6:.0f} MB ({bytes_written/total_rows:.1f} B/row) | "
        f"{bytes_written/w_s/1e6:.0f} MB/s",
        flush=True,
    )
    # transform-only pass for comparison
    t0 = time.perf_counter()
    for b in parts:
        host_executor.transform_batch(b, out_node)
    tr_s = time.perf_counter() - t0
    print(f"transform only: {tr_s:.2f}s | {rows/tr_s/1e6:.2f}M rows/s", flush=True)

    import shutil

    if args.out is None:
        shutil.rmtree(write_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
