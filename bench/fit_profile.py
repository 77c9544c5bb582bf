"""Profile the Categorify fit scan (fit_batch) component-by-component."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import bench as _b

    parts_raw = [_b.make_part(s) for s in range(int(sys.argv[1]) if len(sys.argv) > 1 else 4)]
    cat_cols = [f"C{i}" for i in range(_b.NUM_CATS)]

    from nvtabular_tpu.serving.native import NativeCounter

    # 1. raw NativeCounter.update throughput, one column at a time, serial
    counters = {c: NativeCounter() for c in cat_cols}
    t0 = time.perf_counter()
    for part in parts_raw:
        for c in cat_cols:
            counters[c].update(part[c])
    dt = time.perf_counter() - t0
    nvals = len(parts_raw) * _b.ROWS_PER_PART * len(cat_cols)
    print(f"serial native update: {dt:.2f}s | {nvals/dt/1e6:.1f}M vals/s", flush=True)

    # 2. same but threaded 4-way by column
    import concurrent.futures as cf

    counters2 = {c: NativeCounter() for c in cat_cols}

    def run(c):
        for part in parts_raw:
            counters2[c].update(part[c])

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(run, cat_cols))
    dt = time.perf_counter() - t0
    print(f"4-thread native update: {dt:.2f}s | {nvals/dt/1e6:.1f}M vals/s", flush=True)

    # 3. full fit_batch via cProfile (one Categorify op over TableBatches)
    import cProfile
    import pstats

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.table import TableBatch

    parts = [TableBatch.from_pydict(p) for p in parts_raw]
    op = ops.Categorify(max_size=10_000_000)
    node = cat_cols >> op
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(parts)

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    wf.fit(ds)
    pr.disable()
    dt = time.perf_counter() - t0
    st = wf.last_fit_stats
    print(
        f"fit: {dt:.2f}s | scan {st['scan_seconds']:.2f}s | finalize {st['finalize_seconds']:.2f}s",
        flush=True,
    )
    pstats.Stats(pr).sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
