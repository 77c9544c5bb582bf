"""BASELINE configs 1-2: MovieLens-style workflows, timed.

Config 1 — getting-started workflow: Categorify(user/item ids, genres
multihot) + Normalize, fit/transform (reference
examples/getting-started-movielens; BASELINE.json configs[0]).
Config 2 — advanced workflow: TargetEncoding + JoinGroupby + LambdaOp +
Bucketize + HashedCross (BASELINE.json configs[1]).

Synthetic MovieLens-shaped data (dense user/movie id spaces → the DIRECT
single-gather lookup path, unlike bench.py's hashed Criteo ids), sized by
--rows. Prints one JSON line per config.

Usage:
    python bench/movielens_bench.py [--rows 4000000]        # real TPU
    JAX_PLATFORMS=cpu python bench/movielens_bench.py --rows 500000
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench  # compile-cache setup  # noqa: E402,F401

N_USERS = 162_000  # ml-25m scale
N_MOVIES = 62_000
N_GENRES = 20


def make_part(seed: int, rows: int):
    from nvtabular_tpu.table import Column, TableBatch

    rng = np.random.default_rng(seed)
    b = TableBatch()
    b["userId"] = Column(rng.zipf(1.2, rows).clip(1, N_USERS).astype(np.int64))
    b["movieId"] = Column(rng.zipf(1.1, rows).clip(1, N_MOVIES).astype(np.int64))
    lengths = rng.integers(1, 5, rows)
    offs = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    b["genres"] = Column(
        rng.integers(1, N_GENRES + 1, int(offs[-1])).astype(np.int64), offs
    )
    b["rating"] = Column(
        (rng.integers(1, 11, rows) / 2.0).astype(np.float32)
    )
    b["ts_delta"] = Column(rng.exponential(86400.0, rows).astype(np.float32))
    return b


def dataset(rows: int, parts: int = 8):
    import nvtabular_tpu as nvt

    per = max(1, rows // parts)
    return nvt.Dataset([make_part(s, per) for s in range(parts)])


def run_config1(rows: int):
    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops

    ds = dataset(rows)
    cats = ["userId", "movieId", "genres"] >> ops.Categorify()
    conts = ["ts_delta"] >> ops.LogOp() >> ops.Normalize()
    wf = nvt.Workflow(cats + conts + ["rating"])
    return _timed("movielens_getting_started", wf, ds)


def run_config2(rows: int):
    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops

    ds = dataset(rows)
    te = ["userId", "movieId"] >> ops.TargetEncoding("rating", kfold=3, p_smooth=20)
    jg = ["movieId"] >> ops.JoinGroupby(cont_cols=["ts_delta"], stats=["mean", "count"])
    lam = ["ts_delta"] >> ops.LambdaOp(np.log1p) >> ops.Bucketize(
        {"ts_delta": [60.0, 3600.0, 43200.0, 86400.0, 604800.0]}
    )
    cross = ["userId", "movieId"] >> ops.HashedCross(10_000)
    wf = nvt.Workflow(te + jg + lam + cross + ["rating"])
    return _timed("movielens_advanced", wf, ds)


def _timed(metric: str, wf, ds):
    """Times the HOST engine (FusedHostExecutor — the same engine that
    feeds the parquet write path): on the axon tunnel a device-resident
    measurement is bench.py's job, and pulling full outputs d2h runs at
    the tunnel's ~12 MB/s, which would measure the tunnel, not the
    framework."""
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor

    t0 = time.perf_counter()
    wf.fit(ds)
    fit_s = time.perf_counter() - t0
    hx = FusedHostExecutor()
    node = wf.graph.output_node
    batches = list(ds.to_batches())
    hx.transform_batch(batches[0], node)  # warm: native table builds
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for b in batches:
            hx.transform_batch(b, node)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n = sum(b.num_rows for b in batches)
    return {
        "metric": metric,
        "rows": n,
        "fit_s": round(fit_s, 3),
        "transform_s": round(best, 3),
        "rows_per_sec": round(n / best, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--config", type=int, default=0, help="1 or 2; 0 = both")
    args = ap.parse_args()
    if args.config in (0, 1):
        print(json.dumps(run_config1(args.rows)), flush=True)
    if args.config in (0, 2):
        print(json.dumps(run_config2(args.rows)), flush=True)


if __name__ == "__main__":
    main()
