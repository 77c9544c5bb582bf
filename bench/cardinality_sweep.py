"""Vocabulary-cardinality sweep: transform rows/s from 50K to 10M keys.

Records where the direct (1 gather) → cuckoo (2 row-gather) lookup
crossover lands and how the device transform rate responds — the measured
counterpart of the reference's cardinality-scaling claims
(reference bench/examples/MultiGPUBench.md). Gather cost on v5e: ~180M
probes/s while each concat bin stays ≤48 MB / 1.5M rows, ~66M/s past the
cliff (kernels/README.md) — exact-sized modulo cuckoo tables at load 0.8
plus 48MB binning keep every cardinality in the fast regime up to ~4.3M
keys per column; the sweep shows the rate across that range.

Two key layouts per cardinality:
- dense:  ids in [0, card)            → DirectLookup while range permits
- spread: ids hashed over full int31  → CuckooLookup (Criteo-like hashes)

Usage:
    python bench/cardinality_sweep.py                # real TPU
    JAX_PLATFORMS=cpu python bench/cardinality_sweep.py --rows 262144
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench  # reuse the compile-cache setup  # noqa: E402

CARDINALITIES = [50_000, 250_000, 1_000_000, 4_000_000, 10_000_000]


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1 << 21, help="rows per measurement")
    p.add_argument("--cats", type=int, default=8, help="categorical columns")
    p.add_argument("--passes", type=int, default=3)
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize force-registers the TPU tunnel; only
        # jax.config sticks (see CLAUDE.md environment traps)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.ops.lookup import CuckooLookup, DirectLookup, StashLookup
    from nvtabular_tpu.table import TableBatch

    rng = np.random.default_rng(0)
    results = []
    for card in CARDINALITIES:
        for layout in ("dense", "spread"):
            u = rng.random((args.cats, args.rows))
            raw = (card * u**1.5).astype(np.int64)
            if layout == "spread":
                raw = (raw * np.int64(2654435761)) % np.int64(2**31)
            data = {f"C{i}": raw[i].astype(np.int32) for i in range(args.cats)}
            ds = nvt.Dataset(TableBatch.from_pydict(data))
            cat_op = ops.Categorify()
            wf = nvt.Workflow([f"C{i}" for i in range(args.cats)] >> cat_op)
            wf.fit(ds)
            kinds = set()
            for v in cat_op.vocabs.values():
                lut = v.lookup_struct()
                kinds.add(
                    "direct"
                    if isinstance(lut, DirectLookup)
                    else "stash"
                    if isinstance(lut, StashLookup)
                    else "cuckoo"
                    if isinstance(lut, CuckooLookup)
                    else "none"
                )
            ex = wf.executor
            out_node = wf.graph.output_node
            batch = ds.to_table()
            staged = ex.stage(batch, out_node)
            # warmup (compile + tunnel flip)
            out = ex._dispatch(staged, out_node)
            float(jnp.sum(next(iter(out.columns.values())).values[:8].astype(jnp.float32)))
            best = 0.0
            for _ in range(args.passes):
                t0 = time.perf_counter()
                out = ex._dispatch(staged, out_node)
                first = next(iter(out.columns.values())).values
                float(jnp.sum(first[:8].astype(jnp.float32)))  # force execution
                dt = time.perf_counter() - t0
                best = max(best, args.rows / dt)
            vocab_keys = sum(len(v.values_by_code) for v in cat_op.vocabs.values())
            results.append(
                {
                    "cardinality": card,
                    "layout": layout,
                    "lookup": sorted(kinds),
                    "vocab_keys": vocab_keys,
                    "rows_per_sec": round(best, 1),
                    "lookups_per_sec": round(best * args.cats, 1),
                }
            )
            print(
                f"  card={card/1e6:.2f}M {layout:6s} {sorted(kinds)} "
                f"{best:,.0f} rows/s",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "cardinality_sweep",
                "rows": args.rows,
                "cats": args.cats,
                "backend": _bench._backend(),
                "sweep": results,
            }
        )
    )


if __name__ == "__main__":
    main()
