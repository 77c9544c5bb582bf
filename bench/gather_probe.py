"""In-process gather-form microbenchmark (real TPU via the axon tunnel).

Answers ONE question with in-process (tunnel-noise-immune) ratios: how does
gather throughput depend on (a) operand size, (b) gather form — flat element
gather, flat 8-wide row gather, and the column-batched [C, N] row gather the
fused ETL transform actually uses — and (c) index mode (clip vs
promise_in_bounds)?

Methodology (see kernels/README.md and the project verify skill): execution
on the tunnel is lazy and dispatch timing lies, so every measurement runs K
gather rounds inside ONE jit under lax.fori_loop — indices are re-derived
from the round counter so XLA cannot hoist the gathers — and is forced by a
single scalar readback. A fixed calibration op runs first so runs on
different days can be normalized.

Usage:  python bench/gather_probe.py [--probes 13.3e6] [--rounds 8]
Prints one JSON line per experiment.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "nvtabular_tpu", "jaxcache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", type=float, default=26 * (1 << 19))  # bench batch
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--cols", type=int, default=26)
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    n_probes = int(args.probes)
    cols = args.cols
    per_col = n_probes // cols
    n_probes = per_col * cols
    rounds = args.rounds

    rng = np.random.default_rng(0)
    base_idx = rng.integers(0, 1 << 30, n_probes, dtype=np.int32)

    # operands: [nb, 8] int32 packed rows (the lookup-table layout)
    operands = {}
    for mb in (32, 192, 768):
        nb = (mb << 20) // 32
        operands[mb] = np.zeros((nb, 8), dtype=np.int32)

    # stage everything BEFORE the first readback (tunnel h2d flip)
    dev = {mb: jax.device_put(t) for mb, t in operands.items()}
    idx_dev = jax.device_put(base_idx)

    results = []

    def timeit(name, fn, *fn_args, probes_per_round=n_probes):
        jfn = jax.jit(fn)
        out = jfn(*fn_args)
        t0 = time.perf_counter()
        _ = float(out)  # compile+first exec forced by readback
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(jfn(*fn_args))
        wall = time.perf_counter() - t0
        rate = probes_per_round * rounds / wall
        results.append(
            {
                "exp": name,
                "wall_s": round(wall, 4),
                "mprobes_per_s": round(rate / 1e6, 1),
                "compile_s": round(compile_s, 1),
            }
        )
        print(json.dumps(results[-1]), flush=True)
        return rate

    PRIME = np.int32(2654435761 & 0x7FFFFFFF)

    def make_flat_elem(mask):
        def f(table, idx):
            flat = table.reshape(-1)

            def body(i, acc):
                j = ((idx + i * PRIME) & mask).astype(jnp.int32)
                return acc + jnp.sum(jnp.take(flat, j)[:: per_col // 2])

            return lax.fori_loop(0, rounds, body, jnp.int32(0))

        return f

    def make_flat_row(mask, mode):
        def f(table, idx):
            def body(i, acc):
                j = ((idx + i * PRIME) & mask).astype(jnp.int32)
                rows = (
                    jnp.take(table, j, axis=0)
                    if mode == "clip"
                    else table.at[j].get(mode="promise_in_bounds")
                )
                return acc + jnp.sum(rows[:: per_col // 2, 0])

            return lax.fori_loop(0, rounds, body, jnp.int32(0))

        return f

    def make_batched_row(mask):
        """The fused-transform form: [C, N] indices -> [C, N, 8] rows,
        per-slot compare/select chain like BatchedStash.encode_dev."""

        def f(table, idx):
            idx2 = idx.reshape(cols, per_col)

            def body(i, acc):
                j = ((idx2 + i * PRIME) & mask).astype(jnp.int32)
                rows = jnp.take(table, j, axis=0)  # [C, N, 8]
                out = jnp.zeros(idx2.shape, jnp.int32)
                v = idx2.astype(jnp.int32)
                for s in range(4):
                    hit = (rows[..., s] == v) & (rows[..., 4 + s] >= 0)
                    out = jnp.where(hit, rows[..., 4 + s], out)
                return acc + jnp.sum(out[:, :: per_col // 2])

            return lax.fori_loop(0, rounds, body, jnp.int32(0))

        return f

    # calibration: fixed flat row gather over the 32 MB operand
    nb32 = operands[32].shape[0]
    cal = timeit(
        "calibration_flat_row_32MB", make_flat_row(np.int32(nb32 - 1), "clip"),
        dev[32], idx_dev,
    )

    for mb in (32, 192, 768):
        nb = operands[mb].shape[0]
        mask_row = np.int32(nb - 1)
        mask_elem = np.int32(nb * 8 - 1)
        timeit(f"flat_elem_{mb}MB", make_flat_elem(mask_elem), dev[mb], idx_dev)
        timeit(f"flat_row8_{mb}MB", make_flat_row(mask_row, "clip"), dev[mb], idx_dev)
        timeit(
            f"flat_row8_inbounds_{mb}MB",
            make_flat_row(mask_row, "promise_in_bounds"),
            dev[mb],
            idx_dev,
        )
        timeit(f"batched_row8_{cols}col_{mb}MB", make_batched_row(mask_row), dev[mb], idx_dev)

    print(
        json.dumps(
            {
                "metric": "gather_probe",
                "calibration_mprobes_per_s": round(cal / 1e6, 1),
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
