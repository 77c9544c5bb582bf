"""Device lookup attribution probe (real TPU via the axon tunnel).

Two experiments, both in-process fori_loop jits forced by scalar readback
(dispatch timing lies on the tunnel — see kernels/README.md):

1. size ladder: 8-wide and 16-wide row-gather rate vs operand MB — locates
   the fast/slow cache cliff that sets NVT_BATCHED_CONCAT_LIMIT.
2. real-bin attribution: fits the headline bench workload, then times each
   size-capped bin's BatchedStash.encode_dev separately with the bench's
   own power-law id stream — attributes the fused transform's device time
   to bins, stash probes, and conts.

Usage: python bench/lookup_probe.py [--ladder-only | --bins-only]
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


ROUNDS = 8


def timeit(name, fn, *fn_args, probes=None, results=None):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*fn_args)
    t0 = time.perf_counter()
    _ = float(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(jfn(*fn_args))
    wall = time.perf_counter() - t0
    rec = {"exp": name, "wall_s": round(wall, 4), "compile_s": round(compile_s, 1)}
    if probes:
        rec["mprobes_per_s"] = round(probes * ROUNDS / wall / 1e6, 1)
    if results is not None:
        results.append(rec)
    print(json.dumps(rec), flush=True)
    return wall


def run_ladder(results):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    n_probes = 1 << 21  # 2M per round
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, 1 << 30, n_probes, dtype=np.int32))
    PRIME = np.int32(2654435761 & 0x7FFFFFFF)

    sizes_mb = [4, 16, 32, 48, 64, 96, 128, 192]
    tables = {}
    for mb in sizes_mb:
        for width in (8, 16):
            nb = (mb << 20) // (4 * width)
            tables[(mb, width)] = jax.device_put(
                np.zeros((nb, width), dtype=np.int32)
            )

    def make(mask):
        def f(table, ix):
            def body(i, acc):
                j = ((ix + i * PRIME) & mask).astype(jnp.int32)
                rows = jnp.take(table, j, axis=0)
                return acc + jnp.sum(rows[:: n_probes // 2, 0])

            return lax.fori_loop(0, ROUNDS, body, jnp.int32(0))

        return f

    for (mb, width), tab in tables.items():
        nb = tab.shape[0]
        timeit(
            f"row{width}_{mb}MB",
            make(np.int32(nb - 1)),
            tab,
            idx,
            probes=n_probes,
            results=results,
        )


def run_bins(results):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import bench as B
    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.table import TableBatch

    parts = [TableBatch.from_pydict(B.make_part(s)) for s in range(2)]
    dataset = nvt.Dataset(parts)
    cats = [f"C{i}" for i in range(B.NUM_CATS)] >> ops.Categorify(
        max_size=10_000_000
    )
    wf = nvt.Workflow(cats)
    t0 = time.perf_counter()
    wf.fit(dataset)
    print(
        json.dumps({"exp": "fit", "wall_s": round(time.perf_counter() - t0, 1)}),
        flush=True,
    )
    catop = next(n.op for n in wf.graph.nodes if isinstance(n.op, ops.Categorify))
    batched = catop._get_batched()

    # the bench's own id stream, one batch worth, as a [C, N] stack per bin
    batch = parts[0]
    PRIME = np.int32(2654435761 & 0x7FFFFFFF)

    for bkey in sorted(batched):
        blut, row_index = batched[bkey]
        names = []
        for vkey in row_index:
            # vocab key "C3" or group key — bench uses plain column names
            if vkey in batch.columns:
                names.append((vkey, row_index[vkey]))
        names.sort(key=lambda t: t[1])
        vals = np.stack([np.asarray(batch[c].values) for c, _ in names])
        sel = np.array([i for _, i in names], dtype=np.int64)
        miss = np.full(vals.shape, 2, dtype=np.int32)
        concat_dev = jax.device_put(blut.concat)
        stash_dev = (
            jax.device_put(blut.stash_concat)
            if hasattr(blut, "stash_concat")
            else None
        )
        vals_dev = jax.device_put(vals)
        miss_dev = jax.device_put(miss)
        C, N = vals.shape

        from nvtabular_tpu.ops.lookup import BatchedStash as _BStash

        def make_bin(full):
            def f(concat, stash, v, m):
                def body(i, acc):
                    vv = v + i  # perturb so XLA cannot hoist the gathers
                    if full:
                        kw = {"stash_dev": stash} if isinstance(blut, _BStash) else {}
                        codes = blut.encode_dev(concat, vv, m, sel=sel, **kw)
                    else:  # primary gather only: stash probes skipped
                        import nvtabular_tpu.ops.lookup as L

                        u = vv.view(jnp.uint32)
                        nbps = blut.nbps[sel]
                        row_offs = jnp.asarray(blut.row_offs[sel])[:, None]
                        pmask = jnp.asarray((nbps - 1).astype(np.uint32))[:, None]
                        b = (L._mix32_jnp(u, 0) & pmask).astype(jnp.int32) + row_offs
                        rows = jnp.take(concat, b, axis=0)
                        codes = rows[..., 4]
                    return acc + jnp.sum(codes[:, :: N // 2])

                return lax.fori_loop(0, ROUNDS, body, jnp.int32(0))

            return f

        mb = blut.concat.nbytes >> 20
        timeit(
            f"bin_{bkey}_{C}col_{mb}MB_full",
            make_bin(True),
            concat_dev,
            stash_dev,
            vals_dev,
            miss_dev,
            probes=C * N,
            results=results,
        )
        if isinstance(blut, _BStash):
            timeit(
                f"bin_{bkey}_{C}col_{mb}MB_primary_only",
                make_bin(False),
                concat_dev,
                stash_dev,
                vals_dev,
                miss_dev,
                probes=C * N,
                results=results,
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder-only", action="store_true")
    ap.add_argument("--bins-only", action="store_true")
    args = ap.parse_args()
    _enable_compile_cache()
    results = []
    if not args.bins_only:
        run_ladder(results)
    if not args.ladder_only:
        run_bins(results)
    print(json.dumps({"metric": "lookup_probe", "results": results}))


if __name__ == "__main__":
    main()
