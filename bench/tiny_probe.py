"""Probe: VPU compare-select encode for TINY vocabularies vs gather probes.

Hypothesis: the device transform is addressing-rate bound (~180 M gather
probes/s, kernels/README.md) while the VPU idles. A vocabulary of v keys
can be encoded WITHOUT the gather unit: broadcast-compare the [C, N] value
stream against the [C, v] key matrix and max-reduce the matching codes —
pure elementwise work that XLA fuses into a loop over v. If the crossover
v* where compare-select matches 2 cuckoo row-gathers is large enough,
every tiny column moves OFF the gather unit and the remaining columns'
probes get the whole addressing budget. On the Criteo-TB cardinality
profile, 11 of 26 columns have <2.3K distinct ids.

Method: in-process fori_loop jits forced by scalar readback (dispatch
timing lies on the axon tunnel). One JSON line per experiment; rate is
reported per LOOKUP (row-column), not per probe.

Usage: python bench/tiny_probe.py
"""

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


ROUNDS = int(os.environ.get("NVT_PROBE_ROUNDS", 8))
N = int(os.environ.get("NVT_PROBE_N", 1 << 18))  # rows (matches bench batches)
C = int(os.environ.get("NVT_PROBE_C", 8))  # columns per experiment


def timeit(name, fn, *fn_args, lookups=None, results=None):
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
    if lookups:
        rec["mlookups_per_s"] = round(lookups * ROUNDS / wall / 1e6, 1)
    if results is not None:
        results.append(rec)
    print(json.dumps(rec), flush=True)
    return wall


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from nvtabular_tpu.ops.lookup import BatchedCuckoo, build_cuckoo

    rng = np.random.default_rng(0)
    results = []

    # shared value stream: C columns x N rows of int31 ids
    vals = rng.integers(0, 1 << 30, (C, N), dtype=np.int32)
    vals_dev = jax.device_put(vals)
    miss_dev = jax.device_put(np.full((C, N), 2, dtype=np.int32))
    PRIME = np.int32(2654435761 & 0x7FFFFFFF)

    v_sweep = tuple(
        int(x) for x in os.environ.get("NVT_PROBE_V", "64,512,2048,4096,8192").split(",")
    )
    for v in v_sweep:
        keys = np.stack(
            [rng.choice(1 << 30, size=v, replace=False).astype(np.int32) for _ in range(C)]
        )
        codes = np.tile(np.arange(v, dtype=np.int32) + 3, (C, 1))
        kc = np.stack([keys, codes], axis=-1)  # [C, v, 2]
        kc_dev = jax.device_put(kc)

        def make_tiny():
            def f(kc_arr, vv, m):
                k = kc_arr[..., 0]  # [C, v]
                c = kc_arr[..., 1]

                def body(i, acc):
                    x = vv + i  # perturb so XLA cannot hoist
                    eq = x[:, :, None] == k[:, None, :]
                    cand = jnp.where(eq, c[:, None, :], -1)
                    out = jnp.max(cand, axis=-1)
                    out = jnp.where(out >= 0, out, m)
                    return acc + jnp.sum(out[:, :: N // 2])

                return lax.fori_loop(0, ROUNDS, body, jnp.int32(0))

            return f

        timeit(
            f"tiny_compare_v{v}",
            make_tiny(),
            kc_dev,
            vals_dev,
            miss_dev,
            lookups=C * N,
            results=results,
        )

        # cuckoo baseline at the same vocab sizes (C tables in one bin)
        luts = [
            build_cuckoo(np.sort(keys[i]).astype(np.int64), codes[i]) for i in range(C)
        ]
        blut = BatchedCuckoo(luts)
        concat_dev = jax.device_put(blut.concat)
        sel = np.arange(C, dtype=np.int64)

        def make_cuckoo():
            def f(concat, vv, m):
                def body(i, acc):
                    out = blut.encode_dev(concat, vv + i, m, sel=sel)
                    return acc + jnp.sum(out[:, :: N // 2])

                return lax.fori_loop(0, ROUNDS, body, jnp.int32(0))

            return f

        timeit(
            f"cuckoo_v{v}",
            make_cuckoo(),
            concat_dev,
            vals_dev,
            miss_dev,
            lookups=C * N,
            results=results,
        )

    print(json.dumps({"metric": "tiny_probe", "results": results}))


if __name__ == "__main__":
    main()
