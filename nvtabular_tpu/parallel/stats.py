"""SPMD statistics primitives: psum-reduced moments over a device mesh.

The TPU replacement for the reference's dask tree-reduction of per-partition
{count, sum, sum²} (reference nvtabular/ops/moments.py:28-116 with
split_every=32 fan-in): each device computes partials over its batch shard,
one ``psum`` over the mesh reduces them — XLA compiles the reduction onto
ICI (SURVEY §2.8 P2). Used by Normalize/Standardize-style fits when data is
already device-resident, and by the multi-host fit to combine per-host
accumulators.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np


def sharded_moments(x, mesh, axis: str = "data") -> Dict[str, np.ndarray]:
    """Global {count,mean,var,std,min,max} of ``x`` sharded over ``axis``.

    x: [rows, cols] float array (device-resident, rows sharded over the
    mesh axis). NaNs are ignored (null semantics). Returns host floats.
    Variance uses ddof=1 like the reference (moments.py:107-116).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    x = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(axis, None)))

    spec = P(axis, None)
    out_spec = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(out_spec,) * 5,
    )
    def local_then_psum(xs):
        valid = ~jnp.isnan(xs)
        xz = jnp.where(valid, xs, 0.0)
        count = jax.lax.psum(jnp.sum(valid, axis=0).astype(jnp.float32), axis)
        s = jax.lax.psum(jnp.sum(xz, axis=0), axis)
        s2 = jax.lax.psum(jnp.sum(xz * xz, axis=0), axis)
        mn = jax.lax.pmin(jnp.min(jnp.where(valid, xs, jnp.inf), axis=0), axis)
        mx = jax.lax.pmax(jnp.max(jnp.where(valid, xs, -jnp.inf), axis=0), axis)
        return count, s, s2, mn, mx

    count, s, s2, mn, mx = jax.jit(local_then_psum)(x)
    count = np.asarray(count, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    mean = np.divide(s, count, out=np.zeros_like(s), where=count > 0)
    # ddof=1 with 0-division guards (reference moments.py:107-116)
    denom = np.maximum(count - 1.0, 1.0)
    var = np.maximum((s2 - count * mean * mean) / denom, 0.0)
    return {
        "count": count,
        "mean": mean,
        "var": var,
        "std": np.sqrt(var),
        "min": np.asarray(mn, dtype=np.float64),
        "max": np.asarray(mx, dtype=np.float64),
    }
