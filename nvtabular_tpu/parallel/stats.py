"""SPMD statistics primitives: sharded moments over a device mesh.

The TPU replacement for the reference's dask tree-reduction of per-partition
{count, sum, sum²} (reference nvtabular/ops/moments.py:28-116 with
split_every=32 fan-in): each device computes conditioned partial moments
over its batch shard inside one shard_map program; the tiny [n_shards, cols]
partials are combined on host in float64 with Chan's parallel algorithm.
Used by Normalize/Standardize-style fits when data is already
device-resident, and by the multi-host fit to combine per-host accumulators
(SURVEY §2.8 P2).

Numerics: counts are integer (exact past 2^24 rows, where a float32 count
would start dropping increments), and per-shard variance is accumulated as
M2 = Σ(x − local_mean)² rather than Σx² − n·mean² — the latter cancels
catastrophically in float32 for large low-variance columns. Cross-shard
combination runs in float64 on host.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np


def sharded_moments(x, mesh, axis: str = "data") -> Dict[str, np.ndarray]:
    """Global {count,mean,var,std,min,max} of ``x`` sharded over ``axis``.

    x: [rows, cols] float array (device-resident, rows sharded over the
    mesh axis). NaNs are ignored (null semantics). Returns host float64.
    Variance uses ddof=1 like the reference (moments.py:107-116).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    x = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(axis, None)))

    spec = P(axis, None)
    out_spec = P(axis, None)  # per-shard partial rows, concatenated

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(out_spec,) * 5,
    )
    def local_partials(xs):
        valid = ~jnp.isnan(xs)
        count = jnp.sum(valid, axis=0, dtype=jnp.int32)
        xz = jnp.where(valid, xs, 0.0)
        denom = jnp.maximum(count, 1).astype(xs.dtype)
        mean = jnp.sum(xz, axis=0) / denom
        # shifted second moment: conditioned even when |mean| >> std
        d = jnp.where(valid, xs - mean, 0.0)
        m2 = jnp.sum(d * d, axis=0)
        mn = jnp.min(jnp.where(valid, xs, jnp.inf), axis=0)
        mx = jnp.max(jnp.where(valid, xs, -jnp.inf), axis=0)
        return count[None], mean[None], m2[None], mn[None], mx[None]

    counts, means, m2s, mns, mxs = jax.jit(local_partials)(x)
    counts = np.asarray(counts, dtype=np.int64)  # [n_shards, cols]
    means = np.asarray(means, dtype=np.float64)
    m2s = np.asarray(m2s, dtype=np.float64)

    # Chan et al. pairwise combination, folded left in float64
    count = counts[0].astype(np.float64)
    mean = means[0].copy()
    m2 = m2s[0].copy()
    for i in range(1, counts.shape[0]):
        nb = counts[i].astype(np.float64)
        n = count + nb
        safe_n = np.maximum(n, 1.0)
        delta = means[i] - mean
        mean = mean + delta * nb / safe_n
        m2 = m2 + m2s[i] + delta * delta * count * nb / safe_n
        count = n

    mean = np.where(count > 0, mean, 0.0)
    # ddof=1 with 0-division guards (reference moments.py:107-116)
    denom = np.maximum(count - 1.0, 1.0)
    var = np.maximum(m2 / denom, 0.0)
    return {
        "count": count,
        "mean": mean,
        "var": var,
        "std": np.sqrt(var),
        "min": np.asarray(mns, dtype=np.float64).min(axis=0),
        "max": np.asarray(mxs, dtype=np.float64).max(axis=0),
    }
