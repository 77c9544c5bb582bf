"""SPMD distributed value-counts: the pod-scale vocabulary build.

The reference builds Categorify vocabularies with a dask task graph:
per-partition groupby → hash ``shuffle_group`` across split_out shards →
tree re-aggregation (reference nvtabular/ops/categorify.py:955-1137,
1344-1540). The TPU-native equivalent is one SPMD program over the mesh
(SURVEY §2.8 P3):

1. each device hashes its local keys → owner device;
2. keys are bucketed into a fixed-capacity per-owner send buffer
   (static shapes — the overflow count is returned so the caller can
   retry with a bigger capacity, the price of SPMD vs dynamic dask tasks);
3. ONE ``jax.lax.all_to_all`` rides ICI to deliver every key to its owner;
4. each owner sorts its received keys (device sort, SPMD);
5. the host run-length-encodes each owner's sorted shard — key sets are
   disjoint by construction, so the global merge is a concat.

Exactness: every key lands on exactly one owner, so counts are exact (not
sketched). Used for device-resident vocab builds and as the collective
backbone of multi-host fit.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np

_PAD = np.int32(np.iinfo(np.int32).max)  # sorts last


def _mix32(x, ndev):
    import jax.numpy as jnp

    h = x.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(ndev)).astype(jnp.int32)


def sharded_value_counts(
    keys: np.ndarray, mesh, axis: str = "data", capacity_factor: float = 2.5
) -> Tuple[Dict[int, int], int]:
    """Exact global (key → count) of int32 ``keys`` via mesh all-to-all.

    Returns (counts dict, overflow) — overflow > 0 means the per-owner
    send capacity was exceeded (badly skewed hashing); retry with a larger
    ``capacity_factor``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    ndev = mesh.shape[axis]
    keys = np.asarray(keys, dtype=np.int32)
    # pad to a multiple of ndev with PAD (routed but ignored)
    n_total = len(keys)
    per_dev = -(-n_total // ndev)
    padded = np.full(per_dev * ndev, _PAD, dtype=np.int32)
    padded[:n_total] = keys
    cap = max(int(np.ceil(per_dev * capacity_factor / ndev)), 8)

    x = jax.device_put(
        jnp.asarray(padded), NamedSharding(mesh, P(axis))
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis), P(axis)),
    )
    def exchange_and_sort(local):
        n = local.shape[0]
        is_pad = local == _PAD
        owner = jnp.where(is_pad, jnp.int32(0), _mix32(local, ndev))
        onehot = (
            owner[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, ndev), 1)
        ).astype(jnp.int32)
        # rank of each key within its owner bucket (exclusive prefix count)
        rank = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
        overflow = jnp.sum((rank >= cap) & ~is_pad)
        # pads and overflowing keys route out of bounds → dropped by scatter
        row = jnp.where(is_pad | (rank >= cap), ndev, owner)
        send = jnp.full((ndev + 1, cap), _PAD, dtype=jnp.int32)
        send = send.at[row, jnp.minimum(rank, cap - 1)].set(
            jnp.where(is_pad, _PAD, local), mode="drop"
        )
        send = send[:ndev]
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
        sorted_keys = jnp.sort(recv.reshape(-1))
        total_overflow = jax.lax.psum(overflow, axis)
        return sorted_keys, jnp.broadcast_to(total_overflow, (1,))

    sorted_shards, overflow = jax.jit(exchange_and_sort)(x)
    # host: run-length encode each owner's sorted shard (disjoint key sets)
    shard_len = ndev * cap
    flat = np.asarray(sorted_shards)
    counts: Dict[int, int] = {}
    for d in range(ndev):
        seg = flat[d * shard_len : (d + 1) * shard_len]
        seg = seg[seg != _PAD]
        if len(seg) == 0:
            continue
        vals, cnts = _run_length(seg)
        for v, c in zip(vals, cnts):
            counts[int(v)] = int(c)
    return counts, int(np.asarray(overflow)[0])


def _run_length(sorted_arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    boundaries = np.empty(len(sorted_arr), dtype=bool)
    boundaries[0] = True
    boundaries[1:] = sorted_arr[1:] != sorted_arr[:-1]
    starts = np.nonzero(boundaries)[0]
    vals = sorted_arr[starts]
    ends = np.append(starts[1:], len(sorted_arr))
    return vals, ends - starts
