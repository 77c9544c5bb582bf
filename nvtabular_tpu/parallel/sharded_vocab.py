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
from typing import Any, Dict, List, Tuple

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
    flat, shard_len, ndev, overflow = _exchange_sort_pass(
        keys, mesh, axis, capacity_factor
    )
    counts: Dict[int, int] = {}
    for d in range(ndev):
        seg = flat[d * shard_len : (d + 1) * shard_len]
        seg = seg[seg != _PAD]
        if len(seg) == 0:
            continue
        vals, cnts = _run_length(seg)
        for v, c in zip(vals, cnts):
            counts[int(v)] = int(c)
    return counts, overflow


def _exchange_sort_pass(
    keys: np.ndarray, mesh, axis: str = "data", capacity_factor: float = 2.5
):
    """The SPMD kernel shared by the dict- and array-returning counters:
    hash-route keys to owner devices through ONE all_to_all, sort each
    owner's received shard. Returns (flat sorted shards, per-shard length,
    ndev, overflow)."""
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
    shard_len = ndev * cap
    flat = np.asarray(sorted_shards)
    return flat, shard_len, ndev, int(np.asarray(overflow)[0])


def sharded_value_counts_arrays(
    keys: np.ndarray,
    mesh,
    axis: str = "data",
    capacity_factor: float = 2.5,
    max_retries: int = 6,
) -> Tuple[np.ndarray, np.ndarray]:
    """`sharded_value_counts` returning (values, counts) int64 ARRAYS with
    automatic overflow retry — the mesh-fit form (a python dict per
    multi-million-key vocab would dominate the fit wall-clock).

    The run-length encode is ONE vectorized pass over the concatenated
    per-owner sorted shards: owners hold DISJOINT key sets, so a key never
    spans a shard boundary and boundaries-where-value-changes is exact
    without a global sort."""
    factor = capacity_factor
    for _ in range(max_retries):
        flat, _shard_len, _ndev, overflow = _exchange_sort_pass(keys, mesh, axis, factor)
        if overflow == 0:
            flat = flat[flat != _PAD]  # pads sort last within each shard
            if len(flat) == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            vals, cnts = _run_length(flat)
            return vals.astype(np.int64), cnts.astype(np.int64)
        factor *= 2
    raise RuntimeError(
        f"sharded_value_counts still overflowing at capacity_factor={factor}"
    )


def sharded_value_counts_exact(
    keys: np.ndarray,
    mesh,
    axis: str = "data",
    capacity_factor: float = 2.5,
    max_retries: int = 6,
) -> Dict[int, int]:
    """`sharded_value_counts` with automatic overflow retry: power-law key
    popularity hash-buckets unevenly, so the fixed per-owner send capacity
    can overflow — each retry doubles the capacity factor (worst case one
    owner receives EVERY key: factor reaches ndev). Counts stay exact."""
    factor = capacity_factor
    for _ in range(max_retries):
        counts, overflow = sharded_value_counts(keys, mesh, axis, factor)
        if overflow == 0:
            return counts
        factor *= 2
    raise RuntimeError(
        f"sharded_value_counts still overflowing at capacity_factor={factor}"
    )


def _owner_of_int64(keys: np.ndarray, nproc: int) -> np.ndarray:
    """Deterministic owner process for each int64 key (host-side mix of the
    same finalizer family as `_mix32`)."""
    h = keys.astype(np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return (h % np.uint64(nproc)).astype(np.int64)


def exchange_keyed_rows(lanes: np.ndarray, owner: np.ndarray) -> np.ndarray:
    """Generic multi-process row exchange: row ``i`` of ``lanes`` (int32,
    shape [n, L]) is delivered to process ``owner[i]``; returns this
    process's received rows [m, L] (arbitrary order).

    The collective backbone shared by the vocab count exchange AND the
    TE/JoinGroupby keyed-stats exchange (VERDICT r2 #4): callers pack
    (key, payload-vector) rows as int32 lanes, owners aggregate what they
    receive. Capacity is EXACT — per-(src, dst) lengths are allgathered up
    front, so skewed key->owner distributions never overflow."""
    import jax

    nproc = jax.process_count()
    lanes = np.ascontiguousarray(lanes, dtype=np.int32)
    if lanes.ndim != 2:
        raise ValueError("lanes must be [n, L]")
    n, L = lanes.shape
    if nproc == 1:
        return lanes

    import jax.numpy as jnp  # noqa: F401 (jax initialized for the mesh)
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rank = jax.process_index()
    owner = np.asarray(owner, dtype=np.int64)
    order = np.argsort(owner, kind="stable")
    lanes_sorted = lanes[order]
    owner_sorted = owner[order]
    bounds = np.searchsorted(owner_sorted, np.arange(nproc + 1))
    send_lens = (bounds[1:] - bounds[:-1]).astype(np.int64)

    all_lens = np.asarray(
        multihost_utils.process_allgather(send_lens)
    ).reshape(nproc, nproc)
    cap = max(int(all_lens.max()), 1)

    send = np.zeros((nproc, cap, L), dtype=np.int32)
    for dst in range(nproc):
        lo, hi = bounds[dst], bounds[dst + 1]
        if hi > lo:
            send[dst, : hi - lo] = lanes_sorted[lo:hi]

    per_proc: List[Any] = [None] * nproc
    for d in sorted(jax.devices(), key=lambda d: (d.process_index, d.id)):
        if per_proc[d.process_index] is None:
            per_proc[d.process_index] = d
    mesh = Mesh(np.array(per_proc), ("hosts",))

    garr = multihost_utils.host_local_array_to_global_array(send, mesh, P("hosts"))

    @partial(shard_map, mesh=mesh, in_specs=(P("hosts"),), out_specs=P("hosts"))
    def a2a(x):
        return jax.lax.all_to_all(x, "hosts", split_axis=0, concat_axis=0)

    out = jax.jit(a2a)(garr)
    recv = np.concatenate([np.asarray(s.data) for s in out.addressable_shards])

    pieces = [recv[src, : int(all_lens[src, rank])] for src in range(nproc)]
    pieces = [p for p in pieces if len(p)]
    if not pieces:
        return np.empty((0, L), dtype=np.int32)
    return np.concatenate(pieces)


def pack_i64_lanes(arr: np.ndarray) -> np.ndarray:
    """int64/float64 [n] -> int32 [n, 2] lanes (bit-preserving)."""
    return np.ascontiguousarray(arr).view(np.int32).reshape(-1, 2)


def unpack_i64_lanes(lanes: np.ndarray, dtype) -> np.ndarray:
    """int32 [n, 2] lanes -> [n] of int64/float64 (bit-preserving)."""
    return np.ascontiguousarray(lanes).view(np.dtype(dtype)).reshape(-1)


def exchange_partial_counts(
    keys: np.ndarray, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-process exact reduction of per-host partial (key → count)
    tables via ONE mesh all-to-all — the TPU-native replacement for
    pickling whole per-host accumulators through an allgather
    (O(hosts × vocab) received per host; reference distributes this with a
    dask shuffled groupby, nvtabular/ops/categorify.py:1344-1540).

    Each process passes its LOCAL unique int64 keys and their partial
    counts. Keys are hash-partitioned over processes; each (key, count)
    pair is sent only to its owner, owners sum their received partials.
    Returns this process's OWNED merged shard (keys, counts) — key sets
    are disjoint across processes; allgather the small shards to
    reassemble the full table.

    Capacity is EXACT (per-destination lengths are allgathered up front),
    so arbitrarily skewed key→owner distributions never overflow — unlike
    the fixed-capacity single-controller fast path in
    ``sharded_value_counts``.
    """
    import jax

    nproc = jax.process_count()
    keys = np.asarray(keys, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if nproc == 1:
        return keys, counts

    lanes = np.hstack([pack_i64_lanes(keys), pack_i64_lanes(counts)])
    recv = exchange_keyed_rows(lanes, _owner_of_int64(keys, nproc))
    if len(recv) == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    all_k = unpack_i64_lanes(recv[:, :2], np.int64)
    all_c = unpack_i64_lanes(recv[:, 2:], np.int64)
    # groupby-sum: each key appears at most once per source process
    order = np.argsort(all_k, kind="stable")
    sk = all_k[order]
    sc = all_c[order]
    starts = np.empty(len(sk), dtype=bool)
    starts[0] = True
    starts[1:] = sk[1:] != sk[:-1]
    idx = np.nonzero(starts)[0]
    return sk[idx], np.add.reduceat(sc, idx)


def _run_length(sorted_arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    boundaries = np.empty(len(sorted_arr), dtype=bool)
    boundaries[0] = True
    boundaries[1:] = sorted_arr[1:] != sorted_arr[:-1]
    starts = np.nonzero(boundaries)[0]
    vals = sorted_arr[starts]
    ends = np.append(starts[1:], len(sorted_arr))
    return vals, ends - starts


def exchange_partial_string_counts(
    values, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-process exact reduction of per-host partial (STRING key →
    count) tables — the string-key counterpart of
    ``exchange_partial_counts``. Each host's unique strings pack into
    fixed-width int32 lanes (bytes padded to the allgathered max length,
    plus length and count lanes) and ride the same
    ``exchange_keyed_rows`` all-to-all, hash-partitioned by a vectorized
    FNV-1a over the utf-8 bytes; owners aggregate received pairs. Returns
    this process's OWNED merged shard (object-dtype strings, int64
    counts) — key sets are disjoint across processes (reference shuffles
    string uniques through the same hash-partitioned dask shuffle,
    nvtabular/ops/categorify.py:1036-1049).

    Per-host traffic is O(vocab-bytes) instead of the whole-accumulator
    pickle allgather's O(hosts × vocab-bytes)."""
    import jax

    from .multihost import allgather_pyobj

    nproc = jax.process_count()
    counts = np.asarray(counts, dtype=np.int64)
    if nproc == 1:
        return np.asarray(values, dtype=object), counts

    enc = [
        v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values
    ]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    local_max = int(lens.max()) if len(lens) else 0
    max_len = max(allgather_pyobj(local_max))
    width = max(4, -(-max_len // 4) * 4)  # pad bytes to whole int32 lanes
    mat = np.zeros((len(enc), width), dtype=np.uint8)
    for i, b in enumerate(enc):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)

    # vectorized FNV-1a 64 over the byte columns (identical on every host)
    with np.errstate(over="ignore"):
        h = np.full(len(enc), 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(max_len):
            hj = (h ^ mat[:, j].astype(np.uint64)) * prime
            h = np.where(lens > j, hj, h)
        # splitmix-style finalize, then owner
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    owner = (h % np.uint64(nproc)).astype(np.int64)

    lanes = np.hstack(
        [
            np.ascontiguousarray(mat).view(np.int32),
            pack_i64_lanes(lens),
            pack_i64_lanes(counts),
        ]
    )
    recv = exchange_keyed_rows(lanes, owner)
    if len(recv) == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    lanes_w = width // 4
    bmat = np.ascontiguousarray(recv[:, :lanes_w]).view(np.uint8)
    rlens = unpack_i64_lanes(recv[:, lanes_w : lanes_w + 2], np.int64)
    rcnts = unpack_i64_lanes(recv[:, lanes_w + 2 : lanes_w + 4], np.int64)
    agg: Dict[bytes, int] = {}
    for i in range(len(recv)):
        key = bmat[i, : rlens[i]].tobytes()
        agg[key] = agg.get(key, 0) + int(rcnts[i])
    out_vals = np.array([k.decode("utf-8") for k in agg], dtype=object)
    out_cnts = np.fromiter(agg.values(), dtype=np.int64, count=len(agg))
    return out_vals, out_cnts
