"""Device-side exact dictionary lookup — the hot kernel of Categorify.

Why not binary search: XLA lowers ``jnp.searchsorted`` to a serial
while-loop of dependent gathers (~73 ms per 512K-row column on v5e — 20x
slower than one gather). Random-access gathers on TPU run at a fixed ~0.1G
rows/s regardless of row width or table size, so the optimal lookup does
exactly ONE gather when possible and never more than two:

* ``TinyLookup`` — vocabularies of ≤ _TINY_MAX keys skip the gather unit
  entirely: a VPU broadcast-compare against all keys + max-reduce of the
  matching codes (measured faster than 2 gather-probes up to ~6K keys on
  v5e, AND it frees the gather unit for the fused big-vocab columns).
* ``DirectLookup`` — when the vocabulary's integer key range is compact,
  a dense ``table[key - min]`` array gives one element-gather per query.
* ``CuckooLookup`` — arbitrary int32 keys: bucketed cuckoo hash table
  (4-slot buckets, 2 hash choices) built host-side at fit; each bucket is
  one packed 8-wide int32 row ``[k0..k3, v0..v3]``, so a probe is one
  row-gather + 4 VPU compares; membership is guaranteed in one of the two
  candidate buckets → exactly 2 row-gathers per query.

The reference's equivalents are cudf merge joins / ``searchsorted``
(reference nvtabular/ops/categorify.py:1732-1795) and the C++ serving
``std::unordered_map`` probe (cpp/nvtabular/inference/categorify.cc:146-166).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# direct table budget: dense map allowed up to this many entries, or 8x the
# vocab size if that is larger (always worth it vs. 2x cuckoo gathers)
_DIRECT_MAX_RANGE = 1 << 22

_BUCKET_SLOTS = 4
_EMPTY = np.int32(-1)  # empty slot marker in the val lane (codes are >= 2)

_MIX1 = np.uint32(0x85EBCA6B)
_MIX2 = np.uint32(0xC2B2AE35)
_SEED2 = np.uint32(0x9E3779B9)
_SEED3 = np.uint32(0x68E31DA4)  # stash hashes (independent of primary)
_SEED4 = np.uint32(0xB5297A4D)


def _mix32_np(x: np.ndarray, seed: np.uint32) -> np.ndarray:
    """Murmur3 finalizer over uint32 (numpy build-side)."""
    h = x.astype(np.uint32) ^ seed
    h ^= h >> np.uint32(16)
    h *= _MIX1
    h ^= h >> np.uint32(13)
    h *= _MIX2
    h ^= h >> np.uint32(16)
    return h


def _mix32_jnp(x, seed):
    import jax.numpy as jnp

    h = x.astype(jnp.uint32) ^ jnp.uint32(seed)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


# compare-select threshold: vocabularies at or below this many keys encode
# on the VPU (broadcast compare + max-reduce) instead of the gather unit.
# Measured on v5e (bench/tiny_probe.py, 256K-row batches, 8 columns):
#   v=64: 449 M lookups/s   v=512: 337 M/s   v=2048: 248 M/s
#   v=4096: 168 M/s         v=8192: 91 M/s   (2-probe cuckoo: ~135 M/s flat)
# Crossover ~6K; 4096 is kept as the default because compare-select also
# runs on an otherwise-idle unit — every tiny column moved off the gather
# unit gives its addressing budget to the big-vocab columns it is fused
# with (the transform is gather-rate bound, kernels/README.md).
import os as _os

_TINY_MAX = int(_os.environ.get("NVT_TINY_LOOKUP_MAX", 4096))


class TinyLookup:
    """VPU compare-select map for tiny vocabularies: codes are found by
    broadcast-comparing the value stream against ALL keys and max-reducing
    the matching code — zero gather-unit work, exact for arbitrary int32
    keys. Cost scales with vocab size; ``build_lookup`` gates it at
    ``_TINY_MAX`` keys (see the measured ladder above)."""

    __slots__ = ("keys", "codes", "_packed")

    def __init__(self, keys: np.ndarray, codes: np.ndarray):
        order = np.argsort(keys, kind="stable")  # sorted for encode_np
        self.keys = keys[order].astype(np.int32)
        self.codes = codes[order].astype(np.int32)
        # built once: device-state caches are keyed on host-array IDENTITY
        # (dag/executor.py), so host_table must return a stable object
        self._packed = np.stack([self.keys, self.codes], axis=1)

    @property
    def host_table(self) -> np.ndarray:
        """[v, 2] packed (key, code) rows — the device-state payload."""
        return self._packed

    @property
    def nbytes(self) -> int:
        return self.keys.nbytes + self.codes.nbytes

    def encode_np(self, values: np.ndarray, miss_codes) -> np.ndarray:
        v32 = values.astype(np.int32)
        pos = np.searchsorted(self.keys, v32, side="left")
        pos_c = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos_c] == v32
        out = np.asarray(miss_codes).astype(np.int32)
        if out.ndim == 0:
            out = np.full(v32.shape, out, dtype=np.int32)
        return np.where(hit, self.codes[pos_c], out)

    def encode_dev(self, table_dev, values, miss_codes):
        import jax.numpy as jnp

        v = values.astype(jnp.int32)
        k = table_dev[:, 0]
        c = table_dev[:, 1]
        eq = v[..., None] == k
        out = jnp.max(jnp.where(eq, c, -1), axis=-1)
        return jnp.where(out >= 0, out, jnp.asarray(miss_codes, jnp.int32))


class BatchedTiny:
    """Column-batched compare-select lookup: member vocabularies pad to the
    bin's max size and stack into ONE [C, vmax, 2] (key, code) array. The
    encode is a fused VPU compare + max-reduce over the vmax axis — no
    gather-unit traffic at all, which is the point: it composes with the
    cuckoo/direct bins' gathers instead of queueing behind them.

    Pad slots carry code -1 (never selected by the max-reduce: real codes
    are ≥ 0) and repeat the column's first key, so a pad can never
    introduce a false match with a foreign key."""

    __slots__ = ("concat", "lens")

    def __init__(self, luts):
        vmax = max(len(l.keys) for l in luts)
        C = len(luts)
        keys = np.zeros((C, vmax), dtype=np.int32)
        codes = np.full((C, vmax), -1, dtype=np.int32)
        for i, l in enumerate(luts):
            v = len(l.keys)
            keys[i, :v] = l.keys
            if v and v < vmax:
                keys[i, v:] = l.keys[0]
            codes[i, :v] = l.codes
        self.concat = np.stack([keys, codes], axis=-1)  # [C, vmax, 2]
        self.lens = np.array([len(l.keys) for l in luts], dtype=np.int32)

    def encode_dev(self, concat_dev, values, miss_codes, sel=None):
        """values [C, N] int32 → codes [C, N]; ``sel`` picks member rows."""
        import jax.numpy as jnp

        sub = concat_dev if sel is None else concat_dev[np.asarray(sel)]
        v = values.astype(jnp.int32)
        k = sub[..., 0]  # [C, vmax]
        c = sub[..., 1]
        eq = v[:, :, None] == k[:, None, :]
        out = jnp.max(jnp.where(eq, c[:, None, :], -1), axis=-1)
        return jnp.where(out >= 0, out, miss_codes)


class DirectLookup:
    """Dense direct-address map: one element-gather per query."""

    __slots__ = ("min_key", "max_key", "table")

    def __init__(self, min_key: int, max_key: int, table: np.ndarray):
        self.min_key = min_key
        self.max_key = max_key
        self.table = table  # int32, -1 = missing

    @property
    def host_table(self) -> np.ndarray:
        """The array to publish as device state / pass to encode_dev."""
        return self.table

    @property
    def nbytes(self) -> int:
        return self.table.nbytes

    def encode_np(self, values: np.ndarray, miss_codes: np.ndarray) -> np.ndarray:
        idx = np.clip(values.astype(np.int64) - self.min_key, 0, len(self.table) - 1)
        codes = self.table[idx]
        in_range = (values >= self.min_key) & (values <= self.max_key)
        hit = in_range & (codes >= 0)
        return np.where(hit, codes, miss_codes)

    def encode_dev(self, table_dev, values, miss_codes):
        import jax.numpy as jnp

        n = table_dev.shape[0]
        v = values.astype(jnp.int32)
        idx = jnp.clip(v - jnp.int32(self.min_key), 0, n - 1)
        codes = jnp.take(table_dev, idx)
        hit = (v >= jnp.int32(self.min_key)) & (v <= jnp.int32(self.max_key)) & (codes >= 0)
        return jnp.where(hit, codes, miss_codes)


class CuckooLookup:
    """Bucketed cuckoo hash table: two packed row-gathers per query.

    Round-2 v5e measurements (bench/lookup_probe.py, kernels/README.md)
    reshaped this structure:

    * 8-lane (4-slot) row-gathers run ~180 M probes/s for operands up to
      ~48 MB / 1.5M rows, then cliff to ~66 M/s; 16-lane rows are SLOWER
      at equal bytes (~120 M/s plateau). So buckets stay 4-slot/8-lane
      and every operand must stay under the cliff.
    * ``h % nb`` range reduction costs the same as ``h & (nb-1)`` on both
      numpy and XLA, so bucket counts are EXACT (ceil(n/(4*load))), not
      power-of-two — pow2 rounding inflated a 4M-key table from 45 MB to
      64 MB, right past the cliff.
    * two independent fast-regime gathers overlap (~1.15-1.35x one, not
      2x), which is why 2-probe cuckoo at load ~0.8 (10 B/key) beats the
      1-probe+stash layouts: the stash gather costs the same as the
      second cuckoo probe, but the stash layout needs ~1.5x the bytes.
    * XLA's gather emitter has a slow pocket (~74 M/s) for operands of
      roughly 230-300K rows; ``_safe_nb`` sizes around it.
    """

    __slots__ = ("packed", "nb")

    def __init__(self, packed: np.ndarray, nb: int):
        self.packed = packed  # int32 [nb, 8] = [k0..k3, v0..v3]
        self.nb = nb

    @property
    def host_table(self) -> np.ndarray:
        """The array to publish as device state / pass to encode_dev."""
        return self.packed

    @property
    def nbytes(self) -> int:
        return self.packed.nbytes

    def encode_np(self, values: np.ndarray, miss_codes: np.ndarray) -> np.ndarray:
        v32 = values.astype(np.int32)
        u = v32.view(np.uint32) if v32.flags["C_CONTIGUOUS"] else v32.astype(np.uint32)
        nb = np.uint32(self.nb)
        out = np.asarray(miss_codes).astype(np.int32)
        if out.ndim == 0:
            out = np.full(v32.shape, out, dtype=np.int32)
        else:
            out = out.copy()
        for seed in (np.uint32(0), _SEED2):
            b = (_mix32_np(u, seed) % nb).astype(np.int64)
            rows = self.packed[b]  # [N, 8]
            for s in range(_BUCKET_SLOTS):
                hit = (rows[:, s] == v32) & (rows[:, _BUCKET_SLOTS + s] >= 0)
                out = np.where(hit, rows[:, _BUCKET_SLOTS + s], out)
        return out

    def encode_dev(self, packed_dev, values, miss_codes):
        import jax.numpy as jnp

        v = values.astype(jnp.int32)
        u = v.view(jnp.uint32) if hasattr(v, "view") else v.astype(jnp.uint32)
        nb = jnp.uint32(self.nb)
        out = jnp.broadcast_to(jnp.asarray(miss_codes, jnp.int32), v.shape)
        for seed in (0, int(_SEED2)):
            b = (_mix32_jnp(u, seed) % nb).astype(jnp.int32)
            rows = jnp.take(packed_dev, b, axis=0)  # [N, 8] one row-gather
            for s in range(_BUCKET_SLOTS):
                hit = (rows[:, s] == v) & (rows[:, _BUCKET_SLOTS + s] >= 0)
                out = jnp.where(hit, rows[:, _BUCKET_SLOTS + s], out)
        return out


class StashLookup:
    """Primary single-gather table + small cuckoo overflow stash.

    Measured on v5e (kernels/README.md): at GB-scale tables, TWO 8-wide
    row-gathers cost 2.2x ONE (latency doesn't overlap), while gathers
    into a ≤32 MB region run ~7x faster (cached). So: place ~95% of keys
    in a 4-slot single-hash primary bucket (ONE big gather) and spill
    bucket overflow into a tiny cuckoo stash whose two probes stay in the
    fast cached regime — ~1.8x over the all-cuckoo layout at Criteo-scale
    vocabularies, for ~1.2x the memory.

    Layout: ONE packed int32 array [nbp + nbs, 8] (stash rows appended
    after the primary rows), so all existing single-array device-state
    plumbing works unchanged."""

    __slots__ = ("packed", "nbp", "nbs")

    def __init__(self, packed: np.ndarray, nbp: int, nbs: int):
        self.packed = packed
        self.nbp = nbp
        self.nbs = nbs

    @property
    def host_table(self) -> np.ndarray:
        return self.packed

    @property
    def nbytes(self) -> int:
        return self.packed.nbytes

    def encode_np(self, values: np.ndarray, miss_codes: np.ndarray) -> np.ndarray:
        v32 = values.astype(np.int32)
        u = v32.view(np.uint32) if v32.flags["C_CONTIGUOUS"] else v32.astype(np.uint32)
        out = np.asarray(miss_codes).astype(np.int32)
        if out.ndim == 0:
            out = np.full(v32.shape, out, dtype=np.int32)
        else:
            out = out.copy()
        pmask = np.uint32(self.nbp - 1)
        probes = [(_mix32_np(u, np.uint32(0)) & pmask).astype(np.int64)]
        if self.nbs:
            smask = np.uint32(self.nbs - 1)
            for seed in (_SEED3, _SEED4):
                probes.append(
                    self.nbp + (_mix32_np(u, seed) & smask).astype(np.int64)
                )
        for b in probes:
            rows = self.packed[b]
            for s in range(_BUCKET_SLOTS):
                hit = (rows[:, s] == v32) & (rows[:, _BUCKET_SLOTS + s] >= 0)
                out = np.where(hit, rows[:, _BUCKET_SLOTS + s], out)
        return out

    def encode_dev(self, packed_dev, values, miss_codes):
        import jax.numpy as jnp

        v = values.astype(jnp.int32)
        u = v.view(jnp.uint32) if hasattr(v, "view") else v.astype(jnp.uint32)
        out = jnp.broadcast_to(jnp.asarray(miss_codes, jnp.int32), v.shape)
        probes = [(_mix32_jnp(u, 0) & jnp.uint32(self.nbp - 1)).astype(jnp.int32)]
        if self.nbs:
            for seed in (int(_SEED3), int(_SEED4)):
                probes.append(
                    jnp.int32(self.nbp)
                    + (_mix32_jnp(u, seed) & jnp.uint32(self.nbs - 1)).astype(jnp.int32)
                )
        for b in probes:
            rows = jnp.take(packed_dev, b, axis=0)  # [N, 8] row-gather
            for s in range(_BUCKET_SLOTS):
                hit = (rows[:, s] == v) & (rows[:, _BUCKET_SLOTS + s] >= 0)
                out = jnp.where(hit, rows[:, _BUCKET_SLOTS + s], out)
        return out


def build_stash(
    values: np.ndarray, codes: np.ndarray, primary_load: float = 0.5
) -> Optional[StashLookup]:
    """Primary-greedy + cuckoo-stash build. Keys must fit int32."""
    v64 = values.astype(np.int64)
    if len(v64) and (
        v64.min() < np.iinfo(np.int32).min or v64.max() > np.iinfo(np.int32).max
    ):
        return None
    keys = v64.astype(np.int32)
    vals = codes.astype(np.int32)
    n = len(keys)
    nbp = max(_next_pow2(int(np.ceil(n / (_BUCKET_SLOTS * primary_load))) or 1), 1)
    pmask = np.uint32(nbp - 1)
    u = keys.view(np.uint32)
    b1 = (_mix32_np(u, np.uint32(0)) & pmask).astype(np.int64)

    bkeys = np.zeros((nbp, _BUCKET_SLOTS), dtype=np.int32)
    bvals = np.full((nbp, _BUCKET_SLOTS), _EMPTY, dtype=np.int32)
    # vectorized greedy: items whose within-bucket arrival rank fits stay
    order = np.argsort(b1, kind="stable")
    sorted_tgt = b1[order]
    is_start = np.ones(len(sorted_tgt), dtype=bool)
    is_start[1:] = sorted_tgt[1:] != sorted_tgt[:-1]
    run_id = np.cumsum(is_start) - 1
    run_first = np.nonzero(is_start)[0]
    rank = np.arange(len(sorted_tgt)) - run_first[run_id]
    ok = rank < _BUCKET_SLOTS
    items = order[ok]
    bkeys[sorted_tgt[ok], rank[ok]] = keys[items]
    bvals[sorted_tgt[ok], rank[ok]] = vals[items]
    primary = np.concatenate([bkeys, bvals], axis=1)  # [nbp, 8]

    spill = order[~ok]
    if len(spill) == 0:
        return StashLookup(primary, nbp, 0)
    nbs = max(_next_pow2(int(np.ceil(len(spill) / (_BUCKET_SLOTS * 0.5))) or 1), 1)
    for _ in range(4):
        stash = _try_build_cuckoo_numpy(
            keys[spill], vals[spill], nbs, seeds=(_SEED3, _SEED4)
        )
        if stash is not None:
            return StashLookup(np.concatenate([primary, stash], axis=0), nbp, nbs)
        nbs *= 2
    return None  # caller falls back to plain cuckoo


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def build_direct(
    values: np.ndarray, codes: np.ndarray, max_range: int = _DIRECT_MAX_RANGE
) -> Optional[DirectLookup]:
    """Dense map if the key range is compact enough; else None."""
    if len(values) == 0:
        return None
    v = values.astype(np.int64)
    mn, mx = int(v.min()), int(v.max())
    if mn < np.iinfo(np.int32).min or mx > np.iinfo(np.int32).max:
        # device inputs are int32 (jax x64 off): keys beyond int32 cannot be
        # matched on device even when the RANGE is compact
        return None
    rng = mx - mn + 1
    if rng > max(max_range, 8 * len(v)):
        return None
    table = np.full(rng, _EMPTY, dtype=np.int32)
    table[v - mn] = codes.astype(np.int32)
    return DirectLookup(mn, mx, table)


# XLA's gather emitter drops from ~180 to ~74 M probes/s for operands of
# roughly 230-300K rows regardless of row width (measured on v5e,
# bench/lookup_probe.py); exact sizing lets us simply step over the pocket.
_POCKET_LO, _POCKET_HI = 225_000, 301_000

_CUCKOO_LOAD = 0.8  # 10 B/key; 2-choice 4-slot placement succeeds to ~0.95


def _safe_nb(nb: int) -> int:
    if _POCKET_LO <= nb <= _POCKET_HI:
        return _POCKET_HI + 1
    return max(nb, 1)


def build_cuckoo(values: np.ndarray, codes: np.ndarray) -> Optional[CuckooLookup]:
    """Bucketed cuckoo build (vectorized greedy passes + eviction loop for
    stragglers) at EXACT bucket count ceil(n / (4 * load)) — modulo range
    reduction makes non-pow2 counts free, and minimal operand bytes keep
    the table in the fast gather regime (see CuckooLookup docstring).
    Keys must fit int32 (the device input width); else None."""
    v64 = values.astype(np.int64)
    if len(v64) and (v64.min() < np.iinfo(np.int32).min or v64.max() > np.iinfo(np.int32).max):
        return None
    keys = v64.astype(np.int32)
    vals = codes.astype(np.int32)
    n = len(keys)
    nb = _safe_nb(int(np.ceil(n / (_BUCKET_SLOTS * _CUCKOO_LOAD))) or 1)
    for _ in range(6):  # grow gently on (rare) build failure
        packed = _try_build_cuckoo(keys, vals, nb)
        if packed is not None:
            return CuckooLookup(packed, nb)
        nb = _safe_nb(int(nb * 1.3) + 1)
    raise RuntimeError("cuckoo build failed after 6 capacity growths")


def _try_build_cuckoo(keys: np.ndarray, vals: np.ndarray, nb: int) -> Optional[np.ndarray]:
    native = _try_build_cuckoo_native(keys, vals, nb)
    if native is not None:
        return native if native is not False else None
    return _try_build_cuckoo_numpy(keys, vals, nb)


def _try_build_cuckoo_native(keys, vals, nb):
    """C++ build (~50x the numpy+eviction-loop path at Criteo-scale vocabs).
    → packed table, False on capacity failure, None when lib unavailable."""
    try:
        import ctypes

        from ..serving.native import _build_and_load

        lib = _build_and_load()
    except Exception:
        return None
    keys32 = np.ascontiguousarray(keys, dtype=np.int32)
    vals32 = np.ascontiguousarray(vals, dtype=np.int32)
    packed = np.empty((nb, 2 * _BUCKET_SLOTS), dtype=np.int32)
    ok = lib.nvt_cuckoo_build(
        keys32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(keys32),
        nb,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return packed if ok else False


def _try_build_cuckoo_numpy(
    keys: np.ndarray, vals: np.ndarray, nb: int, seeds=(np.uint32(0), _SEED2)
) -> Optional[np.ndarray]:
    nbu = np.uint32(nb)
    u = keys.view(np.uint32)
    b1 = (_mix32_np(u, seeds[0]) % nbu).astype(np.int64)
    b2 = (_mix32_np(u, seeds[1]) % nbu).astype(np.int64)

    bkeys = np.full((nb, _BUCKET_SLOTS), 0, dtype=np.int32)
    bvals = np.full((nb, _BUCKET_SLOTS), _EMPTY, dtype=np.int32)
    fill = np.zeros(nb, dtype=np.int64)

    pending = np.arange(len(keys))
    # two vectorized greedy passes (bucket choice 1 then 2): place items
    # whose within-bucket arrival rank fits the remaining capacity
    for b in (b1, b2):
        if len(pending) == 0:
            break
        tgt = b[pending]
        order = np.argsort(tgt, kind="stable")
        sorted_tgt = tgt[order]
        # rank of each item within its bucket run
        is_start = np.ones(len(sorted_tgt), dtype=bool)
        is_start[1:] = sorted_tgt[1:] != sorted_tgt[:-1]
        run_id = np.cumsum(is_start) - 1
        run_first = np.nonzero(is_start)[0]
        rank = np.arange(len(sorted_tgt)) - run_first[run_id]
        slot = fill[sorted_tgt] + rank
        ok = slot < _BUCKET_SLOTS
        items = pending[order[ok]]
        put_b = sorted_tgt[ok]
        put_s = slot[ok]
        bkeys[put_b, put_s] = keys[items]
        bvals[put_b, put_s] = vals[items]
        np.add.at(fill, sorted_tgt[ok], 1)
        pending = pending[order[~ok]]

    # eviction loop for the stragglers (tiny at load factor 0.6)
    rng = np.random.default_rng(0)
    for item in pending:
        k, val = int(keys[item]), int(vals[item])
        cb = int(b1[item])
        for _try in range(500):
            row = bvals[cb]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                bkeys[cb, empty[0]] = k
                bvals[cb, empty[0]] = val
                break
            # evict a random occupant
            s = int(rng.integers(0, _BUCKET_SLOTS))
            ek, ev = int(bkeys[cb, s]), int(bvals[cb, s])
            bkeys[cb, s] = k
            bvals[cb, s] = val
            k, val = ek, ev
            h1 = int(_mix32_np(np.array([k], dtype=np.int32).view(np.uint32), seeds[0])[0] % nbu)
            h2 = int(_mix32_np(np.array([k], dtype=np.int32).view(np.uint32), seeds[1])[0] % nbu)
            cb = h2 if cb == h1 else h1
        else:
            return None  # build failure → grow
    return np.concatenate([bkeys, bvals], axis=1)  # [nb, 8]


class BatchedDirect:
    """Column-batched direct lookup: N columns' dense tables concatenated
    into ONE array so the whole Categorify op is a single gather.

    The concat is stored as [ceil(T/8), 8] ROWS and probed with a
    row-gather + lane select: element-gathers measured ~111 M probes/s on
    v5e vs ~180 M/s for 8-lane row-gathers at the same operand size
    (bench/gather_probe.py), so fetching the 8-element row containing the
    slot and selecting the lane on the VPU is ~1.6x faster. The flat slot
    index is unchanged: row = slot >> 3, lane = slot & 7."""

    __slots__ = ("concat", "mins", "maxs", "lens", "offs")

    def __init__(self, luts):
        flat = np.concatenate([l.table for l in luts])
        pad = (-len(flat)) % 8
        if pad:
            flat = np.concatenate([flat, np.full(pad, _EMPTY, dtype=np.int32)])
        rows = flat.reshape(-1, 8)
        total = rows.shape[0]
        if _POCKET_LO <= total <= _POCKET_HI:  # emitter slow pocket: pad past
            rows = np.concatenate(
                [rows, np.full((_POCKET_HI + 1 - total, 8), _EMPTY, np.int32)]
            )
        self.concat = rows
        self.mins = np.array([l.min_key for l in luts], dtype=np.int32)
        self.maxs = np.array([l.max_key for l in luts], dtype=np.int32)
        self.lens = np.array([len(l.table) for l in luts], dtype=np.int32)
        self.offs = np.zeros(len(luts), dtype=np.int32)
        np.cumsum(self.lens[:-1], out=self.offs[1:])

    def encode_dev(self, concat_dev, values, miss_codes, sel=None):
        """values [C, N] int32 → codes [C, N]; miss_codes [C, N]; ``sel``
        selects which member columns (rows of the param arrays) are present."""
        import jax.numpy as jnp

        sel = slice(None) if sel is None else np.asarray(sel)
        v = values.astype(jnp.int32)
        mins = jnp.asarray(self.mins[sel])[:, None]
        idx = jnp.clip(v - mins, 0, jnp.asarray(self.lens[sel])[:, None] - 1)
        idx = idx + jnp.asarray(self.offs[sel])[:, None]
        rows = jnp.take(concat_dev, idx >> 3, axis=0)  # [C, N, 8] row-gather
        lane = (idx & 7)[..., None]
        codes = jnp.sum(
            jnp.where(lane == jnp.arange(8, dtype=jnp.int32), rows, 0), axis=-1
        )
        hit = (v >= mins) & (v <= jnp.asarray(self.maxs[sel])[:, None]) & (codes >= 0)
        return jnp.where(hit, codes, miss_codes)


class BatchedStash:
    """Column-batched primary+stash lookup. The primaries concatenate into
    one big array served by ONE row-gather; the overflow stashes
    concatenate into a SEPARATE small array — gather cost tracks the
    OPERAND array's size on v5e (kernels/README.md: a 1 GB-array gather is
    ~7x a ≤32 MB-array gather even when the touched footprint is small),
    so keeping the stash out of the big concat is what makes its two extra
    probes nearly free."""

    __slots__ = ("concat", "stash_concat", "nbps", "nbss", "row_offs", "stash_offs")

    def __init__(self, luts):
        self.concat = np.concatenate(
            [l.packed[: l.nbp] for l in luts], axis=0
        )
        stashes = [l.packed[l.nbp :] for l in luts if l.nbs]
        self.stash_concat = (
            np.concatenate(stashes, axis=0)
            if stashes
            else np.full((1, 2 * _BUCKET_SLOTS), _EMPTY, dtype=np.int32)
        )
        self.nbps = np.array([l.nbp for l in luts], dtype=np.int32)
        self.nbss = np.array([l.nbs for l in luts], dtype=np.int32)
        self.row_offs = np.zeros(len(luts), dtype=np.int32)
        np.cumsum(self.nbps[:-1], out=self.row_offs[1:])
        self.stash_offs = np.zeros(len(luts), dtype=np.int32)
        np.cumsum(self.nbss[:-1], out=self.stash_offs[1:])

    def encode_dev(self, concat_dev, values, miss_codes, sel=None, stash_dev=None):
        import jax.numpy as jnp

        sel = slice(None) if sel is None else np.asarray(sel)
        v = values.astype(jnp.int32)
        u = v.view(jnp.uint32)
        nbps = self.nbps[sel]
        nbss = self.nbss[sel]
        row_offs = jnp.asarray(self.row_offs[sel])[:, None]
        pmask = jnp.asarray((nbps - 1).astype(np.uint32))[:, None]
        out = jnp.broadcast_to(jnp.asarray(miss_codes, jnp.int32), v.shape)

        b = (_mix32_jnp(u, 0) & pmask).astype(jnp.int32) + row_offs
        rows = jnp.take(concat_dev, b, axis=0)  # [C, N, 8]
        for s in range(_BUCKET_SLOTS):
            hit = (rows[..., s] == v) & (rows[..., _BUCKET_SLOTS + s] >= 0)
            out = jnp.where(hit, rows[..., _BUCKET_SLOTS + s], out)

        if (nbss > 0).any():
            if stash_dev is None:
                stash_dev = jnp.asarray(self.stash_concat)
            has_stash = jnp.asarray(nbss > 0)[:, None]
            smask = jnp.asarray(
                (np.maximum(nbss, 1) - 1).astype(np.uint32)
            )[:, None]
            soff = jnp.asarray(self.stash_offs[sel])[:, None]
            for seed in (int(_SEED3), int(_SEED4)):
                sb = (_mix32_jnp(u, seed) & smask).astype(jnp.int32) + soff
                sb = jnp.where(has_stash, sb, 0)  # stashless: masked row 0
                rows = jnp.take(stash_dev, sb, axis=0)
                for s in range(_BUCKET_SLOTS):
                    hit = (
                        has_stash
                        & (rows[..., s] == v)
                        & (rows[..., _BUCKET_SLOTS + s] >= 0)
                    )
                    out = jnp.where(hit, rows[..., _BUCKET_SLOTS + s], out)
        return out


class BatchedCuckoo:
    """Column-batched cuckoo lookup: per-column bucket arrays stacked along
    rows; TWO row-gathers serve every column at once. The gather OPERAND is
    the concat, so if its total row count lands in the emitter's slow
    pocket (_POCKET_LO.._POCKET_HI rows) it is padded past the pocket with
    empty rows (codes -1 never match)."""

    __slots__ = ("concat", "nbs", "row_offs")

    def __init__(self, luts):
        concat = np.concatenate([l.packed for l in luts], axis=0)
        total = concat.shape[0]
        if _POCKET_LO <= total <= _POCKET_HI:
            pad = np.zeros((_POCKET_HI + 1 - total, concat.shape[1]), np.int32)
            pad[:, _BUCKET_SLOTS:] = _EMPTY
            concat = np.concatenate([concat, pad], axis=0)
        self.concat = concat
        self.nbs = np.array([l.nb for l in luts], dtype=np.int32)
        self.row_offs = np.zeros(len(luts), dtype=np.int32)
        np.cumsum(self.nbs[:-1], out=self.row_offs[1:])

    def encode_dev(self, concat_dev, values, miss_codes, sel=None):
        import jax.numpy as jnp

        sel = slice(None) if sel is None else np.asarray(sel)
        v = values.astype(jnp.int32)
        u = v.view(jnp.uint32)
        nbs_col = jnp.asarray(self.nbs[sel]).astype(jnp.uint32)[:, None]
        row_offs = jnp.asarray(self.row_offs[sel])[:, None]
        out = jnp.broadcast_to(jnp.asarray(miss_codes, jnp.int32), v.shape)
        for seed in (0, int(_SEED2)):
            b = (_mix32_jnp(u, seed) % nbs_col).astype(jnp.int32) + row_offs
            rows = jnp.take(concat_dev, b, axis=0)  # [C, N, 8]
            for s in range(_BUCKET_SLOTS):
                hit = (rows[..., s] == v) & (rows[..., _BUCKET_SLOTS + s] >= 0)
                out = jnp.where(hit, rows[..., _BUCKET_SLOTS + s], out)
        return out


def build_lookup(values: np.ndarray, codes: np.ndarray, tiny_max: Optional[int] = None):
    """Best available exact-lookup structure for integer keys, or None
    (caller falls back to searchsorted / host path). Preference order:
    tiny compare-select (≤ tiny_max keys, zero gather-unit work) → direct
    (1 element-gather) → bucketed cuckoo at high load (2 row-gathers on a
    minimal operand; see the round-2 measurements in CuckooLookup's
    docstring for why this beats the stash layouts everywhere once bins are
    capped in the fast gather regime).

    ``tiny_max`` defaults to _TINY_MAX (right for lookups that column-batch
    into BatchedTiny bins); callers whose lookups always run SOLO — one
    column per program, e.g. TE/JoinGroupby group indexes — should pass
    ~512: single-column compare throughput lacks the batched columns the
    VPU vectorizes over (measured 9M lookups/s at v=2048 solo vs 168M/s
    for 8 columns at v=4096)."""
    if len(values) == 0:
        return None
    if values.dtype.kind not in ("i", "u"):
        return None
    if tiny_max is None:
        tiny_max = _TINY_MAX
    if len(values) <= tiny_max:
        v64 = values.astype(np.int64)
        if (
            v64.min() >= np.iinfo(np.int32).min
            and v64.max() <= np.iinfo(np.int32).max
        ):
            return TinyLookup(v64.astype(np.int32), codes.astype(np.int32))
    direct = build_direct(values, codes)
    if direct is not None:
        return direct
    return build_cuckoo(values, codes)
