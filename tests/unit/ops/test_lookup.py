"""Lookup structures: direct dense map + bucketed cuckoo — exactness vs a
plain dict, device/host parity, stress at high load."""

import numpy as np
import pytest

from nvtabular_tpu.ops.lookup import (
    CuckooLookup,
    DirectLookup,
    StashLookup,
    TinyLookup,
    _TINY_MAX,
    build_cuckoo,
    build_direct,
    build_lookup,
    build_stash,
)


def _ref_encode(keys, codes, queries, miss=-7):
    d = {int(k): int(c) for k, c in zip(keys, codes)}
    return np.array([d.get(int(q), miss) for q in queries], dtype=np.int32)


@pytest.mark.parametrize("n", [1, 100, 5000])
def test_direct_exact(n):
    rng = np.random.default_rng(0)
    keys = rng.choice(3 * n, n, replace=False).astype(np.int64)
    codes = rng.permutation(n).astype(np.int32) + 3
    lut = build_direct(keys, codes)
    assert lut is not None
    queries = rng.integers(-10, 3 * n + 10, 5000)
    miss = np.full(5000, -7, dtype=np.int32)
    got = lut.encode_np(queries, miss)
    np.testing.assert_array_equal(got, _ref_encode(keys, codes, queries))


def test_direct_rejects_wide_range():
    keys = np.array([0, 1 << 40], dtype=np.int64)
    assert build_direct(keys, np.array([2, 3])) is None


@pytest.mark.parametrize("n", [1, 17, 1000, 50_000])
def test_cuckoo_exact(n):
    rng = np.random.default_rng(1)
    keys = rng.choice(1 << 31, n, replace=False).astype(np.int64) - (1 << 30)
    codes = (np.arange(n) + 3).astype(np.int32)
    lut = build_cuckoo(keys, codes)
    assert lut is not None
    queries = np.concatenate([keys[: min(n, 2000)], rng.integers(-(1 << 30), 1 << 30, 3000)])
    miss = np.full(len(queries), -7, dtype=np.int32)
    got = lut.encode_np(queries, miss)
    np.testing.assert_array_equal(got, _ref_encode(keys, codes, queries))


def test_cuckoo_rejects_int64_keys():
    keys = np.array([0, 1 << 40], dtype=np.int64)
    assert build_cuckoo(keys, np.array([2, 3])) is None


def test_device_parity():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    n = 4000
    keys = rng.choice(1 << 31, n, replace=False).astype(np.int64) - (1 << 30)
    codes = (np.arange(n) + 3).astype(np.int32)
    queries = np.concatenate([keys[:2000], rng.integers(-(1 << 30), 1 << 30, 2000)]).astype(
        np.int32
    )
    miss = np.full(len(queries), -7, dtype=np.int32)

    cuckoo = build_cuckoo(keys, codes)
    got_host = cuckoo.encode_np(queries, miss)
    got_dev = np.asarray(
        cuckoo.encode_dev(jnp.asarray(cuckoo.packed), jnp.asarray(queries), jnp.asarray(miss))
    )
    np.testing.assert_array_equal(got_host, got_dev)

    dense_keys = rng.choice(3 * n, n, replace=False).astype(np.int64)
    direct = build_direct(dense_keys, codes)
    q2 = rng.integers(-5, 3 * n + 5, 4000).astype(np.int32)
    got_host = direct.encode_np(q2, miss)
    got_dev = np.asarray(
        direct.encode_dev(jnp.asarray(direct.table), jnp.asarray(q2), jnp.asarray(miss))
    )
    np.testing.assert_array_equal(got_host, got_dev)


def test_build_lookup_choice():
    codes = np.array([2, 3, 4], dtype=np.int32)
    # ≤ _TINY_MAX keys: VPU compare-select, regardless of key spread
    assert isinstance(build_lookup(np.array([5, 6, 7]), codes), TinyLookup)
    assert isinstance(
        build_lookup(np.array([5, 6, 2_000_000_000]), codes), TinyLookup
    )
    assert build_lookup(np.array(["a", "b", "c"], dtype=object), codes) is None
    # beyond the tiny threshold: dense range → direct, sparse → cuckoo
    n = _TINY_MAX + 1
    big_codes = np.arange(3, 3 + n, dtype=np.int32)
    assert isinstance(
        build_lookup(np.arange(n, dtype=np.int64), big_codes), DirectLookup
    )
    rng = np.random.default_rng(9)
    sparse = np.sort(rng.choice(1 << 30, n, replace=False)).astype(np.int64)
    assert isinstance(build_lookup(sparse, big_codes), CuckooLookup)
    # tiny keys beyond int32 cannot ride the int32 device stream
    assert not isinstance(
        build_lookup(np.array([5, 1 << 40], dtype=np.int64), codes[:2]), TinyLookup
    )


@pytest.mark.parametrize("n", [1, 7, 300, 4096])
def test_tiny_exact_and_device_parity(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    keys = rng.choice(1 << 31, n, replace=False).astype(np.int64) - (1 << 30)
    codes = rng.permutation(n).astype(np.int32)  # includes code 0
    lut = build_lookup(keys, codes)
    assert isinstance(lut, TinyLookup)
    queries = np.concatenate(
        [keys[: min(n, 1000)], rng.integers(-(1 << 30), 1 << 30, 2000)]
    )
    expected = _ref_encode(keys, codes, queries)
    got_np = lut.encode_np(queries, np.int32(-7))
    np.testing.assert_array_equal(got_np, expected)
    got_dev = np.asarray(
        lut.encode_dev(
            jnp.asarray(lut.host_table),
            jnp.asarray(queries.astype(np.int32)),
            jnp.int32(-7),
        )
    )
    np.testing.assert_array_equal(got_dev, expected)


def test_batched_tiny_matches_solo():
    import jax.numpy as jnp

    from nvtabular_tpu.ops.lookup import BatchedTiny

    rng = np.random.default_rng(7)
    luts, queries, expecteds = [], [], []
    for c, n in enumerate([3, 40, 700]):  # padded to the bin vmax
        keys = rng.choice(1 << 30, n, replace=False).astype(np.int64)
        codes = np.arange(n, dtype=np.int32)  # row indices from 0
        lut = build_lookup(keys, codes)
        assert isinstance(lut, TinyLookup)
        q = np.concatenate([rng.choice(keys, 512), rng.integers(0, 1 << 30, 512)])
        luts.append(lut)
        queries.append(q.astype(np.int32))
        expecteds.append(_ref_encode(keys, codes, q))
    blut = BatchedTiny(luts)
    vals = jnp.asarray(np.stack(queries))
    miss = jnp.full(vals.shape, -7, dtype=jnp.int32)
    got = np.asarray(blut.encode_dev(jnp.asarray(blut.concat), vals, miss))
    for c in range(3):
        np.testing.assert_array_equal(got[c], expecteds[c], err_msg=str(c))
    # sel subsetting matches the member rows
    got_sel = np.asarray(
        blut.encode_dev(jnp.asarray(blut.concat), vals[1:], miss[1:], sel=[1, 2])
    )
    for i, c in enumerate([1, 2]):
        np.testing.assert_array_equal(got_sel[i], expecteds[c], err_msg=str(c))


def test_cuckoo_exact_sizing_and_pocket_avoidance():
    """Bucket counts are exact (no pow2 rounding: a 4M-key table must stay
    under the ~48MB fast-gather cliff) and never land in the 225-301K-row
    emitter pocket."""
    from nvtabular_tpu.ops.lookup import _CUCKOO_LOAD, _POCKET_HI, _POCKET_LO

    rng = np.random.default_rng(5)
    n = 300_000
    keys = rng.choice(1 << 31, n, replace=False).astype(np.int64) - (1 << 30)
    codes = np.arange(3, 3 + n, dtype=np.int32)
    lut = build_cuckoo(keys, codes)
    ideal = int(np.ceil(n / (4 * _CUCKOO_LOAD)))
    assert lut.nb < 2 * ideal, "pow2-style inflation crept back in"
    assert not (_POCKET_LO <= lut.nb <= _POCKET_HI)
    # spot-check exactness at this load
    q = np.concatenate([keys[:5000], rng.integers(-(1 << 30), 1 << 30, 5000)])
    got = lut.encode_np(q, np.int32(-7))
    np.testing.assert_array_equal(got, _ref_encode(keys, codes, q))


def test_stash_lookup_matches_reference():
    """Primary+stash layout: exact host/device equality vs dict encode at
    a load that forces real bucket spills into the stash."""
    rng = np.random.default_rng(3)
    keys = rng.choice(np.arange(1, 2**31, 631, dtype=np.int64), 200_000, replace=False)
    codes = np.arange(3, 3 + len(keys), dtype=np.int32)
    lut = build_stash(keys, codes)
    assert isinstance(lut, StashLookup)
    assert lut.nbs > 0, "expected spilled keys in the stash"

    queries = np.concatenate([rng.choice(keys, 50_000), rng.integers(2**31 - 10_000, 2**31, 5_000)])
    rng.shuffle(queries)
    expected = _ref_encode(keys, codes, queries)
    got_np = lut.encode_np(queries.astype(np.int64), np.int32(-7))
    np.testing.assert_array_equal(got_np, expected)

    import jax.numpy as jnp

    got_dev = np.asarray(
        lut.encode_dev(jnp.asarray(lut.host_table), jnp.asarray(queries.astype(np.int32)), jnp.int32(-7))
    )
    np.testing.assert_array_equal(got_dev, expected)


def test_batched_stash_matches_solo():
    from nvtabular_tpu.ops.lookup import BatchedStash
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    luts, queries, expecteds = [], [], []
    for c in range(3):
        n = 40_000 + 7_000 * c
        keys = rng.choice(np.arange(1, 2**31, 977 + c, dtype=np.int64), n, replace=False)
        codes = np.arange(3, 3 + n, dtype=np.int32)
        lut = build_stash(keys, codes)
        assert isinstance(lut, StashLookup)
        q = np.concatenate([rng.choice(keys, 8_192), rng.integers(1, 2**31, 8_192)])[:16_384]
        luts.append(lut)
        queries.append(q.astype(np.int32))
        expecteds.append(_ref_encode(keys, codes, q))
    blut = BatchedStash(luts)
    vals = jnp.asarray(np.stack(queries))
    miss = jnp.full(vals.shape, -7, dtype=jnp.int32)
    got = np.asarray(blut.encode_dev(jnp.asarray(blut.concat), vals, miss))
    for c in range(3):
        np.testing.assert_array_equal(got[c], expecteds[c], err_msg=str(c))
