"""SPMD statistics over the virtual 8-device mesh: psum moments and the
all-to-all sharded vocabulary build (SURVEY §2.8 P2/P3)."""

import numpy as np
import pytest

from nvtabular_tpu.parallel import make_mesh
from nvtabular_tpu.parallel.stats import sharded_moments
from nvtabular_tpu.parallel.sharded_vocab import sharded_value_counts


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"data": -1})


def test_sharded_moments_matches_numpy(mesh):
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, (4096, 5)).astype(np.float32)
    x[rng.random(x.shape) < 0.05] = np.nan  # nulls ignored
    stats = sharded_moments(x, mesh)
    for c in range(5):
        col = x[:, c]
        col = col[~np.isnan(col)]
        np.testing.assert_allclose(stats["count"][c], len(col))
        np.testing.assert_allclose(stats["mean"][c], col.mean(), rtol=1e-5)
        np.testing.assert_allclose(stats["std"][c], col.std(ddof=1), rtol=1e-4)
        np.testing.assert_allclose(stats["min"][c], col.min(), rtol=1e-6)
        np.testing.assert_allclose(stats["max"][c], col.max(), rtol=1e-6)


def test_sharded_moments_all_null_column(mesh):
    x = np.full((1024, 1), np.nan, dtype=np.float32)
    stats = sharded_moments(x, mesh)
    assert stats["count"][0] == 0
    assert stats["mean"][0] == 0.0


def test_sharded_value_counts_exact(mesh):
    rng = np.random.default_rng(1)
    keys = rng.choice(rng.integers(-(1 << 30), 1 << 30, 500), 40_000).astype(np.int32)
    counts, overflow = sharded_value_counts(keys, mesh)
    assert overflow == 0
    expected_vals, expected_counts = np.unique(keys, return_counts=True)
    assert len(counts) == len(expected_vals)
    for v, c in zip(expected_vals, expected_counts):
        assert counts[int(v)] == int(c)


def test_sharded_value_counts_skew_overflow_detected(mesh):
    # one dominant key → its owner's bucket overflows at tiny capacity
    keys = np.full(8192, 42, dtype=np.int32)
    counts, overflow = sharded_value_counts(keys, mesh, capacity_factor=0.1)
    assert overflow > 0  # detected, not silently wrong
    # retry with enough capacity (the documented recovery)
    counts, overflow = sharded_value_counts(keys, mesh, capacity_factor=9.0)
    assert overflow == 0
    assert counts[42] == 8192


def test_sharded_value_counts_ragged_padding(mesh):
    # length not divisible by mesh size
    keys = np.arange(1003, dtype=np.int32)
    counts, overflow = sharded_value_counts(keys, mesh, capacity_factor=9.0)
    assert overflow == 0
    assert len(counts) == 1003
    assert all(c == 1 for c in counts.values())


def test_sharded_embedding_lookup_matches_take(mesh):
    import jax.numpy as jnp

    from nvtabular_tpu.parallel.embeddings import (
        sharded_embedding_bag,
        sharded_embedding_lookup,
    )

    rng = np.random.default_rng(3)
    V, D, B = 64, 8, 32  # V divisible by 8-way model... mesh is 1D data; build 2D
    from nvtabular_tpu.parallel import make_mesh

    mesh2 = make_mesh({"data": -1, "model": 2})
    table = rng.normal(size=(V, D)).astype(np.float32)
    idx = rng.integers(0, V, B)
    out = np.asarray(sharded_embedding_lookup(table, idx, mesh2))
    np.testing.assert_allclose(out, table[idx], rtol=1e-6)

    vals = rng.integers(0, V, (B, 4))
    mask = (rng.random((B, 4)) < 0.7).astype(np.float32)
    out = np.asarray(sharded_embedding_bag(table, vals, mask, mesh2))
    expect = (table[vals] * mask[..., None]).sum(1) / np.maximum(mask.sum(1), 1.0)[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_sharded_value_counts_powerlaw_skew(mesh):
    """Realistic Criteo-like skew: zipf keys hash-bucket unevenly across
    owners; the retry wrapper must still return EXACT counts at 1M+ rows
    with ~100K+ uniques (VERDICT weak #3)."""
    from nvtabular_tpu.parallel.sharded_vocab import sharded_value_counts_exact

    rng = np.random.default_rng(11)
    raw = rng.zipf(1.2, 1_200_000)
    keys = ((raw * 2654435761) % (1 << 22)).astype(np.int32)
    counts = sharded_value_counts_exact(keys, mesh)
    vals, cnts = np.unique(keys, return_counts=True)
    assert len(counts) == len(vals)
    got = np.array([counts[int(v)] for v in vals])
    np.testing.assert_array_equal(got, cnts)


def test_sharded_value_counts_overflow_retry(mesh):
    """Degenerate skew (one dominant key routes everything to one owner)
    exceeds the default capacity and must succeed via retry."""
    from nvtabular_tpu.parallel.sharded_vocab import (
        sharded_value_counts,
        sharded_value_counts_exact,
    )

    keys = np.zeros(200_000, dtype=np.int32)
    keys[:100] = np.arange(100, dtype=np.int32) + 1
    # the unwrapped call at the default factor must report overflow
    _, overflow = sharded_value_counts(keys, mesh)
    assert overflow > 0
    counts = sharded_value_counts_exact(keys, mesh)
    assert counts[0] == 200_000 - 100
    assert all(counts[k] == 1 for k in range(1, 101))


def test_reservoir_error_bound_skewed():
    """Median error of the reservoir sketch on heavily skewed data stays
    within the sampling bound (~3σ of the quantile estimator at capacity
    131072 → well inside the [0.49, 0.51] quantile window)."""
    from nvtabular_tpu.ops.moments import ReservoirSample

    rng = np.random.default_rng(5)
    data = rng.lognormal(0.0, 2.5, 2_000_000)  # heavy right skew
    rs = ReservoirSample(seed=7)
    for start in range(0, len(data), 250_000):  # streamed in batches
        rs.update(data[start : start + 250_000])
    assert rs.seen == len(data)
    est = rs.quantile(0.5)
    lo, hi = np.quantile(data, [0.49, 0.51])
    assert lo <= est <= hi, (lo, est, hi)


def test_reservoir_weighted_merge():
    """Multi-host merge: shards with very different sizes/distributions
    combine weight-correctly (a uniform resample of the concatenated
    buffers would bias toward the small shard)."""
    from nvtabular_tpu.ops.moments import ReservoirSample

    rng = np.random.default_rng(6)
    big = rng.normal(0.0, 1.0, 3_000_000)  # 30x the rows of `small`
    small = rng.normal(10.0, 1.0, 100_000)
    ra = ReservoirSample(seed=1)
    ra.update(big)
    rb = ReservoirSample(seed=2)
    rb.update(small)
    merged = ra.merge(rb)
    est = merged.quantile(0.5)
    truth = np.quantile(np.concatenate([big, small]), 0.5)
    # global median sits in the N(0,1) mass; a biased merge (≈50/50 buffers)
    # would pull the median several units toward 10
    assert abs(est - truth) < 0.05, (est, truth)
