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
