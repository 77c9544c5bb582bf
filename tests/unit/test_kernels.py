"""Ragged device kernels vs numpy reference implementations (the golden
strategy of SURVEY §4), incl. the ListSlice device path."""

import numpy as np
import pytest

import jax.numpy as jnp

from nvtabular_tpu.kernels import (
    padded_embedding_bag,
    ragged_segment_reduce,
    ragged_slice_padded,
    ragged_to_padded,
)
from nvtabular_tpu.table import Column, TableBatch


def _ragged(seed=0, rows=50, max_len=6):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(0, max_len, rows)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = rng.integers(0, 100, int(offsets[-1])).astype(np.int32)
    return values, offsets, lengths


def test_ragged_to_padded():
    values, offsets, lengths = _ragged()
    padded, mask = ragged_to_padded(jnp.asarray(values), jnp.asarray(offsets), 6, -1)
    padded, mask = np.asarray(padded), np.asarray(mask)
    for i in range(len(lengths)):
        row = values[offsets[i] : offsets[i + 1]]
        np.testing.assert_array_equal(padded[i, : len(row)], row)
        assert (padded[i, len(row) :] == -1).all()
        assert mask[i].sum() == len(row)


@pytest.mark.parametrize("start,end", [(0, 3), (1, 4), (-2, 0), (0, -1), (2, 100)])
def test_ragged_slice_padded_matches_python(start, end):
    values, offsets, lengths = _ragged(seed=1)
    pad_len = 8
    padded, new_len = ragged_slice_padded(
        jnp.asarray(values), jnp.asarray(offsets), start, end, pad_len, 0
    )
    padded, new_len = np.asarray(padded), np.asarray(new_len)
    for i in range(len(lengths)):
        row = list(values[offsets[i] : offsets[i + 1]])
        expect = row[start:end] if end != 0 else row[start:]
        assert new_len[i] == len(expect)
        np.testing.assert_array_equal(padded[i, : len(expect)], expect)


@pytest.mark.parametrize("combiner", ["sum", "mean", "min", "max"])
def test_ragged_segment_reduce(combiner):
    values, offsets, lengths = _ragged(seed=2)
    fvals = values.astype(np.float32)
    out = np.asarray(
        ragged_segment_reduce(
            jnp.asarray(fvals), jnp.asarray(offsets), len(lengths), combiner
        )
    )
    for i in range(len(lengths)):
        row = fvals[offsets[i] : offsets[i + 1]]
        if len(row) == 0:
            continue  # empty rows: identity element, not asserted
        expect = {"sum": row.sum(), "mean": row.mean(), "min": row.min(), "max": row.max()}[combiner]
        np.testing.assert_allclose(out[i], expect, rtol=1e-6)


def test_padded_embedding_bag_matches_dense():
    rng = np.random.default_rng(3)
    table = rng.normal(size=(20, 4)).astype(np.float32)
    values = rng.integers(0, 20, (7, 3))
    mask = (rng.random((7, 3)) < 0.7).astype(np.float32)
    mask[0] = 0.0  # fully masked row
    out = np.asarray(
        padded_embedding_bag(jnp.asarray(table), jnp.asarray(values), jnp.asarray(mask))
    )
    for i in range(7):
        sel = table[values[i]] * mask[i][:, None]
        denom = max(mask[i].sum(), 1.0)
        np.testing.assert_allclose(out[i], sel.sum(0) / denom, rtol=1e-5)


def test_list_slice_device_path_matches_host():
    from nvtabular_tpu import ops
    from nvtabular_tpu.selector import ColumnSelector

    values, offsets, lengths = _ragged(seed=4)
    host_col = Column(values, offsets)
    dev_col = Column(jnp.asarray(values), jnp.asarray(offsets))
    op = ops.ListSlice(0, 3, pad=True, pad_value=0)
    sel = ColumnSelector(["g"])
    host_out = op.transform(sel, TableBatch({"g": host_col}))["g"]
    dev_out = op.transform(sel, TableBatch({"g": dev_col}))["g"]
    assert dev_out.backend == "jax"
    np.testing.assert_array_equal(np.asarray(host_out.to_pylist()), dev_out.to_host().to_pylist())
