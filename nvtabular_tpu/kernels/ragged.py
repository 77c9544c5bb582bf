"""Ragged (values, offsets) kernels in gather form — the TPU-native
replacement for the reference's per-row CUDA kernels
(reference nvtabular/ops/list_slice.py:180-228: `_calculate_row_sizes` +
`_slice_rows` numba.cuda loops).

Every function here is jit-able, static-shape, and resolves to ONE
vectorized gather (the measured v5e addressing-rate limit — kernels/README.md)
plus fused VPU elementwise work. Negative `start`/`end` follow python
slice semantics relative to each row's length.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("pad_len",))
def ragged_to_padded(values, offsets, pad_len: int, pad_value=0):
    """(values [T], offsets [R+1]) → (padded [R, pad_len], mask [R, pad_len])."""
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    pos = jax.lax.broadcasted_iota(jnp.int32, (starts.shape[0], pad_len), 1)
    mask = pos < lengths[:, None]
    idx = jnp.clip(starts[:, None] + pos, 0, values.shape[0] - 1)
    gathered = jnp.take(values, idx)  # one gather
    padded = jnp.where(mask, gathered, jnp.asarray(pad_value, values.dtype))
    return padded, mask


@partial(jax.jit, static_argnames=("start", "end", "pad_len"))
def ragged_slice_padded(values, offsets, start: int, end: int, pad_len: int, pad_value=0):
    """Row-wise list slice [start:end] (python semantics, negatives allowed)
    → (padded [R, pad_len], new_lengths [R])."""
    row_len = offsets[1:] - offsets[:-1]
    s = jnp.where(start >= 0, jnp.minimum(start, row_len), jnp.maximum(row_len + start, 0))
    e = jnp.where(end > 0, jnp.minimum(end, row_len), row_len + end)
    e = jnp.maximum(e, s)
    new_len = jnp.minimum(e - s, pad_len)
    pos = jax.lax.broadcasted_iota(jnp.int32, (row_len.shape[0], pad_len), 1)
    mask = pos < new_len[:, None]
    idx = jnp.clip(offsets[:-1][:, None] + s[:, None] + pos, 0, values.shape[0] - 1)
    gathered = jnp.take(values, idx)
    return jnp.where(mask, gathered, jnp.asarray(pad_value, values.dtype)), new_len


@partial(jax.jit, static_argnames=("combiner", "num_rows"))
def ragged_segment_reduce(values, offsets, num_rows: int, combiner: str = "sum"):
    """Per-row sum/mean/min/max of a ragged float column — the device analog
    of the reference Groupby's list aggregations (groupby.py:96-110).
    Uses segment_sum over a row-id expansion (one scatter-add pattern XLA
    lowers efficiently for sorted segment ids)."""
    row_ids = jnp.searchsorted(
        offsets[1:], jnp.arange(values.shape[0]), side="right"
    )  # sorted, contiguous — fine: this searchsorted is over offsets (small)
    if combiner == "sum":
        return jax.ops.segment_sum(values, row_ids, num_segments=num_rows)
    if combiner == "mean":
        s = jax.ops.segment_sum(values, row_ids, num_segments=num_rows)
        n = jnp.maximum(offsets[1:] - offsets[:-1], 1)
        return s / n.astype(s.dtype)
    if combiner == "min":
        return jax.ops.segment_min(values, row_ids, num_segments=num_rows)
    if combiner == "max":
        return jax.ops.segment_max(values, row_ids, num_segments=num_rows)
    raise ValueError(f"unknown combiner {combiner!r}")


@partial(jax.jit, static_argnames=("combiner",))
def padded_embedding_bag(table, values, mask, combiner: str = "mean"):
    """Masked mean/sum pool of embeddings for padded multihot input —
    the loader-facing form of models.layers.multihot_embedding_lookup."""
    emb = jnp.take(table, values, axis=0)  # [B, L, D] row gather
    m = mask.astype(emb.dtype)[..., None]
    s = jnp.sum(emb * m, axis=1)
    if combiner == "sum":
        return s
    return s / jnp.maximum(jnp.sum(m, axis=1), 1.0)
