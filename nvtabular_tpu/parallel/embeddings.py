"""Explicit row-sharded embedding lookup over the mesh (SURVEY §2.8 P7).

The reference computes ``embedding_sizes`` and hands sharded-embedding
training to HugeCTR (reference categorify.py:599-663). Here the kernel is
explicit SPMD: each ``model``-axis shard owns a contiguous row range of the
table, gathers its local rows for every index (out-of-range rows contribute
zero), and one ``psum`` over the model axis assembles full embeddings —
the collective rides ICI. This is the hand-written counterpart of what
GSPMD derives from the `dlrm_param_specs` annotations; use it when you
need deterministic collective placement or to fuse with other shard_map
stages.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sharded_embedding_lookup(
    table, indices, mesh, model_axis: str = "model", data_axis: str = "data"
):
    """table [V, D] row-sharded over ``model_axis`` (V divisible by its
    size); indices int[B] sharded over ``data_axis``. → [B, D] sharded over
    ``data_axis``, replicated over ``model_axis``."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    table = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(model_axis, None)))
    indices = jax.device_put(jnp.asarray(indices), NamedSharding(mesh, P(data_axis)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis, None),
    )
    def lookup(local_table, idx):
        rows_local = local_table.shape[0]
        shard = jax.lax.axis_index(model_axis)
        start = shard * rows_local
        local_idx = idx - start
        in_range = (local_idx >= 0) & (local_idx < rows_local)
        safe_idx = jnp.clip(local_idx, 0, rows_local - 1)
        gathered = jnp.take(local_table, safe_idx, axis=0)  # [b, D]
        contrib = jnp.where(in_range[:, None], gathered, 0.0)
        # exactly one shard owns each row → psum assembles the embedding
        return jax.lax.psum(contrib, model_axis)

    return jax.jit(lookup)(table, indices)


def sharded_embedding_bag(
    table, values, mask, mesh, model_axis: str = "model", data_axis: str = "data",
    combiner: str = "mean",
):
    """Multihot variant: values int[B, L], mask [B, L] → pooled [B, D]."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    table = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P(model_axis, None)))
    values = jax.device_put(jnp.asarray(values), NamedSharding(mesh, P(data_axis, None)))
    mask = jax.device_put(jnp.asarray(mask), NamedSharding(mesh, P(data_axis, None)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis, None), P(data_axis, None)),
        out_specs=P(data_axis, None),
    )
    def bag(local_table, vals, m):
        rows_local = local_table.shape[0]
        start = jax.lax.axis_index(model_axis) * rows_local
        local_idx = vals - start
        in_range = (local_idx >= 0) & (local_idx < rows_local)
        safe_idx = jnp.clip(local_idx, 0, rows_local - 1)
        emb = jnp.take(local_table, safe_idx, axis=0)  # [b, L, D]
        w = (m * in_range).astype(emb.dtype)[..., None]
        pooled = jax.lax.psum(jnp.sum(emb * w, axis=1), model_axis)
        if combiner == "sum":
            return pooled
        counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)[:, None]
        return pooled / counts

    return jax.jit(bag)(table, values, mask)
