"""Core model layers as pure JAX functions (MXU-shaped, bf16-friendly).

TPU-native re-design of the reference's model layers:

* ``embedding_lookup`` / ``multihot_embedding_lookup`` — the reference's
  ``ConcatenatedEmbeddings`` / ``MultiHotEmbeddings``
  (framework_utils/torch/layers/embeddings.py:20-95): per-column embedding
  gather and masked mean-pool over padded multihot values. Ragged
  (values, offsets) columns are padded into dense ``[B, L]`` + mask by the
  loader so the device sees only static shapes.
* ``dot_product_interaction`` — DLRM/FM pairwise feature interaction
  (framework_utils/tensorflow/layers/interaction.py:22): one batched
  ``[B,F,D] @ [B,D,F]`` matmul on the MXU instead of explicit pair loops.
* ``xdeepfm_outer_product`` — xDeepFM CIN layer
  (framework_utils/tensorflow/layers/outer_product.py:19).
* ``mlp_init`` / ``mlp_apply`` — dense stacks used by the tabular MLP and
  DLRM bottom/top towers (framework_utils/torch/models.py:21-110).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mlp_init(rng: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32) -> List[Dict[str, jax.Array]]:
    """He-initialized dense stack: layer_sizes = [in, h1, ..., out]."""
    params = []
    keys = jax.random.split(rng, max(len(layer_sizes) - 1, 1))
    for i in range(len(layer_sizes) - 1):
        fan_in, fan_out = layer_sizes[i], layer_sizes[i + 1]
        w = jax.random.normal(keys[i], (fan_in, fan_out), dtype) * jnp.asarray(
            math.sqrt(2.0 / fan_in), dtype
        )
        b = jnp.zeros((fan_out,), dtype)
        params.append({"w": w, "b": b})
    return params


def mlp_apply(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    final_activation: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Apply dense stack with ReLU between layers.

    Matmuls run in ``compute_dtype`` (bfloat16 → MXU native) with float32
    accumulation via ``preferred_element_type``; params stay float32.
    """
    out_dtype = x.dtype
    h = x.astype(compute_dtype)
    n = len(params)
    for i, layer in enumerate(params):
        h = (
            jnp.dot(h, layer["w"].astype(compute_dtype), preferred_element_type=jnp.float32)
            + layer["b"]
        )
        if i < n - 1 or final_activation:
            h = jax.nn.relu(h)
        if i < n - 1:
            h = h.astype(compute_dtype)
    return h.astype(out_dtype)


def embedding_lookup(table: jax.Array, indices: jax.Array) -> jax.Array:
    """One-hot-free gather: table [V, D], indices [B] → [B, D]."""
    return jnp.take(table, indices, axis=0)


def multihot_embedding_lookup(
    table: jax.Array,
    values: jax.Array,
    mask: jax.Array,
    combiner: str = "mean",
) -> jax.Array:
    """EmbeddingBag over padded multihot values.

    values: int [B, L] (pad slots hold any in-range id), mask: [B, L]
    (1.0 = real). Equivalent of the reference's EmbeddingBag over
    (values, offsets) (torch/layers/embeddings.py:57-95) with the ragged →
    padded conversion done host-side by the loader (static shapes for XLA).
    """
    emb = jnp.take(table, values, axis=0)  # [B, L, D]
    m = mask.astype(emb.dtype)[..., None]  # [B, L, 1]
    summed = jnp.sum(emb * m, axis=1)  # [B, D]
    if combiner == "sum":
        return summed
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return summed / counts


def dot_product_interaction(
    features: jax.Array, self_interaction: bool = False
) -> jax.Array:
    """Pairwise dot products between feature embeddings.

    features: [B, F, D] → [B, F*(F-1)/2] (lower triangle, i<j), or
    [B, F*(F+1)/2] with self_interaction. One batched matmul → MXU.
    Reference: framework_utils/tensorflow/layers/interaction.py:22.
    """
    b, f, d = features.shape
    inter = jax.lax.dot_general(
        features,
        features,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, F, F]
    # static lower-triangle mask → gather flattened pairs
    rows, cols = np.tril_indices(f, k=0 if self_interaction else -1)
    flat_idx = jnp.asarray(rows * f + cols, dtype=jnp.int32)
    flat = inter.reshape(b, f * f)
    return jnp.take(flat, flat_idx, axis=1).astype(features.dtype)


def xdeepfm_outer_product(
    x_k: jax.Array, x_0: jax.Array, w: jax.Array
) -> jax.Array:
    """xDeepFM Compressed Interaction Network layer.

    x_k: [B, H_k, D] current layer, x_0: [B, F, D] raw embeddings,
    w: [H_k * F, H_next] compression weights → [B, H_next, D].
    Reference: framework_utils/tensorflow/layers/outer_product.py:19.
    """
    b, hk, d = x_k.shape
    f = x_0.shape[1]
    # pairwise elementwise products along D: [B, H_k, F, D]
    z = x_k[:, :, None, :] * x_0[:, None, :, :]
    z = z.reshape(b, hk * f, d)
    # compress feature-pair axis: [B, H_next, D]
    out = jax.lax.dot_general(
        w,
        z,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H_next, B, D]
    return jnp.transpose(out, (1, 0, 2)).astype(x_k.dtype)


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean binary cross-entropy from logits (numerically stable)."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
