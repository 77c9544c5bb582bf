"""DeepFM and DCN — additional recommender model families over the same
batch contract as DLRM (the model zoo the reference feeds via HugeCTR/
framework_utils; xDeepFM's CIN building block lives in layers.py).

* DeepFM (Guo et al. 2017): first-order linear terms + FM pairwise
  interactions + deep MLP tower, summed into one logit. The FM pairwise sum
  uses the (Σv)² − Σv² identity — two elementwise squares and sums instead
  of O(F²) pair dots (VPU-friendly).
* DCN-v2 cross network (Wang et al. 2021): x_{l+1} = x0 ⊙ (W x_l + b) + x_l,
  stacked, concatenated with a deep tower.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import bce_with_logits, embedding_lookup, mlp_apply, mlp_init


@dataclass
class DeepFMConfig:
    cardinalities: Dict[str, int]
    num_dense: int
    embedding_dim: int = 16
    deep_mlp: Tuple[int, ...] = (256, 128)
    vocab_pad_multiple: int = 1

    def padded_cardinality(self, n: int) -> int:
        m = self.vocab_pad_multiple
        return ((n + m - 1) // m) * m


def deepfm_init(rng: jax.Array, config: DeepFMConfig) -> Dict[str, Any]:
    d = config.embedding_dim
    k_emb, k_lin, k_deep, k_dense = jax.random.split(rng, 4)
    tables, linear = {}, {}
    keys = jax.random.split(k_emb, max(len(config.cardinalities), 1))
    for i, (name, card) in enumerate(sorted(config.cardinalities.items())):
        v = config.padded_cardinality(card)
        tables[name] = jax.random.normal(keys[i], (v, d), jnp.float32) * (1.0 / np.sqrt(d))
        linear[name] = jnp.zeros((v,), jnp.float32)  # first-order weights
    f = len(config.cardinalities)
    deep_in = f * d + config.num_dense
    return {
        "tables": tables,
        "linear": linear,
        "dense_w": jax.random.normal(k_dense, (config.num_dense,), jnp.float32) * 0.01,
        "deep": mlp_init(k_deep, [deep_in, *config.deep_mlp, 1]),
        "bias": jnp.zeros((), jnp.float32),
    }


def deepfm_forward(params: Dict[str, Any], batch: Dict[str, jax.Array]) -> jax.Array:
    names = sorted(params["tables"])
    embs = [embedding_lookup(params["tables"][n], batch[n]) for n in names]  # F x [B, D]
    stacked = jnp.stack(embs, axis=1)  # [B, F, D]
    # FM second order via (Σv)² − Σv²
    s = jnp.sum(stacked, axis=1)
    fm2 = 0.5 * jnp.sum(s * s - jnp.sum(stacked * stacked, axis=1), axis=1)  # [B]
    # first order
    fm1 = sum(jnp.take(params["linear"][n], batch[n]) for n in names)
    dense = batch["dense"].astype(jnp.float32)
    fm1 = fm1 + dense @ params["dense_w"]
    # deep tower
    deep_in = jnp.concatenate([stacked.reshape(stacked.shape[0], -1), dense], axis=1)
    deep = mlp_apply(params["deep"], deep_in).reshape(-1)
    return fm1 + fm2 + deep + params["bias"]


def deepfm_loss(params, batch):
    return bce_with_logits(deepfm_forward(params, batch), batch["label"])


@dataclass
class DCNConfig:
    cardinalities: Dict[str, int]
    num_dense: int
    embedding_dim: int = 16
    num_cross_layers: int = 3
    deep_mlp: Tuple[int, ...] = (256, 128)
    vocab_pad_multiple: int = 1

    def padded_cardinality(self, n: int) -> int:
        m = self.vocab_pad_multiple
        return ((n + m - 1) // m) * m

    @property
    def input_dim(self) -> int:
        return len(self.cardinalities) * self.embedding_dim + self.num_dense


def dcn_init(rng: jax.Array, config: DCNConfig) -> Dict[str, Any]:
    d = config.embedding_dim
    k_emb, k_cross, k_deep, k_out = jax.random.split(rng, 4)
    tables = {}
    keys = jax.random.split(k_emb, max(len(config.cardinalities), 1))
    for i, (name, card) in enumerate(sorted(config.cardinalities.items())):
        v = config.padded_cardinality(card)
        tables[name] = jax.random.normal(keys[i], (v, d), jnp.float32) * (1.0 / np.sqrt(d))
    dim = config.input_dim
    cross_keys = jax.random.split(k_cross, max(config.num_cross_layers, 1))
    cross = [
        {
            "w": jax.random.normal(cross_keys[i], (dim, dim), jnp.float32) * (1.0 / np.sqrt(dim)),
            "b": jnp.zeros((dim,), jnp.float32),
        }
        for i in range(config.num_cross_layers)
    ]
    deep = mlp_init(k_deep, [dim, *config.deep_mlp])
    out_in = dim + (config.deep_mlp[-1] if config.deep_mlp else 0)
    out = mlp_init(k_out, [out_in, 1])
    return {"tables": tables, "cross": cross, "deep": deep, "out": out}


def dcn_forward(params: Dict[str, Any], batch: Dict[str, jax.Array]) -> jax.Array:
    names = sorted(params["tables"])
    embs = [embedding_lookup(params["tables"][n], batch[n]) for n in names]
    x0 = jnp.concatenate(embs + [batch["dense"].astype(jnp.float32)], axis=1)  # [B, dim]
    x = x0
    for layer in params["cross"]:
        xw = (
            jnp.dot(
                x.astype(jnp.bfloat16),
                layer["w"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + layer["b"]
        )
        x = x0 * xw + x  # DCN-v2 cross
    deep = mlp_apply(params["deep"], x0, final_activation=True)
    merged = jnp.concatenate([x, deep], axis=1)
    return mlp_apply(params["out"], merged).reshape(-1)


def dcn_loss(params, batch):
    return bce_with_logits(dcn_forward(params, batch), batch["label"])
