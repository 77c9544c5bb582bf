"""Generic tabular MLP — analog of the reference's torch ``Model``
(framework_utils/torch/models.py:21-110): per-column embeddings (+ multihot
embedding bags) concatenated with normalized continuous features, through a
dense ReLU stack to ``num_classes`` logits. Pure JAX pytree params."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import embedding_lookup, mlp_apply, mlp_init, multihot_embedding_lookup


@dataclass
class TabularMLPConfig:
    embedding_sizes: Dict[str, Tuple[int, int]]  # col → (cardinality, dim)
    num_continuous: int
    layer_sizes: Tuple[int, ...] = (512, 256)
    num_classes: int = 1
    multihot_embedding_sizes: Dict[str, Tuple[int, int]] = field(default_factory=dict)

    @property
    def input_dim(self) -> int:
        emb = sum(d for _, d in self.embedding_sizes.values())
        emb += sum(d for _, d in self.multihot_embedding_sizes.values())
        return emb + self.num_continuous


def tabular_mlp_init(rng: jax.Array, config: TabularMLPConfig) -> Dict[str, Any]:
    k_emb, k_mh, k_mlp = jax.random.split(rng, 3)
    tables = {}
    keys = jax.random.split(k_emb, max(len(config.embedding_sizes), 1))
    for i, (name, (card, dim)) in enumerate(sorted(config.embedding_sizes.items())):
        tables[name] = jax.random.normal(keys[i], (card, dim), jnp.float32) * (
            1.0 / np.sqrt(dim)
        )
    mh_tables = {}
    mh_keys = jax.random.split(k_mh, max(len(config.multihot_embedding_sizes), 1))
    for i, (name, (card, dim)) in enumerate(
        sorted(config.multihot_embedding_sizes.items())
    ):
        mh_tables[name] = jax.random.normal(mh_keys[i], (card, dim), jnp.float32) * (
            1.0 / np.sqrt(dim)
        )
    mlp = mlp_init(k_mlp, [config.input_dim, *config.layer_sizes, config.num_classes])
    return {"tables": tables, "mh_tables": mh_tables, "mlp": mlp}


def tabular_mlp_forward(params: Dict[str, Any], batch: Dict[str, jax.Array]) -> jax.Array:
    """batch: ``continuous`` [B, C] float; one int [B] per categorical;
    ``<col>__values``/<col>__mask`` per multihot. Returns logits
    [B, num_classes]."""
    feats = []
    for name in sorted(params["tables"]):
        feats.append(embedding_lookup(params["tables"][name], batch[name]))
    for name in sorted(params["mh_tables"]):
        feats.append(
            multihot_embedding_lookup(
                params["mh_tables"][name],
                batch[f"{name}__values"],
                batch[f"{name}__mask"],
            )
        )
    if "continuous" in batch:
        feats.append(batch["continuous"].astype(jnp.float32))
    x = jnp.concatenate(feats, axis=1)
    return mlp_apply(params["mlp"], x)
