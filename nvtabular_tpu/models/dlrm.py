"""DLRM — the flagship model: the north-star end state of the reference
pipeline (Criteo ETL → dataloader → DLRM; reference README.md:33 trains DLRM
via HugeCTR after NVTabular preprocessing; embedding sizes come from
``Categorify``/``get_embedding_sizes``, reference nvtabular/ops/categorify.py:616-663).

TPU-native design
-----------------
* Parameters are a plain pytree: ``{"tables": {col: [V_i, D]},
  "mh_tables": {col: [V_i, D]}, "bottom": mlp, "top": mlp}``.
* Embedding tables are the only large tensors → row-sharded over the
  ``model`` mesh axis (cardinalities padded up to a multiple of the axis
  size at init so shards are equal); MLPs are small → replicated; the batch
  is sharded over ``data``. ``dlrm_param_specs`` returns the matching
  ``PartitionSpec`` pytree for pjit (see nvtabular_tpu.parallel).
* Forward = gathers + two MLP towers + one batched-matmul dot interaction;
  everything static-shape, bf16 matmuls with f32 accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    bce_with_logits,
    dot_product_interaction,
    embedding_lookup,
    mlp_apply,
    mlp_init,
    multihot_embedding_lookup,
)


@dataclass
class DLRMConfig:
    """Model shape. ``cardinalities`` maps categorical column → vocab size
    (the ``cardinality`` the Categorify op records in schema properties,
    reference categorify.py:555-579)."""

    cardinalities: Dict[str, int]
    num_dense: int
    embedding_dim: int = 64
    bottom_mlp: Tuple[int, ...] = (512, 256)
    top_mlp: Tuple[int, ...] = (512, 256)
    multihot_cardinalities: Dict[str, int] = field(default_factory=dict)
    multihot_max_len: int = 8
    self_interaction: bool = False
    # pad each vocab up to a multiple of this so row-sharding over the model
    # mesh axis always divides evenly (set to mesh model-axis size)
    vocab_pad_multiple: int = 1

    @property
    def num_features(self) -> int:
        return 1 + len(self.cardinalities) + len(self.multihot_cardinalities)

    @property
    def interaction_dim(self) -> int:
        f = self.num_features
        return f * (f + 1) // 2 if self.self_interaction else f * (f - 1) // 2

    def padded_cardinality(self, n: int) -> int:
        m = self.vocab_pad_multiple
        return ((n + m - 1) // m) * m

    @classmethod
    def from_schema(cls, schema, num_dense: Optional[int] = None, **kwargs) -> "DLRMConfig":
        """Build config from a fitted workflow's output schema: columns with
        ``embedding_sizes`` properties become embedding tables, remaining
        float columns become dense features."""
        cards: Dict[str, int] = {}
        mh_cards: Dict[str, int] = {}
        n_dense = 0
        for cs in schema:
            emb = cs.properties.get("embedding_sizes")
            if emb is not None:
                if cs.is_list:
                    mh_cards[cs.name] = int(emb["cardinality"])
                else:
                    cards[cs.name] = int(emb["cardinality"])
            elif cs.dtype.is_float and not cs.is_list:
                n_dense += 1
        return cls(
            cardinalities=cards,
            num_dense=num_dense if num_dense is not None else n_dense,
            multihot_cardinalities=mh_cards,
            **kwargs,
        )


def dlrm_init(rng: jax.Array, config: DLRMConfig) -> Dict[str, Any]:
    d = config.embedding_dim
    k_tab, k_mh, k_bot, k_top = jax.random.split(rng, 4)
    tables = {}
    tab_keys = jax.random.split(k_tab, max(len(config.cardinalities), 1))
    for i, (name, card) in enumerate(sorted(config.cardinalities.items())):
        v = config.padded_cardinality(card)
        tables[name] = jax.random.normal(tab_keys[i], (v, d), jnp.float32) * (1.0 / np.sqrt(d))
    mh_tables = {}
    mh_keys = jax.random.split(k_mh, max(len(config.multihot_cardinalities), 1))
    for i, (name, card) in enumerate(sorted(config.multihot_cardinalities.items())):
        v = config.padded_cardinality(card)
        mh_tables[name] = jax.random.normal(mh_keys[i], (v, d), jnp.float32) * (1.0 / np.sqrt(d))
    bottom = mlp_init(k_bot, [config.num_dense, *config.bottom_mlp, d])
    top_in = d + config.interaction_dim
    top = mlp_init(k_top, [top_in, *config.top_mlp, 1])
    return {"tables": tables, "mh_tables": mh_tables, "bottom": bottom, "top": top}


def dlrm_forward(params: Dict[str, Any], batch: Dict[str, jax.Array]) -> jax.Array:
    """Forward step → logits [B].

    batch keys: ``dense`` [B, num_dense] float; one int [B] array per
    categorical column; ``<col>__values`` int [B, L] + ``<col>__mask`` [B, L]
    per multihot column.
    """
    dense = batch["dense"]
    bottom_out = mlp_apply(params["bottom"], dense, final_activation=True)  # [B, D]
    feats = [bottom_out]
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
    stacked = jnp.stack(feats, axis=1)  # [B, F, D]
    inter = dot_product_interaction(stacked)  # [B, F*(F-1)/2]
    top_in = jnp.concatenate([bottom_out, inter], axis=1)
    logits = mlp_apply(params["top"], top_in)  # [B, 1]
    return logits.reshape(-1)


def dlrm_loss(params: Dict[str, Any], batch: Dict[str, jax.Array]) -> jax.Array:
    return bce_with_logits(dlrm_forward(params, batch), batch["label"])


def dlrm_param_specs(params: Dict[str, Any], model_axis: str = "model"):
    """PartitionSpec pytree: row-shard embedding tables over the model axis,
    replicate MLPs (they are tiny relative to the tables — the reference
    delegates exactly this sharding decision to HugeCTR, SURVEY.md §2.8 P7)."""
    from jax.sharding import PartitionSpec as P

    def table_spec(_):
        return P(model_axis, None)

    return {
        "tables": {k: table_spec(v) for k, v in params["tables"].items()},
        "mh_tables": {k: table_spec(v) for k, v in params["mh_tables"].items()},
        "bottom": jax.tree_util.tree_map(lambda _: P(), params["bottom"]),
        "top": jax.tree_util.tree_map(lambda _: P(), params["top"]),
    }


def batch_specs(config: DLRMConfig, data_axis: str = "data"):
    """PartitionSpec pytree for a training batch: everything sharded on the
    leading (batch) dim over the data axis."""
    from jax.sharding import PartitionSpec as P

    specs = {"dense": P(data_axis, None), "label": P(data_axis)}
    for name in config.cardinalities:
        specs[name] = P(data_axis)
    for name in config.multihot_cardinalities:
        specs[f"{name}__values"] = P(data_axis, None)
        specs[f"{name}__mask"] = P(data_axis, None)
    return specs


def make_synthetic_batch(
    config: DLRMConfig, batch_size: int, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Host-side synthetic batch matching the model's input contract."""
    rng = np.random.default_rng(seed)
    batch: Dict[str, np.ndarray] = {
        "dense": rng.normal(size=(batch_size, config.num_dense)).astype(np.float32),
        "label": rng.integers(0, 2, batch_size).astype(np.float32),
    }
    for name, card in config.cardinalities.items():
        batch[name] = rng.integers(0, card, batch_size).astype(np.int32)
    for name, card in config.multihot_cardinalities.items():
        L = config.multihot_max_len
        batch[f"{name}__values"] = rng.integers(0, card, (batch_size, L)).astype(np.int32)
        lengths = rng.integers(1, L + 1, batch_size)
        batch[f"{name}__mask"] = (
            np.arange(L)[None, :] < lengths[:, None]
        ).astype(np.float32)
    return batch
