"""Sharded training step: pjit over a (data, model) mesh.

The full SPMD recipe: annotate parameter shardings (embedding tables
row-sharded over ``model``, MLPs replicated), shard the batch over ``data``,
jit once — XLA inserts the all-gathers/reduce-scatters for the embedding
lookups and the psum for gradient averaging. This is the TPU-native
equivalent of the reference's delegation of sharded-embedding training to
HugeCTR (SURVEY.md §2.8 P7) plus the loader's global_size/global_rank data
parallelism (reference nvtabular/loader/torch.py:63-64).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def shard_params(params, specs, mesh):
    """Place a param pytree onto the mesh per its PartitionSpec pytree."""
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch: Dict[str, Any], specs: Dict[str, Any], mesh) -> Dict[str, Any]:
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        spec = specs.get(k, P())
        out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return out


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, Any]], jax.Array],
    optimizer,
    mesh=None,
    param_specs=None,
    batch_specs: Optional[Dict[str, Any]] = None,
    donate: bool = True,
):
    """Build a jitted ``(params, opt_state, batch) → (params, opt_state,
    loss)`` step. With a mesh + specs, in/out shardings are pinned so the
    compiled program is a single SPMD executable; without, it's single-chip
    jit."""
    import optax  # noqa: F401  (optimizer is an optax GradientTransformation)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    def named(spec_tree, param_tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    p_shard = named(param_specs, None)
    # opt_state sharding mirrors params where shapes match; let the compiler
    # infer it (optax states mix param-shaped leaves and scalars)
    in_shardings = (p_shard, None, {k: NamedSharding(mesh, s) for k, s in (batch_specs or {}).items()} if batch_specs else None)
    out_shardings = (p_shard, None, NamedSharding(mesh, P()))
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1) if donate else (),
    )


def make_eval_step(forward_fn: Callable, mesh=None):
    if mesh is None:
        return jax.jit(forward_fn)
    return jax.jit(forward_fn)
