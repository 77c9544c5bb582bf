"""Model layer math + sharded training step (virtual 8-device mesh).

Mirrors the reference's framework_utils tests
(tests/unit/framework_utils/test_torch_layers.py etc.): layer output golden
checks + end-to-end train-step smoke, plus the multi-chip sharding path the
reference delegates to HugeCTR."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nvtabular_tpu.models import (
    DLRMConfig,
    dlrm_forward,
    dlrm_init,
    dlrm_loss,
    dlrm_param_specs,
    dot_product_interaction,
    make_synthetic_batch,
    mlp_apply,
    mlp_init,
    multihot_embedding_lookup,
    tabular_mlp_forward,
    tabular_mlp_init,
    xdeepfm_outer_product,
)
from nvtabular_tpu.models.dlrm import batch_specs
from nvtabular_tpu.parallel import make_mesh, make_train_step, shard_batch, shard_params


def test_mlp_shapes_and_grad():
    params = mlp_init(jax.random.PRNGKey(0), [8, 16, 4])
    x = jnp.ones((32, 8))
    out = mlp_apply(params, x)
    assert out.shape == (32, 4)
    g = jax.grad(lambda p: jnp.sum(mlp_apply(p, x)))(params)
    assert g[0]["w"].shape == (8, 16)


def test_dot_product_interaction_golden():
    # golden check vs explicit pair loop
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 4, 8)).astype(np.float32)
    out = np.asarray(dot_product_interaction(jnp.asarray(feats)))
    expected = []
    for b in range(3):
        row = []
        for i in range(4):
            for j in range(i):
                row.append(np.dot(feats[b, i], feats[b, j]))
        expected.append(row)
    np.testing.assert_allclose(out, np.array(expected), rtol=1e-5)


def test_multihot_embedding_mean_pool():
    table = jnp.asarray(np.arange(20, dtype=np.float32).reshape(10, 2))
    values = jnp.asarray([[1, 2, 0], [3, 0, 0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    out = np.asarray(multihot_embedding_lookup(table, values, mask))
    np.testing.assert_allclose(out[0], (np.array([2.0, 3.0]) + np.array([4.0, 5.0])) / 2)
    np.testing.assert_allclose(out[1], np.array([6.0, 7.0]))


def test_xdeepfm_outer_product_shape():
    x0 = jnp.ones((2, 5, 8))
    w = jnp.ones((5 * 5, 3))
    out = xdeepfm_outer_product(x0, x0, w)
    assert out.shape == (2, 3, 8)


def test_dlrm_forward_and_loss():
    config = DLRMConfig(
        cardinalities={"a": 100, "b": 50},
        num_dense=4,
        embedding_dim=16,
        bottom_mlp=(32,),
        top_mlp=(32,),
        multihot_cardinalities={"m": 64},
        multihot_max_len=3,
    )
    params = dlrm_init(jax.random.PRNGKey(1), config)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(config, 32).items()}
    logits = dlrm_forward(params, batch)
    assert logits.shape == (32,)
    loss = dlrm_loss(params, batch)
    assert jnp.isfinite(loss)


def test_tabular_mlp():
    from nvtabular_tpu.models import TabularMLPConfig

    config = TabularMLPConfig(
        embedding_sizes={"a": (100, 8), "b": (50, 4)},
        num_continuous=3,
        layer_sizes=(16,),
        multihot_embedding_sizes={"m": (64, 8)},
    )
    params = tabular_mlp_init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    batch = {
        "a": jnp.asarray(rng.integers(0, 100, 16)),
        "b": jnp.asarray(rng.integers(0, 50, 16)),
        "m__values": jnp.asarray(rng.integers(0, 64, (16, 3))),
        "m__mask": jnp.ones((16, 3)),
        "continuous": jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)),
    }
    out = tabular_mlp_forward(params, batch)
    assert out.shape == (16, 1)


def test_sharded_train_step_loss_decreases():
    """Full DP+row-sharded-embedding train step over a (4, 2) mesh."""
    mesh = make_mesh({"data": -1, "model": 2})
    config = DLRMConfig(
        cardinalities={"a": 1000, "b": 500},
        num_dense=4,
        embedding_dim=16,
        bottom_mlp=(32,),
        top_mlp=(32,),
        vocab_pad_multiple=2,
    )
    params = dlrm_init(jax.random.PRNGKey(0), config)
    p_specs = dlrm_param_specs(params)
    b_specs = batch_specs(config)
    params = shard_params(params, p_specs, mesh)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(dlrm_loss, opt, mesh=mesh, param_specs=p_specs, batch_specs=b_specs)
    batch = shard_batch(make_synthetic_batch(config, 64, seed=3), b_specs, mesh)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # table sharding survived the step
    a_tab = params["tables"]["a"]
    assert a_tab.sharding.spec[0] == "model"


def test_sharded_matches_single_device():
    """Sharded train step produces the same loss trajectory as single-device."""
    config = DLRMConfig(
        cardinalities={"a": 128}, num_dense=2, embedding_dim=8,
        bottom_mlp=(8,), top_mlp=(8,), vocab_pad_multiple=2,
    )
    raw_batch = make_synthetic_batch(config, 32, seed=7)

    def run(mesh):
        params = dlrm_init(jax.random.PRNGKey(0), config)
        opt = optax.sgd(0.1)
        if mesh is None:
            step = make_train_step(dlrm_loss, opt)
            batch = {k: jnp.asarray(v) for k, v in raw_batch.items()}
        else:
            p_specs = dlrm_param_specs(params)
            b_specs = batch_specs(config)
            params = shard_params(params, p_specs, mesh)
            step = make_train_step(
                dlrm_loss, opt, mesh=mesh, param_specs=p_specs, batch_specs=b_specs
            )
            batch = shard_batch(raw_batch, b_specs, mesh)
        opt_state = opt.init(params)
        out = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, batch)
            out.append(float(loss))
        return out

    single = run(None)
    sharded = run(make_mesh({"data": -1, "model": 2}))
    np.testing.assert_allclose(single, sharded, rtol=2e-4)


def test_dlrm_config_from_schema():
    from nvtabular_tpu.schema import ColumnSchema, Schema
    from nvtabular_tpu import dtypes as md

    schema = Schema(
        [
            ColumnSchema(
                "cat1",
                dtype=md.int64,
                properties={"embedding_sizes": {"cardinality": 100, "dimension": 16}},
            ),
            ColumnSchema("cont1", dtype=md.float32),
            ColumnSchema(
                "mh1",
                dtype=md.int64,
                is_list=True,
                properties={"embedding_sizes": {"cardinality": 64, "dimension": 16}},
            ),
        ]
    )
    config = DLRMConfig.from_schema(schema, embedding_dim=16)
    assert config.cardinalities == {"cat1": 100}
    assert config.multihot_cardinalities == {"mh1": 64}
    assert config.num_dense == 1


@pytest.mark.parametrize("family", ["deepfm", "dcn"])
def test_deepfm_dcn_train(family):
    from nvtabular_tpu.models import (
        DCNConfig, DeepFMConfig, dcn_init, dcn_loss, deepfm_init, deepfm_loss,
    )

    rng = np.random.default_rng(0)
    n = 256
    batch = {
        "a": jnp.asarray(rng.integers(0, 100, n)),
        "b": jnp.asarray(rng.integers(0, 50, n)),
        "dense": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        # learnable signal: label correlates with feature a parity
        "label": jnp.asarray((rng.integers(0, 100, n) % 2).astype(np.float32)),
    }
    batch["label"] = (np.asarray(batch["a"]) % 2).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if family == "deepfm":
        config = DeepFMConfig({"a": 100, "b": 50}, num_dense=3, embedding_dim=8, deep_mlp=(16,))
        params, loss_fn = deepfm_init(jax.random.PRNGKey(0), config), deepfm_loss
    else:
        config = DCNConfig({"a": 100, "b": 50}, num_dense=3, embedding_dim=8,
                           num_cross_layers=2, deep_mlp=(16,))
        params, loss_fn = dcn_init(jax.random.PRNGKey(0), config), dcn_loss
    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, b):
        l, g = jax.value_and_grad(loss_fn)(p, b)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.3  # memorizes the parity signal
    assert np.isfinite(losses).all()


def test_chunk_train_matches_per_step():
    """make_chunk_train_fn (one lax.scan dispatch per chunk) must walk the
    exact same parameter trajectory as the per-step loop."""
    import jax
    import jax.numpy as jnp
    import optax

    from nvtabular_tpu.models.training import make_chunk_train_fn, make_step_fns

    def loss_fn(params, batch):
        logits = batch["x"] @ params["w"] + params["b"]
        y = batch["label"]
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

    rng = np.random.default_rng(0)
    n, bs, d = 64, 8, 5
    chunk = {
        "x": jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, n).astype(np.float32)),
    }
    params0 = {"w": jnp.zeros(d, jnp.float32), "b": jnp.zeros((), jnp.float32)}
    opt = optax.adam(1e-2)

    train_step, _ = make_step_fns(loss_fn, opt)
    p, o = params0, opt.init(params0)
    step_losses = []
    for i in range(n // bs):
        batch = {k: v[i * bs : (i + 1) * bs] for k, v in chunk.items()}
        p, o, loss = train_step(p, o, batch)
        step_losses.append(float(loss))

    train_chunk = make_chunk_train_fn(loss_fn, opt, bs)
    pc, oc, losses = train_chunk(params0, opt.init(params0), chunk)
    np.testing.assert_allclose(np.asarray(losses), step_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pc["w"]), np.asarray(p["w"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(pc["b"]), float(p["b"]), rtol=1e-5, atol=1e-6)


def test_device_loader_chunks_layout():
    """DeviceLoader.chunks yields full permuted chunks whose batch layout
    matches __iter__'s per-batch layout."""
    import pandas as pd

    import nvtabular_tpu as nvt
    from nvtabular_tpu.loader import DeviceLoader

    rng = np.random.default_rng(2)
    n = 512
    df = pd.DataFrame(
        {
            "c1": rng.integers(0, 50, n).astype(np.int32),
            "x1": rng.normal(size=n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.float32),
        }
    )
    ds = nvt.Dataset(df)
    dl = DeviceLoader(
        ds, batch_size=64, shuffle=False, cat_names=["c1"], cont_names=["x1"],
        label_names=["label"],
    )
    chunk = next(iter(dl.chunks()))
    assert set(chunk) == {"c1", "dense", "label"}
    assert chunk["dense"].shape == (n, 1)
    batches = list(dl)
    assert len(batches) == n // 64
    np.testing.assert_array_equal(
        np.asarray(chunk["c1"][:64]), np.asarray(batches[0]["c1"])
    )
