"""BASELINE config-5 rehearsal on the virtual 8-device mesh: the FULL chain
ETL (mesh data-parallel) → shuffled parquet write → DeviceLoader → DLRM
with row-sharded embedding tables, with AUC parity against the all-host
pipeline (reference: end-to-end Criteo ETL + dataloader + training,
BASELINE.json config 5)."""

import numpy as np
import pandas as pd
import pytest

import jax
import optax

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor
from nvtabular_tpu.loader import Loader
from nvtabular_tpu.loader.device_loader import DeviceLoader
from nvtabular_tpu.models import (
    DLRMConfig,
    dlrm_forward,
    dlrm_init,
    dlrm_loss,
    dlrm_param_specs,
    make_step_fns,
    process_epoch,
)
from nvtabular_tpu.models.dlrm import batch_specs
from nvtabular_tpu.models.training import roc_auc
from nvtabular_tpu.parallel import make_mesh, make_train_step, shard_batch, shard_params
from nvtabular_tpu.tags import Tags


def _signal_df(n=8000, seed=11):
    rng = np.random.default_rng(seed)
    user_pref = rng.normal(0, 1, 400)
    user = rng.integers(0, 400, n)
    price = rng.normal(0, 1, n).astype(np.float32)
    logits = 2.0 * user_pref[user] - 1.5 * price
    label = (logits + rng.normal(0, 0.5, n) > 0).astype(np.int64)
    return pd.DataFrame(
        {"user": user.astype(np.int64), "price": price, "label": label}
    )


def _graph():
    return (
        (["user"] >> ops.Categorify())
        + (["price"] >> ops.Normalize())
        + (["label"] >> ops.AddTags([Tags.TARGET]))
    )


def _auc(params, config, dataset):
    """Exact AUC of a (possibly sharded) params pytree over the dataset,
    evaluated on gathered host params (single-device forward)."""
    import jax.numpy as jnp

    host_params = jax.device_get(params)
    loader = Loader(
        dataset, batch_size=2048, shuffle=False, drop_last=False,
        cat_names=["user"], cont_names=["price"], label_names=["label"],
    )
    scores, labels = [], []
    for batch in loader:
        feats = {k: jnp.asarray(v) for k, v in batch.items() if k != "label"}
        out = dlrm_forward(jax.tree.map(jnp.asarray, host_params), feats)
        scores.append(np.asarray(out))
        labels.append(np.asarray(batch["label"]).reshape(-1))
    return roc_auc(np.concatenate(labels), np.concatenate(scores))


@pytest.mark.multichip
def test_config5_sharded_pipeline_auc_parity(tmp_path):
    df = _signal_df()

    # ---- distributed pipeline: mesh ETL → shuffled write → DeviceLoader →
    # sharded DLRM over a (4 data, 2 model) mesh
    etl_mesh = make_mesh({"data": -1})
    wf = nvt.Workflow(_graph(), executor=JitExecutor(jit_min_rows=1024, mesh=etl_mesh))
    transformed = wf.fit_transform(nvt.Dataset(df, part_size=64 * 1024))
    out_dir = str(tmp_path / "etl_out")
    transformed.to_parquet(out_dir, shuffle="per_worker", output_files=4)
    ds = nvt.Dataset(out_dir)
    assert ds.num_rows == len(df)

    config = DLRMConfig.from_schema(
        wf.output_schema, embedding_dim=16, bottom_mlp=(32,), top_mlp=(32,),
        vocab_pad_multiple=2,
    )
    mesh = make_mesh({"data": -1, "model": 2})
    params = dlrm_init(jax.random.PRNGKey(0), config)
    p_specs = dlrm_param_specs(params)
    b_specs = batch_specs(config)
    params = shard_params(params, p_specs, mesh)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    step = make_train_step(
        dlrm_loss, opt, mesh=mesh, param_specs=p_specs, batch_specs=b_specs
    )
    for epoch in range(6):
        loader = DeviceLoader(
            ds, batch_size=1024, shuffle=True, seed=epoch, drop_last=True,
            cat_names=["user"], cont_names=["price"], label_names=["label"],
        )
        for batch in loader:
            params, opt_state, loss = step(
                params, opt_state, shard_batch(dict(batch), b_specs, mesh)
            )
    assert np.isfinite(float(loss))
    sharded_auc = _auc(params, config, ds)

    # ---- all-host baseline pipeline (LocalExecutor ETL, host Loader,
    # single-device training)
    wf_h = nvt.Workflow(_graph(), executor=LocalExecutor())
    transformed_h = wf_h.fit_transform(nvt.Dataset(df, part_size=64 * 1024))
    config_h = DLRMConfig.from_schema(
        wf_h.output_schema, embedding_dim=16, bottom_mlp=(32,), top_mlp=(32,)
    )
    params_h = dlrm_init(jax.random.PRNGKey(0), config_h)
    opt_h = optax.adam(5e-3)
    opt_state_h = opt_h.init(params_h)
    train_step, eval_step = make_step_fns(dlrm_loss, opt_h, forward_fn=dlrm_forward)

    def host_batches(seed):
        return Loader(
            transformed_h, batch_size=1024, shuffle=True, seed=seed, drop_last=True,
            cat_names=["user"], cont_names=["price"], label_names=["label"],
        )

    for epoch in range(6):
        params_h, opt_state_h, _ = process_epoch(
            host_batches(epoch), params_h, opt_state_h, train_step=train_step
        )
    host_auc = _auc(params_h, config_h, transformed_h)

    # both pipelines learn the signal, and the sharded chain matches the
    # host chain within run-to-run variance (BASELINE north star: "matching
    # downstream Criteo AUC within run-to-run variance")
    assert host_auc > 0.75, host_auc
    assert sharded_auc > 0.75, sharded_auc
    assert abs(sharded_auc - host_auc) < 0.05, (sharded_auc, host_auc)
