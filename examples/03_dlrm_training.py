"""End-to-end: ETL → data loader → DLRM with sharded embedding tables.

Script analog of the reference's 03-Running-on-multiple-GPUs-or-on-CPU
notebook + the HugeCTR training handoff (reference README.md:33): the full
north-star pipeline on whatever devices are visible (real TPU chips, or a
virtual CPU mesh via XLA_FLAGS=--xla_force_host_platform_device_count=8).

Run: python examples/03_dlrm_training.py
"""

import numpy as np
import pandas as pd

import jax
import optax

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.loader import Loader
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
from nvtabular_tpu.parallel import make_mesh, make_train_step, shard_batch, shard_params


def main():
    rng = np.random.default_rng(0)
    import os
    n = int(os.environ.get('NVT_EXAMPLE_ROWS', 200_000))
    df = pd.DataFrame(
        {
            "user": rng.choice(rng.integers(0, 1 << 30, 5000), n).astype(np.int64),
            "item": rng.integers(0, 2000, n).astype(np.int64),
            "price": rng.lognormal(1.0, 1.0, n).astype(np.float32),
            "position": rng.uniform(0, 30, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )

    # --- ETL ---------------------------------------------------------------
    cats = ["user", "item"] >> ops.Categorify(freq_threshold=2)
    conts = ["price", "position"] >> ops.FillMissing() >> ops.LogOp() >> ops.Normalize()
    label = ["label"] >> ops.AddTags([nvt.Tags.TARGET])
    workflow = nvt.Workflow(cats + conts + label)
    transformed = workflow.fit_transform(nvt.Dataset(df, part_size=16 * 1024 * 1024))

    # shuffled multi-file parquet write + read-back — the training feed
    # reads the materialized ETL output, as the reference pipelines do
    # (BASELINE config 5: ETL → shuffled write → loader → DLRM)
    import tempfile

    etl_dir = tempfile.mkdtemp(prefix="nvt_etl_")
    transformed.to_parquet(etl_dir, shuffle="per_worker", output_files=4)
    transformed = nvt.Dataset(etl_dir)

    # --- model + mesh -------------------------------------------------------
    devices = jax.devices()
    model_axis = 2 if len(devices) % 2 == 0 and len(devices) > 1 else 1
    mesh = make_mesh({"data": -1, "model": model_axis}, devices)
    print(f"mesh: {dict(mesh.shape)} over {len(devices)} {devices[0].platform} device(s)")

    config = DLRMConfig.from_schema(
        workflow.output_schema,
        embedding_dim=32,
        bottom_mlp=(128, 64),
        top_mlp=(128, 64),
        vocab_pad_multiple=model_axis,
    )
    params = dlrm_init(jax.random.PRNGKey(0), config)
    p_specs = dlrm_param_specs(params)
    b_specs = batch_specs(config)
    params = shard_params(params, p_specs, mesh)
    optimizer = optax.adam(2e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(
        dlrm_loss, optimizer, mesh=mesh, param_specs=p_specs, batch_specs=b_specs
    )

    # --- training loop ------------------------------------------------------
    # DeviceLoader keeps the whole feed in HBM: the workflow's fused
    # transform leaves batches on device, shuffle is a device permutation,
    # and batches slice straight into the sharded train step.
    from nvtabular_tpu.loader import DeviceLoader

    batch_size = 8192
    loader = DeviceLoader(
        transformed, batch_size=batch_size, shuffle=True, seed=0,
        cat_names=["user", "item"], cont_names=["price", "position"],
        label_names=["label"],
    )
    for epoch in range(2):
        losses = []
        for batch in loader:
            batch = shard_batch(batch, b_specs, mesh)
            params, opt_state, loss = train_step(params, opt_state, batch)
            losses.append(loss)
        print(f"epoch {epoch}: mean loss {np.mean([float(l) for l in losses]):.4f}")

    # --- eval (AUC) ---------------------------------------------------------
    eval_loader = Loader(
        transformed, batch_size=batch_size, shuffle=False, drop_last=True,
        cat_names=["user", "item"], cont_names=["price", "position"],
        label_names=["label"], device=False,
    )
    eval_step = jax.jit(dlrm_forward)
    host_params = jax.device_get(params)
    _, _, metrics = process_epoch(
        ({k: np.asarray(v) for k, v in b.items()} for b in eval_loader),
        host_params, None, eval_step=eval_step,
    )
    print(f"eval: AUC={metrics['auc']:.4f} logloss={metrics['logloss']:.4f}")


if __name__ == "__main__":
    main()
