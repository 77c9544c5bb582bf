"""End-to-end multi-chip pipeline: mesh fit → sharded ragged transform →
shuffled write → device-resident chunk-scan DLRM training.

Everything here runs over ONE `jax.sharding.Mesh` and demonstrates the
round-3 multi-chip surface:

1. MESH FIT — `Workflow.fit` with a mesh executor routes eligible
   Categorify vocabularies through one SPMD program per column: keys
   hash-route to owner devices over `all_to_all`, owners sort, the host
   run-length-encodes exact (value, count) pairs. The fit SCAN scales
   with chips (reference scales this phase with dask workers,
   nvtabular/ops/categorify.py:955-1137).
2. SHARDED RAGGED TRANSFORM — a batch containing a multihot (list)
   column shards via `shard_map`: rows split into per-device ranges and
   each shard's list offsets are rebased locally, so the SAME
   single-device program runs on every chip with no collective touching
   the ragged data (reference partitions list columns through dask,
   nvtabular/ops/list_slice.py:180-228).
3. SHUFFLED WRITE — PER_WORKER multi-file parquet (the reference
   benchmark's output mode, bench/examples/MultiGPUBench.md).
4. CHUNK-SCAN TRAINING — `DeviceLoader.chunks()` feeds whole permuted
   HBM-resident chunks to `make_chunk_train_fn`, which trains every
   batch of a chunk inside ONE jitted `lax.scan` — one dispatch per
   chunk of steps (measured 2.97M examples/s vs 1.76M for the per-step
   host feed on a real chip; reference analog is the 3x-buffer
   device-resident loader, nvtabular/loader/tensorflow.py:113-130).

Run without hardware:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/05_multichip_pipeline.py
"""

import os
import tempfile
import time

import numpy as np
import pandas as pd


def main():
    import jax
    import optax

    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.dag.executor import JitExecutor
    from nvtabular_tpu.loader import DeviceLoader
    from nvtabular_tpu.models import DLRMConfig, dlrm_init, dlrm_loss
    from nvtabular_tpu.models.training import make_chunk_train_fn
    from nvtabular_tpu.parallel import make_mesh
    from nvtabular_tpu.table import Column, TableBatch

    n = int(os.environ.get("NVT_EXAMPLE_ROWS", 60_000))
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "ad_id": rng.integers(0, 1 << 24, n).astype(np.int64),
            "site": rng.integers(0, 900, n).astype(np.int64),
            "device": rng.integers(0, 7, n).astype(np.int64),
            "price": rng.lognormal(0.0, 1.0, n).astype(np.float32),
            "dwell": rng.normal(30.0, 12.0, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int32),
        }
    )
    # a multihot "topics" column: 0-3 topic ids per row
    lens = rng.integers(0, 4, n)
    values = rng.integers(0, 300, int(lens.sum())).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    batch = TableBatch.from_pandas(df)
    batch["topics"] = Column(values, offsets)

    mesh = make_mesh({"data": -1})
    print(f"mesh: {mesh.devices.size} devices on axis 'data'")

    graph = (
        (["ad_id", "site", "device", "topics"] >> ops.Categorify(freq_threshold=2))
        + (["price"] >> ops.FillMissing() >> ops.LogOp() >> ops.Normalize())
        + (["dwell"] >> ops.FillMissing() >> ops.Normalize())
        + ["label"]
    )
    wf = nvt.Workflow(graph, executor=JitExecutor(jit_min_rows=1024, mesh=mesh))

    t0 = time.perf_counter()
    wf.fit(nvt.Dataset(batch))  # Categorify counts run ON the mesh
    print(f"mesh fit: {time.perf_counter() - t0:.2f}s "
          f"(stats: {wf.last_fit_stats if hasattr(wf, 'last_fit_stats') else '-'})")

    t0 = time.perf_counter()
    out = wf.transform(nvt.Dataset(batch))
    table = out.to_table()  # ragged batch -> shard_map path
    print(f"sharded transform: {time.perf_counter() - t0:.2f}s, "
          f"{table.num_rows} rows, topics still ragged: {table['topics'].is_list}")

    out_dir = tempfile.mkdtemp(prefix="nvt_example05_")
    out.to_parquet(out_dir, shuffle="per_worker", output_files=4)
    print(f"shuffled write -> {out_dir}")

    # train a small DLRM from the written output, chunk-scan feed
    ds = nvt.Dataset(out_dir)
    config = DLRMConfig.from_schema(wf.output_schema, embedding_dim=16)
    params = dlrm_init(jax.random.PRNGKey(0), config)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    bs = 1024
    train_chunk = make_chunk_train_fn(dlrm_loss, opt, bs)
    loader = DeviceLoader(
        ds, batch_size=bs, shuffle=True, seed=0,
        cat_names=["ad_id", "site", "device", "topics"],
        cont_names=["price", "dwell"],
        label_names=["label"],
        sparse_max={"topics": 4},
    )
    t0 = time.perf_counter()
    steps = 0
    last = None
    for chunk in loader.chunks():
        params, opt_state, losses = train_chunk(params, opt_state, chunk)
        steps += int(losses.shape[0])
        last = losses
    jax.block_until_ready(last)
    el = time.perf_counter() - t0
    print(
        f"chunk-scan training: {steps} steps in {el:.2f}s "
        f"({steps * bs / el:,.0f} examples/s), final loss {float(last[-1]):.4f}"
    )


if __name__ == "__main__":
    main()
