"""Scaling the transform: heterogeneous host+device streaming and the
data-parallel mesh executor.

Two production patterns on top of the same fitted workflow:

1. HETEROGENEOUS streaming — route a fraction of the batch stream through
   the native host engine (C++ hash encodes + fused cont-pipe) while the
   rest runs as the fused XLA program on the accelerator. Both engines of
   the machine stay busy; on one v5e host this is the headline-bench
   configuration (~60% host / 40% device, 13M rows/s vs ~4.6M device-only
   — bench.py, kernels/README.md).

2. MESH data parallelism — `JitExecutor(mesh=...)` shards each batch's
   rows over the `data` axis of a jax.sharding.Mesh; fitted lookup tables
   replicate and XLA GSPMD compiles ONE program for all devices. This is
   how transform throughput scales past a chip (BASELINE configs 4-5);
   run under `XLA_FLAGS=--xla_force_host_platform_device_count=8` +
   CPU jax to validate without hardware (tests/unit/parallel/
   test_mesh_executor.py drives it the same way).

Run: python examples/04_scaling_hetero.py
"""

import os
import tempfile
import time

import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


def make_data(n: int) -> pd.DataFrame:
    rng = np.random.default_rng(4)
    return pd.DataFrame(
        {
            "userId": rng.choice(rng.integers(0, 1 << 30, 40_000), n).astype(np.int64),
            "itemId": rng.integers(0, 500, n).astype(np.int64),
            "price": rng.lognormal(2.0, 1.0, n).astype(np.float32),
            "clicks": rng.poisson(2.0, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int32),
        }
    )


def main():
    n = int(os.environ.get("NVT_EXAMPLE_ROWS", 400_000))
    dataset = nvt.Dataset(make_data(n), npartitions=8)

    cats = ["userId", "itemId"] >> ops.Categorify()
    conts = (
        ["price", "clicks"]
        >> ops.FillMissing()
        >> ops.LogOp()
        >> ops.Normalize()
    )
    workflow = nvt.Workflow(cats + conts + ["label"])
    workflow.fit(dataset)

    # -- 1. heterogeneous streaming transform → shuffled parquet ----------
    transformed = workflow.transform(dataset)
    out_dir = tempfile.mkdtemp(prefix="nvt_example04_")
    t0 = time.perf_counter()
    rows = 0
    from nvtabular_tpu.io.writer import ParquetWriter, _write_metadata

    writer = ParquetWriter(out_dir, num_files=4)
    # hetero=0.6: ~60% of batches on the host engine, 40% on the device,
    # outputs stream back in input order
    for batch in transformed.to_batches(hetero=0.6):
        writer.append(batch)
        rows += batch.num_rows
    _write_metadata(out_dir, writer.close())
    print(
        f"hetero transform+write: {rows} rows in "
        f"{time.perf_counter() - t0:.2f}s -> {out_dir}"
    )

    # -- 2. the same workflow on a device mesh (data-parallel rows) -------
    import jax

    if len(jax.devices()) > 1:
        from nvtabular_tpu.dag.executor import JitExecutor
        from nvtabular_tpu.parallel import make_mesh

        mesh = make_mesh({"data": -1})
        mesh_wf = nvt.Workflow(
            (["userId", "itemId"] >> ops.Categorify())
            + (["price", "clicks"] >> ops.FillMissing() >> ops.LogOp() >> ops.Normalize())
            + ["label"],
            executor=JitExecutor(jit_min_rows=1024, mesh=mesh),
        )
        out = mesh_wf.fit_transform(dataset)
        got = sum(b.num_rows for b in out.to_batches())
        print(f"mesh transform over {len(jax.devices())} devices: {got} rows")
    else:
        print("single device: skipping the mesh variant (run with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU)")


if __name__ == "__main__":
    main()
