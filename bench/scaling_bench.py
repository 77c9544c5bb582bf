"""DLRM training scaling sweep over mesh sizes.

The BASELINE scaling target: examples/s at 1 chip, 1 host, N hosts
(BASELINE.md). This driver sweeps data-parallel mesh widths on whatever
devices are visible — real chips on a pod, or a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) to validate the
sharded program. Reports per-config examples/s as JSON.

Usage:
    python bench/scaling_bench.py --batch-size 8192 --steps 20
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench/scaling_bench.py --virtual-cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=8192, help="GLOBAL batch size")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--embedding-dim", type=int, default=64)
    p.add_argument("--cats", type=int, default=26)
    p.add_argument("--cardinality", type=int, default=100_000)
    p.add_argument("--model-axis", type=int, default=1,
                   help="embedding row-sharding width (rest of devices → data axis)")
    p.add_argument("--virtual-cpu", action="store_true",
                   help="force the virtual CPU mesh (validation mode)")
    return p.parse_args()


def main():
    args = parse_args()
    if args.virtual_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if args.virtual_cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    from nvtabular_tpu.models import (
        DLRMConfig, dlrm_init, dlrm_loss, dlrm_param_specs, make_synthetic_batch,
    )
    from nvtabular_tpu.models.dlrm import batch_specs
    from nvtabular_tpu.parallel import make_mesh, make_train_step, shard_batch, shard_params

    devices = jax.devices()
    results = []
    widths = sorted({w for w in (1, 2, 4, 8, len(devices)) if w <= len(devices)})
    for width in widths:
        mesh_devices = devices[:width]
        model = args.model_axis if width % max(args.model_axis, 1) == 0 and args.model_axis <= width else 1
        mesh = make_mesh({"data": -1, "model": model}, mesh_devices)
        config = DLRMConfig(
            cardinalities={f"C{i}": args.cardinality for i in range(args.cats)},
            num_dense=13,
            embedding_dim=args.embedding_dim,
            vocab_pad_multiple=model,
        )
        params = dlrm_init(jax.random.PRNGKey(0), config)
        p_specs = dlrm_param_specs(params)
        b_specs = batch_specs(config)
        params = shard_params(params, p_specs, mesh)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_train_step(
            dlrm_loss, opt, mesh=mesh, param_specs=p_specs, batch_specs=b_specs
        )
        batch = shard_batch(make_synthetic_batch(config, args.batch_size), b_specs, mesh)
        params, opt_state, loss = step(params, opt_state, batch)  # compile
        float(loss)  # force (axon: execution is readback-driven)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, loss = step(params, opt_state, batch)
        final = float(loss)
        dt = time.perf_counter() - t0
        results.append(
            {
                "devices": width,
                "mesh": {"data": width // model, "model": model},
                "examples_per_s": round(args.steps * args.batch_size / dt, 1),
                "step_ms": round(dt / args.steps * 1000, 2),
                "final_loss": round(final, 5),
            }
        )
    print(json.dumps({
        "batch_size": args.batch_size,
        "platform": devices[0].platform,
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
