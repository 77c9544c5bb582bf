"""Device mesh construction.

Replaces the reference's cluster bring-up (``LocalCUDACluster(protocol=
"tcp"|"ucx", ...)``, dask-scheduler/dask-cuda-worker processes — reference
bench/examples/dask-nvtabular-criteo-benchmark.py:174-194, docs
core_features.md "Multi-Node Support") with JAX's multi-controller runtime:
``jax.distributed.initialize()`` once per host, then a named
``jax.sharding.Mesh`` over all devices. Collectives compile to ICI
(intra-slice) / DCN (inter-slice) transfers — no scheduler process exists.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def initialize_distributed(**kwargs) -> None:
    """Idempotent ``jax.distributed.initialize`` (multi-host only; a no-op
    single-process)."""
    import jax

    try:
        if jax.process_count() > 1 or kwargs:
            jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized


def make_mesh(
    axes: Dict[str, int],
    devices: Optional[Sequence] = None,
):
    """Build a named Mesh from axis-name → size. Sizes must multiply to the
    device count; a single ``-1`` axis absorbs the remainder.

    Axis convention: ``data`` = batch/data parallel (P1/P6 in SURVEY §2.8),
    ``model`` = embedding-table row sharding (P7). Lay ``model`` innermost so
    its collectives ride ICI.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = dict(axes)
    wild = [k for k, v in sizes.items() if v == -1]
    if len(wild) > 1:
        raise ValueError("at most one axis may be -1")
    fixed = int(np.prod([v for v in sizes.values() if v != -1])) if sizes else 1
    if wild:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[wild[0]] = n // fixed
    elif fixed != n:
        raise ValueError(f"axis sizes {sizes} do not multiply to {n} devices")
    shape = tuple(sizes.values())
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(sizes.keys()))


def local_mesh(data: int = -1, model: int = 1, devices=None):
    """Convenience 2-axis (data, model) mesh."""
    return make_mesh({"data": data, "model": model}, devices)
