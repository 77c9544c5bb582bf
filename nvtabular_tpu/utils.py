"""Runtime utilities — parity with the reference's merlin.core.utils surface
(reference call sites: `device_mem_size`, `Distributed`/`Serial` execution
managers, `set_dask_client`/`global_dask_client` — nvtabular/__init__.py:20-35,
tests/unit/test_dask_nvt.py:321-336, bench driver :40).

TPU mapping: there is no dask cluster to manage; ``Distributed`` establishes
the multi-controller jax runtime + a device mesh, ``Serial`` pins execution
to one device. Both are usable as context managers exactly like the
reference's."""

from __future__ import annotations

import contextlib
from typing import Optional


def device_mem_size(kind: str = "total", cpu: bool = False) -> int:
    """Bytes of device memory (HBM per chip), or host RAM with cpu=True
    (reference device_mem_size)."""
    if cpu:
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        return int(line.split()[1]) * 1024
        except OSError:
            pass
        return 0
    try:
        import jax

        stats = jax.devices()[0].memory_stats() or {}
        total = stats.get("bytes_limit", 0) or 16 * 1024**3  # nominal v5e HBM
        if kind == "free":
            return total - stats.get("bytes_in_use", 0)
        return total
    except Exception:
        return 16 * 1024**3  # nominal v5e HBM


_global_client = None


def set_dask_client(client=None):
    """Compat no-op registry (reference set_dask_client): there is no
    external scheduler; kept so reference-style code runs unchanged."""
    global _global_client
    _global_client = client
    return client


def global_dask_client():
    return _global_client


def run_on_worker(func, *args, **kwargs):
    """Reference `run_on_worker` — no workers here; run inline."""
    return func(*args, **kwargs)


class Distributed(contextlib.AbstractContextManager):
    """Establish the distributed jax runtime + a device mesh for the block
    (the reference spins up a LocalCUDACluster, test_dask_nvt.py:321-336)."""

    def __init__(self, axes: Optional[dict] = None, **kwargs):
        from .parallel import initialize_distributed, make_mesh

        initialize_distributed()
        self.mesh = make_mesh(axes or {"data": -1})
        self.client = self  # reference exposes .client; self is the handle

    def __enter__(self):
        self._ctx = self.mesh
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)


class Serial(contextlib.AbstractContextManager):
    """Single-device execution block (reference Serial)."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def pynvml_mem_size(kind: str = "total", index: int = 0) -> int:
    """Compat alias of device_mem_size (reference pynvml_mem_size)."""
    return device_mem_size(kind)


def get_rmm_size(size) -> int:
    """Compat: RMM pool sizing has no TPU analog (XLA owns HBM); returns the
    requested size parsed to bytes."""
    if isinstance(size, (int, float)):
        return int(size)
    from .io.dataset import _parse_bytes

    return _parse_bytes(str(size))
