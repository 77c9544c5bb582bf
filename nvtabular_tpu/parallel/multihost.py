"""Multi-host coordination for the fit engine.

The reference distributes fit state through dask's scheduler (client
gathers per-worker partials, SURVEY §3.1). In the multi-controller JAX
runtime there is no scheduler process: every host streams ITS shard of
partitions (Dataset.to_batches(shard=(process_index, process_count))),
then per-op accumulator states are exchanged with one allgather over DCN
and merged identically on every host via ``StatOperator.fit_merge`` —
deterministic, so all hosts end with bit-identical fitted state.
"""

from __future__ import annotations

import pickle
from typing import Any, List


def _jax_runtime_engaged() -> bool:
    """True when asking jax for process topology will NOT trigger a fresh
    backend initialization (a ~10 s tunnel/client connect that host-only
    fits must not pay): either jax.distributed.initialize has run, or some
    backend is already up (e.g. a Mesh was built, arrays were placed —
    the normal state on a multi-process TPU pod by fit time)."""
    try:
        from jax._src import distributed

        if distributed.global_state.client is not None:
            return True
    except Exception:
        pass
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:
        return False


def process_count() -> int:
    if not _jax_runtime_engaged():
        return 1
    import jax

    return jax.process_count()


def process_index() -> int:
    if not _jax_runtime_engaged():
        return 0
    import jax

    return jax.process_index()


def allgather_pyobj(obj: Any) -> List[Any]:
    """Gather one python object from every process (pickle → padded uint8
    allgather → unpickle). Single-process: [obj]."""
    n = process_count()
    if n == 1:
        return [obj]
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    length = np.array([len(payload)], dtype=np.int64)
    all_lengths = np.asarray(multihost_utils.process_allgather(length)).reshape(-1)
    max_len = int(all_lengths.max())
    buf = np.zeros(max_len, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(n, max_len)
    return [
        pickle.loads(gathered[i, : int(all_lengths[i])].tobytes()) for i in range(n)
    ]
