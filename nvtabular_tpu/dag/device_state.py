"""Device-state threading: large fitted arrays as jit ARGUMENTS.

Embedding multi-MB fitted state (vocab lookup tables) as constants inside a
traced program sends XLA's constant-handling passes quadratic — observed
~400 s compiles for the 26-column Criteo transform vs seconds without. Ops
therefore publish their big arrays via ``BaseOperator.device_state()``; the
JitExecutor passes them as a pytree argument and sets this context during
tracing so ops fetch the traced handles instead of materializing constants.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Dict, Optional

_local = threading.local()


@contextlib.contextmanager
def device_state_scope(state: Dict[str, Any]):
    prev = getattr(_local, "state", None)
    _local.state = state
    try:
        yield
    finally:
        _local.state = prev


def get_device_state(key: str) -> Optional[Any]:
    state = getattr(_local, "state", None)
    if state is None:
        return None
    return state.get(key)


@contextlib.contextmanager
def row_offset_scope(lanes):
    """Traced (lo, hi) uint32 lanes of the batch's global row offset —
    set by the JitExecutor during tracing so ops needing absolute row
    indices (k-fold assignment) read an ARGUMENT, not a baked constant."""
    prev = getattr(_local, "row_offset", None)
    _local.row_offset = lanes
    try:
        yield
    finally:
        _local.row_offset = prev


def get_row_offset_dev():
    return getattr(_local, "row_offset", None)
