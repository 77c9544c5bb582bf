"""Restricted deserialization for IPC of workflows/models.

Analog of reference nvtabular/tools/serialization.py:92-146: an
allow-listed ``pickle.Unpickler`` so multi-process pipelines (e.g. ZeroMQ
workers shipping fitted workflows) never execute arbitrary pickle opcodes.
Note the primary Workflow persistence format here is pickle-free JSON
(workflow/graph_serializer.py); this guard covers auxiliary IPC only.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Iterable, Set, Tuple

# (module, qualname) pairs allowed to deserialize — mirrors the reference's
# BASE_SERIALIZATION_CLASSES allow-list (reference serialization.py:10-75)
BASE_SERIALIZATION_CLASSES: Set[Tuple[str, str]] = {
    ("builtins", "complex"),
    ("builtins", "frozenset"),
    ("builtins", "set"),
    ("builtins", "slice"),
    ("builtins", "range"),
    ("builtins", "bytearray"),
    ("collections", "OrderedDict"),
    ("collections", "defaultdict"),
    ("collections", "deque"),
    ("datetime", "date"),
    ("datetime", "datetime"),
    ("datetime", "time"),
    ("datetime", "timedelta"),
    ("numpy", "dtype"),
    ("numpy", "ndarray"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("nvtabular_tpu.schema", "ColumnSchema"),
    ("nvtabular_tpu.schema", "Schema"),
    ("nvtabular_tpu.tags", "Tags"),
    ("nvtabular_tpu.tags", "TagSet"),
    ("nvtabular_tpu.dtypes", "DType"),
}


class Unpickler(pickle.Unpickler):
    """Allow-listed unpickler (reference Unpickler.find_class:100-108)."""

    def __init__(self, file, extra_classes: Iterable[Tuple[str, str]] = ()):
        super().__init__(file)
        self.allowed = BASE_SERIALIZATION_CLASSES | set(extra_classes)

    def find_class(self, module: str, name: str):
        if (module, name) not in self.allowed:
            raise pickle.UnpicklingError(
                f"deserialization of {module}.{name} is not allowed"
            )
        return super().find_class(module, name)


def safe_loads(data: bytes, extra_classes: Iterable[Tuple[str, str]] = ()) -> Any:
    return Unpickler(io.BytesIO(data), extra_classes=extra_classes).load()
