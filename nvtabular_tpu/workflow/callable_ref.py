"""Serialize named callables by module+qualname; reject lambdas/__main__.

Pickle-free function persistence, matching the reference's rules
(graph_serializer.py `_callable_to_dict`: lambdas and `__main__` functions
raise WorkflowSerializationError; named functions re-import by module path).
"""

from __future__ import annotations

import importlib
from typing import Any, Dict


class WorkflowSerializationError(Exception):
    pass


def callable_to_ref(fn) -> Dict[str, Any]:
    name = getattr(fn, "__name__", None)
    module = getattr(fn, "__module__", None)
    qualname = getattr(fn, "__qualname__", name)
    if name is None or module is None:
        raise WorkflowSerializationError(f"Cannot serialize callable {fn!r}")
    if name == "<lambda>":
        raise WorkflowSerializationError(
            "Cannot serialize a lambda; define a named function at module scope"
        )
    if module in ("__main__", "builtins") and module != "builtins":
        raise WorkflowSerializationError(
            f"Cannot serialize function {name!r} defined in __main__; "
            "move it to an importable module"
        )
    if "<locals>" in (qualname or ""):
        raise WorkflowSerializationError(
            f"Cannot serialize nested function {qualname!r}; "
            "define it at module scope"
        )
    return {"module": module, "qualname": qualname}


def ref_to_callable(ref: Dict[str, Any]):
    if callable(ref):
        return ref
    module = importlib.import_module(ref["module"])
    obj: Any = module
    for part in ref["qualname"].split("."):
        obj = getattr(obj, part)
    if not callable(obj):
        raise WorkflowSerializationError(f"{ref} did not resolve to a callable")
    return obj
