"""Rename (reference nvtabular/ops/rename.py:20-78)."""

from __future__ import annotations

from typing import Callable, Optional

from ..selector import ColumnSelector
from ..table import TableBatch
from .operator import Operator


class Rename(Operator):
    jit_safe = True

    def __init__(self, f: Optional[Callable] = None, postfix: Optional[str] = None, name: Optional[str] = None):
        if not any([f, postfix, name]):
            raise ValueError("Rename requires one of: f, postfix, name")
        super().__init__()
        self.f = f
        self.postfix = postfix
        self.name = name

    def _new_name(self, old: str) -> str:
        if self.f:
            return self.f(old)
        if self.postfix:
            return f"{old}{self.postfix}"
        return self.name

    def column_mapping(self, col_selector: ColumnSelector):
        if self.name and len(col_selector.names) > 1:
            raise ValueError("Rename(name=...) requires exactly one input column")
        return {self._new_name(n): [n] for n in col_selector.names}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            out[self._new_name(name)] = batch[name]
        return out

    def serialize_params(self):
        from ..workflow.callable_ref import callable_to_ref

        return {
            "f": callable_to_ref(self.f) if self.f else None,
            "postfix": self.postfix,
            "name": self.name,
        }

    @classmethod
    def deserialize_params(cls, params):
        from ..workflow.callable_ref import ref_to_callable

        return {
            "f": ref_to_callable(params["f"]) if params.get("f") else None,
            "postfix": params.get("postfix"),
            "name": params.get("name"),
        }
