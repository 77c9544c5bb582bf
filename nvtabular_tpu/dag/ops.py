"""Built-in structural operators: selection, concat, subset, UDF, subgraph.

Analogs of merlin.dag's built-ins used by the reference
(nvtabular/workflow/graph_serializer.py:38-42,873,880).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from .. import dtypes as md
from ..schema import Schema
from ..selector import ColumnSelector
from ..table import TableBatch, concat_columns
from .base_operator import BaseOperator


class SelectionOp(BaseOperator):
    """Pass through the selected columns."""

    def __init__(self, selector: Optional[ColumnSelector] = None):
        self.selector = selector if isinstance(selector, ColumnSelector) else ColumnSelector(selector)
        super().__init__()

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        selector = col_selector or self.selector
        names = [n for n in selector.names if n in batch]
        return batch.select(names)

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        base = self.selector if self.selector else (selector or ColumnSelector())
        return base.resolve(input_schema)

    def compute_input_schema(self, root_schema, parents_schema, deps_schema, selector):
        upstream = parents_schema + deps_schema
        if len(upstream):
            return upstream
        return root_schema

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        selector = col_selector or self.selector
        return input_schema.apply(selector)

    def serialize_params(self):
        return {"selector": self.selector.to_dict() if self.selector else None}

    @classmethod
    def deserialize_params(cls, params):
        return {"selector": ColumnSelector.from_dict(params.get("selector"))}

    def __repr__(self):
        return f"<SelectionOp {self.selector!r}>"


class ConcatColumns(BaseOperator):
    """Join the column sets of multiple parent branches (the `+` operator)."""

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        return (parents_selector or ColumnSelector()) + (dependencies_selector or ColumnSelector())

    def compute_input_schema(self, root_schema, parents_schema, deps_schema, selector):
        return parents_schema + deps_schema

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        return input_schema

    def transform(self, col_selector: ColumnSelector, batches: List[TableBatch]) -> TableBatch:
        # executor passes the list of parent outputs for concat nodes
        if isinstance(batches, TableBatch):
            return batches
        return concat_columns(batches)


class SubsetColumns(BaseOperator):
    """Remove a set of columns (the `-` operator)."""

    def __init__(self, to_remove=None):
        if isinstance(to_remove, ColumnSelector):
            self.to_remove = to_remove
        elif to_remove is None:
            self.to_remove = ColumnSelector()
        else:
            self.to_remove = ColumnSelector(to_remove)
        super().__init__()

    def _removed_names(self) -> List[str]:
        from .node import Node

        if isinstance(self.to_remove, Node):
            return self.to_remove.output_columns
        return self.to_remove.names

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        return batch.drop([n for n in self._removed_names() if n in batch])

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        return input_schema.excluding_by_name(self._removed_names())

    def serialize_params(self):
        return {"to_remove": self.to_remove.to_dict()}

    @classmethod
    def deserialize_params(cls, params):
        return {"to_remove": ColumnSelector.from_dict(params.get("to_remove"))}


class UDF(BaseOperator):
    """Apply a named python function column-wise (reference LambdaOp /
    merlin.dag.ops.udf.UDF, nvtabular/ops/lambdaop.py:18-51).

    The function receives a Column (and optionally the whole TableBatch) and
    returns array-like/Column. Lambdas work for in-session use but are
    rejected at serialization time, matching the reference
    (graph_serializer.py `_callable_to_dict`).
    """

    jit_safe = False  # user code: run host-side unless proven traceable

    def __init__(self, f: Callable, dtype=None, tags=None, properties=None, label=None):
        if not callable(f):
            raise ValueError("UDF requires a callable")
        self.f = f
        self._dtype = dtype
        self._tags = tags or []
        self._properties = properties or {}
        self._label = label
        super().__init__()

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        import inspect

        import numpy as np

        from ..table import Column, as_column

        out = TableBatch()
        n_params = 1
        if not isinstance(self.f, np.ufunc):
            try:
                n_params = len(
                    [
                        p
                        for p in inspect.signature(self.f).parameters.values()
                        if p.kind
                        in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                        and p.default is p.empty
                    ]
                ) or 1
            except (ValueError, TypeError):  # builtins/ufuncs without signatures
                n_params = 1
        for name in col_selector.names:
            col = batch[name]
            res = self.f(col, batch) if n_params >= 2 else self.f(col)
            res = as_column(res)
            # list column + elementwise result over the flat values →
            # re-wrap with the original offsets (LambdaOp list-awareness)
            if col.is_list and not res.is_list and len(res.values) == len(col.values):
                res = Column(res.values, col.offsets, col.validity)
            out[name] = res
        return out

    @property
    def output_dtype(self):
        return self._dtype

    @property
    def output_tags(self):
        return self._tags

    @property
    def output_properties(self):
        return self._properties

    @property
    def dynamic_dtypes(self) -> bool:
        return self._dtype is None

    @property
    def label(self) -> str:
        if self._label:
            return self._label
        name = getattr(self.f, "__name__", "")
        return "UDF" if name in ("", "<lambda>") else f"UDF({name})"

    def serialize_params(self):
        from ..workflow.callable_ref import callable_to_ref

        return {
            "f": callable_to_ref(self.f),
            "dtype": self._dtype.name if isinstance(self._dtype, md.DType) else self._dtype,
            "tags": [str(t) for t in self._tags],
            "properties": self._properties,
            "label": self._label,
        }

    @classmethod
    def deserialize_params(cls, params):
        from ..workflow.callable_ref import ref_to_callable

        return {
            "f": ref_to_callable(params["f"]),
            "dtype": params.get("dtype"),
            "tags": params.get("tags") or [],
            "properties": params.get("properties") or {},
            "label": params.get("label"),
        }


class Subgraph(BaseOperator):
    """A named nested graph, addressable via Workflow.get_subworkflow
    (reference workflow.py:168, graph.subgraph at workflow.py:169)."""

    def __init__(self, name: str, output_node):
        from .graph import Graph
        from .node import Node

        self.name = name
        if isinstance(output_node, Graph):
            self.graph = output_node
        elif isinstance(output_node, Node):
            self.graph = Graph(output_node)
        else:
            # selector/list → wrap in a selection node
            self.graph = Graph(Node(ColumnSelector(output_node)))
        super().__init__()

    def compute_input_schema(self, root_schema, parents_schema, deps_schema, selector):
        upstream = parents_schema + deps_schema
        if not len(upstream):
            upstream = root_schema
        self.graph.construct_schema(upstream)
        return upstream

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        if self.graph.output_schema is None:
            self.graph.construct_schema(input_schema)
        return self.graph.output_schema

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        from .executor import LocalExecutor

        return LocalExecutor().transform_batch(batch, self.graph.output_node)

    @property
    def label(self) -> str:
        return f"Subgraph({self.name})"
