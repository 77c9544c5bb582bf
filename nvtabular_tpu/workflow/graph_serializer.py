"""Pickle-free workflow persistence: graph.json + parquet artifacts.

Analog of the reference's graph serializer (nvtabular/workflow/
graph_serializer.py, 1165 LoC): human-readable JSON topology with op params
and inline fitted state, large statistics as parquet artifacts under
``artifacts/node_<id>/``, per-op registry, lambda/`__main__` function
rejection, subgraph recursion, schemas embedded per node.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from ..dag import Graph, Node
from ..dag.base_operator import BaseOperator, StatOperator
from ..dag.graph import postorder_iter_nodes
from ..dag.ops import ConcatColumns, SelectionOp, SubsetColumns, Subgraph, UDF
from ..schema import Schema
from ..selector import ColumnSelector
from .callable_ref import WorkflowSerializationError

GRAPH_FILE = "graph.json"
ARTIFACTS_DIR = "artifacts"

# Registry of serializable operator types. Custom Operator subclasses can be
# registered via `register_op`; unknown types are rejected at load time
# (a restricted-import guard, like the reference's allow-listed unpickler).
_OP_REGISTRY: Dict[str, type] = {}


def register_op(cls: type) -> type:
    _OP_REGISTRY[cls.__name__] = cls
    return cls


def _build_registry():
    from .. import ops as op_lib

    for name in op_lib.__all__:
        obj = getattr(op_lib, name)
        if isinstance(obj, type) and issubclass(obj, BaseOperator):
            _OP_REGISTRY[obj.__name__] = obj
    for cls in (SelectionOp, ConcatColumns, SubsetColumns, UDF, Subgraph):
        _OP_REGISTRY[cls.__name__] = cls


def serialize_graph(graph: Graph, path: str) -> None:
    _build_registry()
    os.makedirs(path, exist_ok=True)
    records = _serialize_nodes(graph, path)
    schema = graph.input_schema
    doc = {
        "format_version": 1,
        "nodes": records,
        "input_schema": schema.to_dict() if schema else None,
    }
    with open(os.path.join(path, GRAPH_FILE), "w") as f:
        json.dump(doc, f, indent=2, default=_json_default)


def _serialize_nodes(graph: Graph, path: str) -> List[Dict[str, Any]]:
    nodes = postorder_iter_nodes(graph.output_node)
    node_ids = {id(n): i for i, n in enumerate(nodes)}
    records = []
    for node in nodes:
        nid = node_ids[id(node)]
        records.append(_serialize_node(node, nid, node_ids, path))
    return records


def _serialize_node(node: Node, nid: int, node_ids: Dict[int, int], path: str) -> Dict[str, Any]:
    op = node.op
    op_type = type(op).__name__
    if op_type not in _OP_REGISTRY:
        raise WorkflowSerializationError(
            f"Operator type {op_type} is not registered for serialization; "
            "call nvtabular_tpu.workflow.graph_serializer.register_op"
        )

    # file-backed state moves into the artifact dir (reference
    # set_storage_path(..., copy=True), categorify.py:1855-1881); any op
    # defining set_storage_path participates (Categorify vocabs,
    # JoinExternal table, ColumnSimilarity CSR matrices)
    set_path = getattr(op, "set_storage_path", None)
    if callable(set_path) and (
        not isinstance(op, StatOperator) or getattr(op, "categories", None)
    ):
        artifact_dir = os.path.join(path, ARTIFACTS_DIR, f"node_{nid}")
        op.set_storage_path(artifact_dir, copy=True)

    record: Dict[str, Any] = {
        "id": nid,
        "op_type": op_type,
        "params": op.serialize_params(),
        "state": op.serialize_state(),
        "selector": node.selector.to_dict() if node.selector is not None else None,
        "parents": [node_ids[id(p)] for p in node.parents],
        "dependencies": [node_ids[id(d)] for d in node.dependencies],
        "input_schema": node.input_schema.to_dict() if node.input_schema else None,
        "output_schema": node.output_schema.to_dict() if node.output_schema else None,
        "fitted": bool(getattr(op, "fitted", False)),
    }
    if isinstance(op, Subgraph):
        record["subgraph"] = {
            "name": op.name,
            "nodes": _serialize_nodes(op.graph, path),
        }
        record["params"] = {}
    # make artifact paths relative to the workflow dir for portability
    record["state"] = _relativize_paths(record["state"], path)
    record["params"] = _relativize_paths(record["params"], path)
    return record


def deserialize_graph(path: str) -> Graph:
    _build_registry()
    with open(os.path.join(path, GRAPH_FILE)) as f:
        doc = json.load(f)
    output_node = _deserialize_nodes(doc["nodes"], path)
    return Graph(output_node)


def _deserialize_nodes(records: List[Dict[str, Any]], path: str) -> Node:
    nodes: Dict[int, Node] = {}
    last = None
    for record in records:
        node = _deserialize_node(record, nodes, path)
        nodes[record["id"]] = node
        last = node
    return last


def _deserialize_node(record: Dict[str, Any], nodes: Dict[int, Node], path: str) -> Node:
    op_type = record["op_type"]
    cls = _OP_REGISTRY.get(op_type)
    if cls is None:
        raise WorkflowSerializationError(f"Unknown operator type {op_type!r}")

    if op_type == "Subgraph":
        sub_out = _deserialize_nodes(record["subgraph"]["nodes"], path)
        op = Subgraph(record["subgraph"]["name"], sub_out)
    else:
        params = cls.deserialize_params(
            _derelativize_paths(record.get("params") or {}, path)
        )
        op = cls(**params)
        state = _derelativize_paths(record.get("state"), path)
        if state is not None and hasattr(op, "deserialize_state"):
            op.deserialize_state(state)

    node = Node(op=op)
    node.op = op
    node.selector = ColumnSelector.from_dict(record.get("selector"))
    if record.get("input_schema"):
        node.input_schema = Schema.from_dict(record["input_schema"])
    if record.get("output_schema"):
        node.output_schema = Schema.from_dict(record["output_schema"])
    if record.get("fitted") and isinstance(op, StatOperator):
        op.fitted = True
        # generation >= 1: a later fit() on the loaded workflow REFITS this
        # op (reference semantics) — unlike constructor-supplied state
        # (vocabs=), which stays at generation 0 and is kept
        op.fit_generation = max(getattr(op, "fit_generation", 0), 1)
    for pid in record.get("parents", []):
        node.add_parent(nodes[pid])
    for did in record.get("dependencies", []):
        node.add_dependency(nodes[did])
    return node


def _relativize_paths(obj, base: str):
    if isinstance(obj, dict):
        return {k: _relativize_paths(v, base) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_relativize_paths(v, base) for v in obj]
    if isinstance(obj, str) and obj.startswith(os.path.abspath(base) + os.sep):
        return os.path.relpath(obj, base)
    if isinstance(obj, str) and base and obj.startswith(base.rstrip("/") + "/"):
        return os.path.relpath(obj, base)
    return obj


def _derelativize_paths(obj, base: str):
    if isinstance(obj, dict):
        return {k: _derelativize_paths(v, base) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_derelativize_paths(v, base) for v in obj]
    if isinstance(obj, str) and obj.startswith(ARTIFACTS_DIR + os.sep):
        return os.path.join(base, obj)
    return obj


def _json_default(obj):
    import numpy as np

    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f"Cannot serialize {type(obj)} to JSON")
