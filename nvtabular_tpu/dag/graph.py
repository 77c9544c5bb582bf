"""Graph: DAG container + schema propagation pass.

Analog of ``merlin.dag.Graph`` (interface at reference
nvtabular/workflow/workflow.py:73,138,147-163,192,169,357).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set

from ..schema import Schema
from ..selector import ColumnSelector
from .node import Node


def iter_nodes(nodes: List[Node]):
    """BFS over nodes and all their upstream parents/dependencies."""
    queue = list(nodes)
    seen: Set[int] = set()
    while queue:
        node = queue.pop(0)
        if id(node) in seen:
            continue
        seen.add(id(node))
        yield node
        queue.extend(node.parents_with_dependencies)


def postorder_iter_nodes(output_node: Node) -> List[Node]:
    """Topological order: every node after all of its inputs."""
    order: List[Node] = []
    visited: Set[int] = set()

    def visit(node: Node):
        if id(node) in visited:
            return
        visited.add(id(node))
        for parent in node.parents_with_dependencies:
            visit(parent)
        order.append(node)

    visit(output_node)
    return order


class Graph:
    def __init__(self, output_node: Node):
        from .ops import Subgraph

        if not isinstance(output_node, Node):
            output_node = Node(ColumnSelector(output_node))
        self.output_node = output_node
        self.subgraphs: Dict[str, "Graph"] = {}
        for node in iter_nodes([output_node]):
            if isinstance(node.op, Subgraph):
                self.subgraphs[node.op.name] = node.op.graph

    # --- schema propagation -------------------------------------------------
    def construct_schema(self, root_schema: Schema, preserve_dtypes: bool = False) -> "Graph":
        for node in postorder_iter_nodes(self.output_node):
            node.compute_schemas(root_schema, preserve_dtypes=preserve_dtypes)
        return self

    @property
    def input_schema(self) -> Optional[Schema]:
        leaves = self.leaf_nodes
        if not leaves or any(n.input_schema is None for n in leaves):
            return None
        out = Schema()
        for n in leaves:
            out = out + n.input_schema
        return out

    @property
    def output_schema(self) -> Optional[Schema]:
        return self.output_node.output_schema

    @property
    def input_dtypes(self):
        schema = self.input_schema
        return {cs.name: cs.dtype for cs in schema} if schema else {}

    @property
    def output_dtypes(self):
        schema = self.output_schema
        return {cs.name: cs.dtype for cs in schema} if schema else {}

    @property
    def column_mapping(self) -> Dict[str, List[str]]:
        if self.output_node.selector is None:
            return {}
        return self.output_node.op.column_mapping(self.output_node.selector)

    # --- node access ---------------------------------------------------------
    @property
    def nodes(self) -> List[Node]:
        return postorder_iter_nodes(self.output_node)

    @property
    def leaf_nodes(self) -> List[Node]:
        return [n for n in self.nodes if not n.parents_with_dependencies]

    def get_nodes_by_op_type(self, nodes, op_type) -> List[Node]:
        return list({id(n): n for n in iter_nodes(list(nodes)) if isinstance(n.op, op_type)}.values())

    def subgraph(self, name: str) -> "Graph":
        if name not in self.subgraphs:
            raise ValueError(f"No subgraph named {name!r}; have {list(self.subgraphs)}")
        return self.subgraphs[name]

    # --- stat-op phases ---------------------------------------------------
    def stat_phases(self) -> List[List[Node]]:
        """Group StatOperator nodes into phases: a stat op whose upstream
        contains another *unfitted* stat op must wait for the earlier phase
        (the reference's chained-stat-op semantics,
        tests/unit/workflow/test_workflow_chaining.py)."""
        from .base_operator import StatOperator
        from .ops import Subgraph

        depth: Dict[int, int] = {}
        phases: Dict[int, List[Node]] = {}
        for node in self.nodes:  # topo order
            d = 0
            for parent in node.parents_with_dependencies:
                d = max(d, depth.get(id(parent), 0))
            is_stat = isinstance(node.op, StatOperator)
            # a Subgraph with unfitted inner stat ops behaves like a stat
            # node: it must be (recursively) fit before downstream consumers
            if isinstance(node.op, Subgraph) and _has_unfitted_stats(node.op.graph):
                is_stat = True
            if is_stat:
                phases.setdefault(d, []).append(node)
                d += 1
            depth[id(node)] = d
        return [phases[k] for k in sorted(phases)]

    # --- graph edits ------------------------------------------------------
    def remove_inputs(self, to_remove: List[str]) -> List[str]:
        """Delete input columns from the graph's selectors (reference
        Workflow.remove_inputs → Graph.remove_inputs, workflow.py:172-193).
        Returns the columns actually removed."""
        removed = set()
        for node in self.nodes:
            if node.selector is not None:
                before = set(node.selector.names)
                node.selector = node.selector.filter_columns(ColumnSelector(list(to_remove)))
                removed |= before - set(node.selector.names)
            from .ops import SelectionOp

            if isinstance(node.op, SelectionOp) and node.op.selector:
                node.op.selector = node.op.selector.filter_columns(
                    ColumnSelector(list(to_remove))
                )
        return sorted(removed & set(to_remove))

    def __repr__(self):
        return f"<Graph nodes={len(self.nodes)} output={self.output_node.label}>"


def _has_unfitted_stats(graph: "Graph") -> bool:
    from .base_operator import StatOperator
    from .ops import Subgraph

    for node in graph.nodes:
        if isinstance(node.op, StatOperator) and not getattr(node.op, "fitted", False):
            return True
        if isinstance(node.op, Subgraph) and _has_unfitted_stats(node.op.graph):
            return True
    return False
