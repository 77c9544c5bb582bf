"""DAG engine: graph DSL, schema propagation, executors.

TPU-native re-creation of the external ``merlin.dag`` engine the reference
depends on (interface reconstructed from call sites, see SURVEY.md §1-L0 and
§2.9; e.g. reference nvtabular/workflow/workflow.py:73,138,147-163).
"""

from .base_operator import BaseOperator, StatOperator, Supports
from .graph import Graph, iter_nodes, postorder_iter_nodes
from .node import Node
from .ops import ConcatColumns, SelectionOp, SubsetColumns, Subgraph, UDF
from ..selector import ColumnSelector

__all__ = [
    "BaseOperator",
    "StatOperator",
    "Supports",
    "Graph",
    "Node",
    "ColumnSelector",
    "ConcatColumns",
    "SelectionOp",
    "SubsetColumns",
    "Subgraph",
    "UDF",
    "iter_nodes",
    "postorder_iter_nodes",
]
