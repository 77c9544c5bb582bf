from ..dag.node import Node as WorkflowNode
from .workflow import Workflow

__all__ = ["Workflow", "WorkflowNode"]
