"""LambdaOp: alias of the DAG-level UDF op
(reference nvtabular/ops/lambdaop.py:18-51)."""

from ..dag.ops import UDF


class LambdaOp(UDF):
    def __init__(self, f, dtype=None, tags=None, properties=None, label=None):
        super().__init__(f, dtype=dtype, tags=tags, properties=properties, label=label)
