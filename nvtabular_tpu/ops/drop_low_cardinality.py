"""DropLowCardinality (reference nvtabular/ops/drop_low_cardinality.py:53-89):
schema-driven drop of categorical columns whose fitted cardinality is below
`min_cardinality` — implemented purely in compute_selector, like the
reference."""

from __future__ import annotations

from ..selector import ColumnSelector
from ..table import TableBatch
from ..tags import Tags
from .operator import Operator


class DropLowCardinality(Operator):
    jit_safe = True

    def __init__(self, min_cardinality: int = 4):  # reference default, :28
        super().__init__()
        self.min_cardinality = min_cardinality

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        base = super().compute_selector(input_schema, selector, parents_selector, dependencies_selector)
        keep = []
        for name in base.names:
            cs = input_schema.get(name)
            if cs is None:
                continue
            if Tags.CATEGORICAL in cs.tags:
                domain = cs.properties.get("domain")
                if domain is not None and domain.get("max", 0) < self.min_cardinality:
                    # drop only on strict < (reference drop_low_cardinality.py:86
                    # KEEPS columns with int_domain.max >= min_cardinality)
                    continue
            keep.append(name)
        return ColumnSelector(keep)

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        return batch.select([n for n in col_selector.names if n in batch])

    def serialize_params(self):
        return {"min_cardinality": self.min_cardinality}
