"""Operator base classes and the schema-propagation contract.

Analog of the reference's ``merlin.dag.BaseOperator``/``StatOperator``
(contract documented at SURVEY.md §1-L1; reference call sites
nvtabular/ops/operator.py:16-27, nvtabular/ops/stat_operator.py:16,
nvtabular/ops/categorify.py:345-613).

TPU-native twist on the fit contract: instead of returning a dask.Delayed,
stat operators expose a *streaming accumulator* protocol

    state = op.fit_init(col_selector, input_schema)
    state = op.fit_batch(col_selector, batch, state)   # once per batch, pure
    state = op.fit_merge([state, ...])                  # across shards/hosts
    op.fit_finalize(state)                              # host-side, stores stats

so a single scan over the dataset feeds every stat op of a phase, and
`fit_batch` bodies can be jit-compiled / psum-reduced over a device mesh.
The classic `fit(col_selector, dataset)` entry point is provided on top.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, List, Optional, Union

from .. import dtypes as md
from ..schema import ColumnSchema, Schema
from ..selector import ColumnSelector
from ..table import TableBatch
from ..tags import TagSet


class Supports(enum.Flag):
    """Data formats an operator can accept (reference merlin.dag Supports)."""

    CPU_DATAFRAME = 1
    GPU_DATAFRAME = 2
    CPU_DICT_ARRAY = 4
    GPU_DICT_ARRAY = 8


class BaseOperator:
    # True when transform() is pure jax-traceable with static output shapes,
    # letting the executor fuse it into a single jitted XLA computation.
    jit_safe: bool = True

    # --- transform ------------------------------------------------------
    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        """Per-batch pure transform. Default: identity on selected columns."""
        return batch

    # --- selector / schema propagation ------------------------------------
    def compute_selector(
        self,
        input_schema: Schema,
        selector: Optional[ColumnSelector],
        parents_selector: Optional[ColumnSelector] = None,
        dependencies_selector: Optional[ColumnSelector] = None,
    ) -> ColumnSelector:
        if selector is None or not selector:
            selector = ColumnSelector(input_schema.column_names)
        return selector.resolve(input_schema)

    def compute_input_schema(
        self,
        root_schema: Schema,
        parents_schema: Schema,
        deps_schema: Schema,
        selector: Optional[ColumnSelector],
    ) -> Schema:
        return parents_schema + deps_schema

    def compute_output_schema(
        self,
        input_schema: Schema,
        col_selector: ColumnSelector,
        prev_output_schema: Optional[Schema] = None,
    ) -> Schema:
        if not col_selector or (not col_selector.names and not col_selector.tags):
            col_selector = ColumnSelector(input_schema.column_names)
        if col_selector.tags:
            col_selector = col_selector.resolve(input_schema)

        output_schema = Schema()
        for output_name, input_names in self.column_mapping(col_selector).items():
            col_schema = self.compute_column_schema(
                output_name, input_schema.select_by_name(input_names) or input_schema
            )
            output_schema = output_schema + Schema([col_schema])
        return output_schema

    def column_mapping(self, col_selector: ColumnSelector) -> Dict[str, List[str]]:
        """output column name -> contributing input column names."""
        return {name: [name] for name in col_selector.names}

    def compute_column_schema(self, col_name: str, input_schema: Schema) -> ColumnSchema:
        if len(input_schema):
            source = next(iter(input_schema))
            col_schema = ColumnSchema(
                col_name,
                tags=source.tags,
                properties=dict(source.properties),
                dtype=source.dtype,
                is_list=source.is_list,
                is_ragged=source.is_ragged,
                shape=source.shape,
            )
        else:
            col_schema = ColumnSchema(col_name)
        col_schema = self._compute_dtype(col_schema, input_schema)
        col_schema = self._compute_tags(col_schema, input_schema)
        col_schema = self._compute_properties(col_schema, input_schema)
        col_schema = self._compute_shape(col_schema, input_schema)
        return col_schema

    def _compute_dtype(self, col_schema: ColumnSchema, input_schema: Schema) -> ColumnSchema:
        if self.output_dtype is not None:
            return col_schema.with_dtype(md.normalize(self.output_dtype))
        return col_schema

    def _compute_tags(self, col_schema: ColumnSchema, input_schema: Schema) -> ColumnSchema:
        if self.output_tags:
            # an op declaring one side of a mutually-exclusive tag pair
            # REPLACES the other side inherited from upstream (Bucketize
            # after Normalize: continuous → categorical, not both)
            from ..tags import _CONFLICTS, TagSet

            declared = set(TagSet(self.output_tags))
            for conflict in _CONFLICTS:
                overlap = declared & conflict
                if overlap:
                    col_schema = col_schema.without_tags(list(conflict - overlap))
            return col_schema.with_tags(self.output_tags)
        return col_schema

    def _compute_properties(self, col_schema: ColumnSchema, input_schema: Schema) -> ColumnSchema:
        if self.output_properties:
            return col_schema.with_properties(self.output_properties)
        return col_schema

    def _compute_shape(self, col_schema: ColumnSchema, input_schema: Schema) -> ColumnSchema:
        return col_schema

    # --- op metadata ------------------------------------------------------
    @property
    def output_dtype(self):
        return None

    @property
    def output_tags(self):
        return None

    @property
    def output_properties(self) -> Dict[str, Any]:
        return {}

    @property
    def dependencies(self) -> Optional[List]:
        """Extra graph inputs this op needs (selectors/nodes), e.g. the target
        column of TargetEncoding. Added as Node dependencies at `>>` time."""
        return None

    @property
    def dynamic_dtypes(self) -> bool:
        return False

    def device_state(self) -> Dict[str, Any]:
        """Large fitted arrays to pass as jit ARGUMENTS rather than traced
        constants (multi-MB constants stall XLA compilation — see
        dag/device_state.py). Keys must be stable per fitted state; values
        are host numpy arrays. Ops fetch the traced handles back through
        ``get_device_state(key)`` inside ``transform``."""
        return {}

    @property
    def label(self) -> str:
        return self.__class__.__name__

    @property
    def supports(self) -> Supports:
        return Supports.CPU_DATAFRAME | Supports.CPU_DICT_ARRAY

    @property
    def supported_formats(self) -> Supports:
        return self.supports

    def output_column_names(self, col_selector: ColumnSelector) -> ColumnSelector:
        return ColumnSelector(list(self.column_mapping(col_selector).keys()))

    # --- graph construction hooks ------------------------------------------
    def create_node(self, selector: ColumnSelector):
        from .node import Node

        return Node(selector)

    def __rrshift__(self, other):
        """Support `[cols] >> op` without an explicit ColumnSelector."""
        from .node import Node

        return Node(ColumnSelector(other)) >> self

    # --- serving hooks -------------------------------------------------------
    def inference_initialize(self, col_selector, model_config):
        """Return a native (C++) fast-path replacement op, or None."""
        return None

    def export(self, path, input_schema, output_schema, **kwargs):
        raise NotImplementedError

    # --- (de)serialization hooks used by the workflow serializer -------------
    def to_dict(self) -> Dict[str, Any]:
        """(params, state) split is handled by the serializer registry; ops
        override `serialize_params`/`serialize_state` instead."""
        return {"params": self.serialize_params(), "state": self.serialize_state()}

    def serialize_params(self) -> Dict[str, Any]:
        return {}

    def serialize_state(self) -> Optional[Dict[str, Any]]:
        return None

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "BaseOperator":
        op = cls(**cls.deserialize_params(data.get("params", {})))
        state = data.get("state")
        if state is not None and hasattr(op, "deserialize_state"):
            op.deserialize_state(state)
        return op

    @classmethod
    def deserialize_params(cls, params: Dict[str, Any]) -> Dict[str, Any]:
        return params

    def __repr__(self):
        return f"<{self.label}>"


class StatOperator(BaseOperator):
    """Operator requiring a statistics pass before transform."""

    def __init__(self):
        super().__init__()
        self.fitted = False

    # --- streaming fit protocol ---------------------------------------------
    def fit_init(self, col_selector: ColumnSelector, input_schema: Schema):
        raise NotImplementedError

    def fit_batch(self, col_selector: ColumnSelector, batch: TableBatch, state):
        raise NotImplementedError

    def fit_merge(self, states: List):
        if len(states) == 1:
            return states[0]
        raise NotImplementedError(f"{self.label} cannot merge {len(states)} states")

    def fit_finalize(self, state) -> None:
        raise NotImplementedError

    # --- convenience whole-dataset fit ---------------------------------------
    def fit(self, col_selector: ColumnSelector, dataset) -> None:
        schema = getattr(dataset, "schema", None)
        if schema is None:
            schema = dataset.infer_schema() if isinstance(dataset, TableBatch) else Schema()
        state = self.fit_init(col_selector, schema)
        if isinstance(dataset, TableBatch):
            state = self.fit_batch(col_selector, dataset, state)
        else:
            for batch in dataset.to_batches():
                state = self.fit_batch(col_selector, batch, state)
        self.fit_finalize(state)
        self.fitted = True

    def clear(self) -> None:
        self.fitted = False

    def set_storage_path(self, new_path, copy=False):
        """Move/copy file-backed statistics under `new_path` (no-op default)."""
        return None
