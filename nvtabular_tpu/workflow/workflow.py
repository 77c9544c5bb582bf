"""Workflow: sklearn-style fit/transform facade over a Graph.

Analog of the reference's ``nvtabular.workflow.Workflow``
(nvtabular/workflow/workflow.py:45-358): same public surface —
fit / transform / fit_transform / fit_schema / save / load / clear_stats /
get_subworkflow / remove_inputs / input_schema / output_schema — with a
TPU-native execution strategy: transform returns a *lazy* Dataset whose
batches stream through the jit-fused executor; fit is a phased single scan
feeding streaming accumulators (see dag/executor.py).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, List, Optional, Union

from ..dag import Graph, Node
from ..dag.base_operator import StatOperator
from ..dag.executor import FitEngine, JitExecutor, LocalExecutor
from ..dag.ops import Subgraph
from ..io.dataset import Dataset
from ..schema import Schema
from ..table import TableBatch

LOG = logging.getLogger("nvtabular_tpu")


class Workflow:
    def __init__(self, output_node: Node, client=None, executor=None):
        # `client` kept for reference API compatibility; the TPU runtime has
        # no external scheduler (multi-controller JAX instead of dask).
        self.graph = Graph(output_node)
        self.executor = executor or JitExecutor()
        self._fit_engine = FitEngine(self.executor)

    # --- fitting ----------------------------------------------------------
    def fit(self, dataset: Dataset) -> "Workflow":
        self._clear_unfitted_stats()
        self._fit_engine.fit(_as_dataset(dataset), self.graph)
        return self

    @property
    def last_fit_stats(self) -> dict:
        """Phase breakdown of the most recent ``fit``: scan (streaming, scales
        with rows) vs finalize (per-key fixed cost) vs multi-host reduce."""
        return dict(self._fit_engine.last_fit_stats)

    def fit_schema(self, input_schema: Schema) -> "Workflow":
        self.graph.construct_schema(input_schema)
        return self

    def fit_transform(self, dataset: Dataset) -> Dataset:
        self.fit(dataset)
        return self.transform(dataset)

    # --- transforming -----------------------------------------------------
    def transform(self, data) -> Union[Dataset, TableBatch]:
        if isinstance(data, TableBatch):
            return self._transform_batch(data)
        if _is_pandas(data):
            from ..dag.executor import _enforce_dtypes

            batch = TableBatch.from_pandas(data)
            out = self._transform_batch(batch).to_host()
            return _enforce_dtypes(out, self.output_dtypes).to_pandas()
        return self._transform_dataset(_as_dataset(data))

    def _transform_dataset(self, dataset: Dataset) -> Dataset:
        if self.graph.output_schema is None:
            self.graph.construct_schema(dataset.schema)
        self._check_fitted()
        ds_schema = dataset.schema
        if ds_schema is not None and ds_schema.column_names:
            self._check_input_columns(ds_schema.column_names)
        return TransformedDataset(dataset, self)

    def _transform_batch(self, batch: TableBatch) -> TableBatch:
        if self.graph.output_schema is None:
            self.graph.construct_schema(batch.infer_schema())
        self._check_fitted()
        self._check_input_columns(batch.column_names)
        from ..dag.executor import _enforce_dtypes

        out = self.executor.transform_batch(batch, self.graph.output_node)
        # restore schema dtypes where possible (device execution narrows
        # 64-bit passthrough columns; host results upcast back here)
        return _enforce_dtypes(out, self.output_dtypes)

    def _check_input_columns(self, available):
        """Transforming data that lacks fitted-schema input columns must
        fail loudly (the reference fails via dask column selection,
        workflow.py:239) — silently dropping a branch corrupts output."""
        needed = self._input_columns
        missing = [c for c in needed if c not in set(available)]
        if missing:
            raise ValueError(
                f"Data to transform is missing input columns {missing}; "
                f"the fitted workflow requires {needed}."
            )

    def _check_fitted(self):
        unfitted = [
            n.op.label
            for n in self.graph.nodes
            if isinstance(n.op, StatOperator) and not n.op.fitted
        ]
        if unfitted:
            raise RuntimeError(
                f"Workflow has unfitted stat operators: {unfitted}. Call fit() first."
            )

    # --- schema access ------------------------------------------------------
    @property
    def input_schema(self) -> Optional[Schema]:
        return self.graph.input_schema

    @property
    def output_schema(self) -> Optional[Schema]:
        return self.graph.output_schema

    @property
    def input_dtypes(self):
        return self.graph.input_dtypes

    @property
    def output_dtypes(self):
        return self.graph.output_dtypes

    @property
    def output_node(self) -> Node:
        return self.graph.output_node

    @property
    def _input_columns(self) -> List[str]:
        """Root columns the graph actually selects (leaf selectors, tuples
        flattened) — NOT the full fitted dataset schema, so transforming a
        frame that lacks unselected columns stays legal."""
        cols: List[str] = []
        seen = set()
        for node in self.graph.leaf_nodes:
            if node.selector is None:
                continue
            for name in node.selector.names:
                for flat in name if isinstance(name, tuple) else (name,):
                    if flat not in seen:
                        seen.add(flat)
                        cols.append(flat)
        return cols

    # --- graph edits ------------------------------------------------------
    def remove_inputs(self, input_cols: List[str]) -> "Workflow":
        """Drop input columns from the graph's selectors (reference
        workflow.py:172-193) and re-propagate schemas so node output
        schemas no longer promise the removed columns."""
        self.graph.remove_inputs(input_cols)
        if self.graph.input_schema is not None:
            root = Schema(
                [cs for cs in self.graph.input_schema if cs.name not in set(input_cols)]
            )
            self.graph.construct_schema(root)
        return self

    def get_subworkflow(self, name: str) -> "Workflow":
        subgraph = self.graph.subgraph(name)
        return Workflow(subgraph.output_node, executor=self.executor)

    # --- stats lifecycle ------------------------------------------------------
    def clear_stats(self) -> None:
        for node in self.graph.nodes:
            if isinstance(node.op, StatOperator):
                node.op.clear()

    def _clear_unfitted_stats(self):
        """Re-fitting an already-fitted workflow refits everything EXCEPT
        constructor-supplied state (e.g. ``Categorify(vocabs=...)`` — fitted
        at construction with fit_generation 0; the reference likewise keeps
        supplied vocabs across fits). Ops fitted by a previous fit() or
        restored by load() carry fit_generation >= 1 and are cleared."""

        def clear_graph(graph):
            for node in graph.nodes:
                op = node.op
                if isinstance(op, Subgraph):
                    if getattr(op, "fitted", False):
                        op.fitted = False
                    clear_graph(op.graph)
                elif isinstance(op, StatOperator) and getattr(op, "fit_generation", 0) > 0:
                    op.clear()

        clear_graph(self.graph)

    # --- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        from . import graph_serializer

        os.makedirs(path, exist_ok=True)
        metadata = {
            "versions": {
                "nvtabular_tpu": _pkg_version(),
                "python": sys.version.split()[0],
            },
            "generated_timestamp": int(time.time()),
        }
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)
        graph_serializer.serialize_graph(self.graph, path)

    @classmethod
    def load(cls, path: str, client=None) -> "Workflow":
        from . import graph_serializer

        meta_path = os.path.join(path, "metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
            saved = metadata.get("versions", {}).get("nvtabular_tpu")
            if saved and saved != _pkg_version():
                import warnings

                warnings.warn(
                    f"Workflow saved with nvtabular_tpu {saved}, "
                    f"loading with {_pkg_version()}"
                )
        graph = graph_serializer.deserialize_graph(path)
        wf = cls.__new__(cls)
        wf.graph = graph
        wf.executor = JitExecutor()
        wf._fit_engine = FitEngine(wf.executor)
        return wf


class TransformedDataset(Dataset):
    """Lazy transform plan: batches stream through the workflow's executor
    (mirrors the reference's lazy ddf transform, workflow.py:86-88)."""

    def __init__(self, base: Dataset, workflow: Workflow):
        self._base = base
        self._workflow = workflow
        self._schema = workflow.output_schema
        self.part_size = base.part_size
        self.engine = base.engine
        self.cpu = base.cpu
        self.base_dataset = base
        self.paths = []
        self._partitions = base._partitions  # partition count/metadata passthrough

    @property
    def schema(self) -> Schema:
        return self._workflow.output_schema

    def infer_schema(self) -> Schema:
        return self._workflow.output_schema

    def to_batches(self, columns=None, prefetch: int = 2, shard=None, host: bool = True,
                   hetero: "Optional[float | str]" = None):
        """``host=False`` keeps transformed batches device-resident (feeding
        a device consumer like the training loop without a d2h round trip).
        ``hetero`` routes that fraction of batches through the host C++
        path concurrently with the device, or ``"auto"`` to calibrate the
        split from the first batch on each engine (see
        JitExecutor.transform_batches)."""
        wf = self._workflow
        input_cols = wf._input_columns or None
        source = self._base.to_batches(columns=input_cols, prefetch=prefetch, shard=shard)
        pipelined = getattr(wf.executor, "transform_batches", None)
        kwargs = {"hetero": hetero} if hetero else {}
        outputs = (
            pipelined(source, wf.graph.output_node, **kwargs)
            if pipelined is not None
            else (
                wf.executor.transform_batch(b, wf.graph.output_node) for b in source
            )
        )
        for out in outputs:
            if host:
                # restore schema dtypes: device execution narrows 64-bit
                # passthrough columns to 32-bit (jax x64 off); host
                # consumers get the promised dtypes back
                from ..dag.executor import _enforce_dtypes

                out = _enforce_dtypes(out.to_host(), wf.output_dtypes)
            if columns:
                out = out.select([c for c in columns if c in out])
            yield out

    @property
    def num_rows(self) -> int:
        return self._base.num_rows

    def to_parquet(
        self,
        output_path: str,
        shuffle=None,
        out_files_per_proc=None,
        output_files=None,
        row_group_size=None,
        compression=None,
        **kwargs,
    ):
        """Shuffled write of the transformed stream.

        For PER_WORKER/PER_PARTITION shuffles over a fusable workflow this
        streams RAW batches to the file workers, which gather + transform +
        encode their own shard in one native call per column (the
        reference's lazy to_parquet shape — dask materializes the transform
        inside each write task, reference workflow.py:239-248; see
        io/stream_fuse.py). Everything else takes the two-phase
        transform→write stream. NVT_FUSED_WRITE=0 opts out."""
        import os as _os

        from ..io.shuffle import Shuffle, check_shuffle_arg
        from ..io.writer import write_dataset

        sh = check_shuffle_arg(shuffle)
        spec = None
        if sh in (Shuffle.PER_WORKER, Shuffle.PER_PARTITION, None) and _os.environ.get(
            "NVT_FUSED_WRITE", "1"
        ) != "0":
            from ..io.stream_fuse import extract_stream_spec

            spec = extract_stream_spec(self._workflow)
        if spec is None:
            return super().to_parquet(
                output_path,
                shuffle=shuffle,
                out_files_per_proc=out_files_per_proc,
                output_files=output_files,
                row_group_size=row_group_size,
                compression=compression,
                **kwargs,
            )

        wf = self._workflow
        base = self._base
        sources = spec.source_names

        class _RawStream:
            def to_batches(self, prefetch=1, **kw):
                for b in base.to_batches(columns=sources, prefetch=prefetch):
                    yield b.to_host()

        from ..dag.executor import _enforce_dtypes
        from ..dag.host_fuse import FusedHostExecutor

        host = FusedHostExecutor()
        node = wf.graph.output_node

        def _fallback(batch):
            # non-conforming window (lists/validity/dtype drift): the exact
            # two-phase host transform
            return _enforce_dtypes(
                host.transform_batch(batch, node).to_host(), wf.output_dtypes
            )

        return write_dataset(
            _RawStream(),
            output_path,
            shuffle=sh,
            out_files=output_files
            or out_files_per_proc
            or min(self.npartitions, 16)
            or 1,
            row_group_size=row_group_size,
            compression=compression,
            transform=_fallback,
            fused_spec=spec,
        )


def _as_dataset(data) -> Dataset:
    if isinstance(data, Dataset):
        return data
    return Dataset(data)


def _is_pandas(obj) -> bool:
    return type(obj).__module__.startswith("pandas") and hasattr(obj, "columns")


def _pkg_version() -> str:
    from .. import __version__

    return __version__
