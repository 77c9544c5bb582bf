"""Dataset statistics inspector — runs a DataStats workflow and emits a
JSON report consumable by the synthetic data generator, closing the
synth-data loop (reference nvtabular/tools/dataset_inspector.py:52)."""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from ..dag.executor import LocalExecutor
from ..ops import DataStats
from ..selector import ColumnSelector
from ..tags import Tags
from ..workflow import Workflow


class DatasetInspector:
    """``inspect(dataset, columns_dict)`` → stats dict / JSON file.

    columns_dict = {"cats": [...], "conts": [...], "labels": [...]}; when
    omitted, columns are classified by schema tags/dtypes.
    """

    def inspect(
        self,
        dataset,
        columns_dict: Optional[Dict[str, List[str]]] = None,
        output_file: Optional[str] = None,
    ) -> Dict:
        schema = dataset.schema
        if columns_dict is None:
            columns_dict = _classify(schema)
        all_cols = (
            list(columns_dict.get("cats") or [])
            + list(columns_dict.get("conts") or [])
            + list(columns_dict.get("labels") or [])
        )
        stats_op = DataStats()
        graph = ColumnSelector(all_cols) >> stats_op
        workflow = Workflow(graph, executor=LocalExecutor())
        workflow.fit(dataset)

        output: Dict = {"num_rows": dataset.num_rows}
        for kind in ("cats", "conts", "labels"):
            section = {}
            for name in columns_dict.get(kind) or []:
                entry = dict(stats_op.output.get(name, {}))
                section[name] = _jsonify(entry)
            output[kind] = section
        if output_file:
            with open(output_file, "w") as f:
                json.dump(output, f, indent=2)
        return output


def _classify(schema) -> Dict[str, List[str]]:
    cats, conts, labels = [], [], []
    for cs in schema:
        if Tags.TARGET in cs.tags:
            labels.append(cs.name)
        elif Tags.CATEGORICAL in cs.tags or cs.dtype.is_string or cs.dtype.is_integer:
            cats.append(cs.name)
        elif Tags.CONTINUOUS in cs.tags or cs.dtype.is_float:
            conts.append(cs.name)
    return {"cats": cats, "conts": conts, "labels": labels}


def _jsonify(d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.floating, np.integer)):
            v = v.item()
        if isinstance(v, float) and not np.isfinite(v):
            v = None
        out[k] = v
    return out
