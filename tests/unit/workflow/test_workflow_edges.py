"""Workflow edge cases: zero-row transforms, all-null columns, empty
partitions, vocab-emptying freq thresholds, and missing-input validation
(the reference fails via dask column selection, workflow.py:239)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ColumnSelector, Workflow, ops
from nvtabular_tpu.table import TableBatch


def _fitted():
    df = pd.DataFrame({"c": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    wf = Workflow(
        (ColumnSelector(["c"]) >> ops.Categorify())
        + (ColumnSelector(["x"]) >> ops.Normalize())
    )
    wf.fit(nvt.Dataset(df))
    return wf, df


def test_zero_row_transform():
    wf, df = _fitted()
    out = wf.transform(nvt.Dataset(df.iloc[:0])).to_table()
    assert out.num_rows == 0
    assert set(out.column_names) == {"c", "x"}


def test_all_null_columns_fit_transform():
    df = pd.DataFrame({"c": pd.array([None] * 5, dtype="Int64"), "x": [np.nan] * 5})
    wf = Workflow(
        (ColumnSelector(["c"]) >> ops.Categorify())
        + (ColumnSelector(["x"]) >> ops.FillMissing() >> ops.Normalize())
    )
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert (out["c"] == 1).all()  # null code
    assert np.isfinite(out["x"]).all()


def test_empty_partition_between_batches():
    df = pd.DataFrame({"c": [1, 2, 3]})
    p = TableBatch.from_pandas(df)
    p0 = TableBatch.from_pandas(df.iloc[:0])
    wf = Workflow(ColumnSelector(["c"]) >> ops.Categorify())
    out = wf.fit_transform(nvt.Dataset([p, p0, p])).to_table()
    assert out.num_rows == 6


def test_freq_threshold_empties_vocab():
    df = pd.DataFrame({"c": [7] * 10})
    wf = Workflow(ColumnSelector(["c"]) >> ops.Categorify(freq_threshold=100))
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert set(out["c"]) == {2}  # everything OOV


def test_missing_input_column_raises():
    wf, df = _fitted()
    with pytest.raises(ValueError, match="missing input columns.*x"):
        wf.transform(nvt.Dataset(pd.DataFrame({"c": [1, 2]})))
    with pytest.raises(ValueError, match="missing input columns"):
        wf.transform(TableBatch.from_pandas(pd.DataFrame({"x": [0.5]})))
