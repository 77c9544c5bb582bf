"""Edge cases across the stack: empty data, single rows, dict sources,
float keys, multihot write round trips, sessionization over
shuffle_by_keys — the long-tail behaviors users hit first."""

import tempfile

import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor


def test_dict_source_end_to_end():
    ds = nvt.Dataset({"a": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    wf = nvt.Workflow((["a"] >> ops.Categorify()) + (["x"] >> ops.Normalize()))
    out = wf.fit_transform(ds).to_table()
    assert out.num_rows == 3


def test_part_mem_fraction_partitioning():
    ds = nvt.Dataset(pd.DataFrame({"x": np.arange(1000.0)}), part_mem_fraction=0.000001)
    assert ds.npartitions >= 1
    assert ds.num_rows == 1000


def test_empty_dataframe_fit_transform():
    df = pd.DataFrame({"a": np.array([], dtype=np.int64), "x": np.array([], dtype=np.float64)})
    wf = nvt.Workflow((["a"] >> ops.Categorify()) + (["x"] >> ops.Normalize()))
    out = wf.fit_transform(nvt.Dataset(df)).to_table()
    assert out.num_rows == 0


def test_float_keys_and_nan_null():
    df = pd.DataFrame({"f": [1.5, 1.5, 2.5, np.nan]})
    wf = nvt.Workflow(["f"] >> ops.Categorify())
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out["f"].tolist()[:3] == [3, 3, 4]
    assert out["f"].iloc[3] == 1  # NaN → NULL code


def test_multihot_transform_write_round_trip(tmp_path):
    df = pd.DataFrame({"u": [1, 2, 3, 1]})
    df["g"] = [[1, 2], [3], [], [2, 2]]
    wf = nvt.Workflow(["u", "g"] >> ops.Categorify())
    transformed = wf.fit_transform(nvt.Dataset(df))
    transformed.to_parquet(str(tmp_path / "out"))
    back = nvt.Dataset(str(tmp_path / "out")).to_table()
    assert back["g"].is_list
    assert back.num_rows == 4
    assert [len(v) for v in back["g"].to_pylist()] == [2, 1, 0, 2]


def test_csv_no_header_with_names(tmp_path):
    p = str(tmp_path / "f.csv")
    pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]}).to_csv(p, index=False, header=False)
    ds = nvt.Dataset(p, engine="csv", names=["a", "b"])
    assert ds.to_table().column_names == ["a", "b"]


def test_single_row_jit_bucket():
    df = pd.DataFrame({"x": [5.0]})
    wf = nvt.Workflow(["x"] >> ops.Normalize(), executor=JitExecutor(jit_min_rows=0))
    out = wf.fit_transform(nvt.Dataset(df)).to_table()
    assert out.num_rows == 1


def test_shuffle_by_keys_then_sessionization():
    df = pd.DataFrame({"s": np.repeat(np.arange(50), 4), "v": np.arange(200.0)})
    ds = nvt.Dataset(df, part_size=2048).shuffle_by_keys(["s"])
    node = ["s", "v"] >> ops.Groupby(groupby_cols=["s"], aggs={"v": ["count"]})
    out = nvt.Workflow(node).fit_transform(ds).to_table().to_pandas()
    assert out["v_count"].sum() == 200
    assert len(out) == 50
