"""Subworkflows: named nested graphs fit recursively (incl. stat ops and
chained stats inside the subgraph), addressable via get_subworkflow —
reference Workflow.get_subworkflow/Graph.subgraph (workflow.py:168-169)."""

import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag import Subgraph


def _df(n=500):
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "cat": rng.integers(0, 30, n).astype(np.int64),
            "x": rng.normal(5.0, 2.0, n),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )


def test_subgraph_with_stat_ops_fits_and_transforms():
    df = _df()
    inner = ["cat"] >> ops.Categorify()
    node = ["cat"] >> Subgraph("encoders", inner)
    wf = nvt.Workflow(node + (["x"] >> ops.Normalize()))
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    # inner Categorify actually fit: codes start at 3, dense
    assert out["cat"].min() >= 3
    assert out["cat"].max() <= 3 + 30
    np.testing.assert_allclose(out["x"].mean(), 0.0, atol=1e-6)


def test_chained_stats_inside_subgraph():
    df = _df()
    inner = ["x"] >> ops.Normalize() >> ops.FillMedian()
    node = ["x"] >> Subgraph("norm", inner)
    wf = nvt.Workflow(node)
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    np.testing.assert_allclose(out["x"].mean(), 0.0, atol=1e-5)


def test_get_subworkflow_transforms_independently():
    df = _df()
    inner = ["cat"] >> ops.Categorify()
    node = ["cat"] >> Subgraph("encoders", inner)
    wf = nvt.Workflow(node + ["label"])
    wf.fit(nvt.Dataset(df))
    sub_wf = wf.get_subworkflow("encoders")
    out = sub_wf.transform(nvt.TableBatch.from_pandas(df[["cat"]]))
    codes = np.asarray(out["cat"].values)
    full = wf.transform(nvt.Dataset(df)).to_table()
    np.testing.assert_array_equal(codes, np.asarray(full["cat"].values))


def test_downstream_stat_after_subgraph():
    """A stat op consuming the subgraph's OUTPUT must fit in a later phase
    (the subgraph encodes first, then TargetEncoding sees codes)."""
    df = _df()
    inner = ["cat"] >> ops.Categorify()
    node = ["cat"] >> Subgraph("enc", inner)
    te = node >> ops.TargetEncoding(["label"], kfold=2)
    wf = nvt.Workflow(te + ["label"])
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    te_col = [c for c in out.columns if c.startswith("TE_")][0]
    assert np.isfinite(out[te_col]).all()


def test_subgraph_save_load(tmp_path):
    df = _df()
    inner = ["cat"] >> ops.Categorify()
    wf = nvt.Workflow((["cat"] >> Subgraph("enc", inner)) + (["x"] >> ops.Normalize()))
    wf.fit(nvt.Dataset(df))
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    a = wf.transform(nvt.TableBatch.from_pandas(df))
    b = wf2.transform(nvt.TableBatch.from_pandas(df))
    np.testing.assert_array_equal(np.asarray(a["cat"].values), np.asarray(b["cat"].values))
    assert "enc" in wf2.graph.subgraphs
