import json
import os

import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.workflow.callable_ref import WorkflowSerializationError


def _named_double(col):
    return col.values * 2


def test_save_load_roundtrip(dataset, df, tmp_path):
    cats = ["id", "name-string"] >> ops.Categorify(out_path=str(tmp_path / "cats"))
    conts = ["x", "y"] >> ops.FillMissing(0.0) >> ops.Normalize()
    wf = nvt.Workflow(cats + conts)
    expected = wf.fit_transform(dataset).to_table().to_pandas()

    save_path = str(tmp_path / "wf")
    wf.save(save_path)

    # human-readable JSON (asserted by the reference too, test_workflow.py:810)
    with open(os.path.join(save_path, "graph.json")) as f:
        doc = json.load(f)
    assert any(r["op_type"] == "Categorify" for r in doc["nodes"])

    wf2 = nvt.Workflow.load(save_path)
    out = wf2.transform(dataset).to_table().to_pandas()
    for col in expected.columns:
        np.testing.assert_allclose(
            out[col].to_numpy(dtype=float), expected[col].to_numpy(dtype=float), rtol=1e-6
        )


def test_lambda_rejected(dataset, tmp_path):
    node = ["x"] >> ops.LambdaOp(lambda col: col.values + 1)
    wf = nvt.Workflow(node)
    wf.fit(dataset)
    with pytest.raises(WorkflowSerializationError, match="lambda"):
        wf.save(str(tmp_path / "wf"))


def test_named_function_roundtrip(dataset, df, tmp_path):
    node = ["y"] >> ops.LambdaOp(_named_double)
    wf = nvt.Workflow(node)
    wf.fit(dataset)
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    out = wf2.transform(dataset).to_table().to_pandas()
    np.testing.assert_allclose(out["y"], df["y"] * 2, rtol=1e-6)


def test_stat_state_roundtrip(dataset, df, tmp_path):
    te = ["id"] >> ops.TargetEncoding("label", kfold=1, p_smooth=10, out_path=str(tmp_path / "te"))
    jg = ["id"] >> ops.JoinGroupby(cont_cols=["y"], stats=["mean", "count"], out_path=str(tmp_path / "jg"))
    wf = nvt.Workflow(te + jg)
    expected = wf.fit_transform(dataset).to_table().to_pandas()
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    out = wf2.transform(dataset).to_table().to_pandas()
    for col in expected.columns:
        np.testing.assert_allclose(out[col], expected[col], rtol=1e-6)


def test_clear_stats(dataset):
    node = ["x"] >> ops.Normalize()
    wf = nvt.Workflow(node)
    wf.fit(dataset)
    assert node.op.fitted
    wf.clear_stats()
    assert not node.op.fitted


def test_join_external_save_load(tmp_path):
    import pandas as pd

    df = pd.DataFrame({"item": [1, 2, 3, 9], "x": [0.1, 0.2, 0.3, 0.4]})
    ext = pd.DataFrame({"item": [1, 2, 3], "brand": [10, 20, 30]})
    wf = nvt.Workflow(["item", "x"] >> ops.JoinExternal(ext, on="item"))
    wf.fit(nvt.Dataset(df))
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    out = wf2.transform(nvt.TableBatch.from_pandas(df)).to_pandas()
    assert out["brand"].tolist()[:3] == [10.0, 20.0, 30.0]


def test_column_similarity_save_load(tmp_path):
    import pandas as pd
    from scipy.sparse import csr_matrix

    feats = csr_matrix(np.random.default_rng(0).random((6, 5)))
    wf = nvt.Workflow([("a", "b")] >> ops.ColumnSimilarity(feats, metric="cosine"))
    ds = nvt.Dataset(pd.DataFrame({"a": [0, 1, 2], "b": [1, 0, 5]}))
    wf.fit(ds)
    a = wf.transform(ds).to_table().to_pandas()
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    b = wf2.transform(ds).to_table().to_pandas()
    np.testing.assert_allclose(a.iloc[:, 0], b.iloc[:, 0])
