"""Golden tests for the ops not covered by the schema sweep: Filter,
JoinExternal, DropLowCardinality, ColumnSimilarity (reference
tests/unit/ops/test_{ops,column_similarity,drop_low_cardinality}.py)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


def test_filter_rows():
    df = pd.DataFrame({"x": [1.0, -2.0, 3.0, -4.0, 5.0], "y": [1, 2, 3, 4, 5]})

    def positive(batch):
        return np.asarray(batch["x"].values) > 0

    node = ["x", "y"] >> ops.Filter(positive)
    wf = nvt.Workflow(node)
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out["y"].tolist() == [1, 3, 5]


def test_join_external_left_and_inner():
    df = pd.DataFrame({"item": [1, 2, 3, 2, 9], "x": [0.1, 0.2, 0.3, 0.4, 0.5]})
    ext = pd.DataFrame({"item": [1, 2, 3], "brand": [10, 20, 30], "price": [1.0, 2.0, 3.0]})

    left = ["item", "x"] >> ops.JoinExternal(ext, on="item")
    out = nvt.Workflow(left).fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out["brand"].tolist()[:4] == [10, 20, 30, 20]
    assert np.isnan(out["price"].iloc[4]) or out["brand"].iloc[4] == 0  # unmatched

    inner = ["item", "x"] >> ops.JoinExternal(ext, on="item", how="inner")
    out_i = nvt.Workflow(inner).fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert len(out_i) == 4
    assert set(out_i["item"]) == {1, 2, 3}


def test_join_external_dedup_and_column_subset():
    df = pd.DataFrame({"k": [1, 2]})
    ext = pd.DataFrame({"k": [1, 1, 2], "v": [7, 8, 9], "w": [1, 2, 3]})
    node = ["k"] >> ops.JoinExternal(
        ext, on="k", columns_ext=["k", "v"], drop_duplicates_ext=True
    )
    out = nvt.Workflow(node).fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert "w" not in out.columns
    assert out["v"].tolist()[0] in (7, 8)  # first-of-duplicates kept
    assert out["v"].tolist()[1] == 9


def test_drop_low_cardinality():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "keep": rng.integers(0, 50, 500).astype(np.int64),
            "drop_me": np.ones(500, dtype=np.int64),  # cardinality 1
            "x": rng.normal(0, 1, 500),
        }
    )
    node = (
        ["keep", "drop_me"] >> ops.Categorify() >> ops.DropLowCardinality(min_cardinality=4)
    )
    wf = nvt.Workflow(node + ["x"])
    out = wf.fit_transform(nvt.Dataset(df)).to_table()
    assert "keep" in out.column_names
    assert "drop_me" not in out.column_names
    assert "x" in out.column_names


@pytest.mark.parametrize("metric", ["inner", "cosine", "tfidf"])
def test_column_similarity_golden(metric):
    # 4 documents over 5 features
    from scipy.sparse import csr_matrix

    feats = np.array(
        [
            [1.0, 2.0, 0.0, 0.0, 1.0],
            [0.0, 1.0, 1.0, 0.0, 0.0],
            [1.0, 0.0, 0.0, 3.0, 0.0],
            [0.0, 0.0, 2.0, 1.0, 1.0],
        ]
    )
    csr = csr_matrix(feats)
    df = pd.DataFrame({"a": [0, 1, 2, 3, 0], "b": [1, 0, 3, 2, 0]})
    node = [("a", "b")] >> ops.ColumnSimilarity(csr, metric=metric)
    wf = nvt.Workflow(node)
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()

    def ref_sim(i, j):
        if metric == "tfidf":
            n = feats.shape[0]
            dfreq = (feats > 0).sum(axis=0)
            idf = np.log(n / np.maximum(dfreq, 1))
            m = feats * idf
        else:
            m = feats
        num = float(m[i] @ m[j])
        if metric in ("cosine", "tfidf"):
            denom = np.linalg.norm(m[i]) * np.linalg.norm(m[j])
            return num / denom if denom else 0.0
        return num

    col = [c for c in out.columns if "sim" in c or "_a_" in c or c not in ("a", "b")][0]
    for row in range(5):
        expect = ref_sim(df["a"][row], df["b"][row])
        np.testing.assert_allclose(out[col][row], expect, rtol=1e-5, err_msg=f"row {row}")
    # identical ids → similarity 1 for normalized metrics
    if metric in ("cosine", "tfidf"):
        np.testing.assert_allclose(out[col][4], 1.0, rtol=1e-6)
