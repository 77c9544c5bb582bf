import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.selector import ColumnSelector


def test_fill_clip_normalize_pipeline(dataset, df):
    conts = ["x", "y"] >> ops.FillMissing(0.0) >> ops.Clip(min_value=-3.0, max_value=3.0) >> ops.Normalize()
    wf = nvt.Workflow(conts)
    out = wf.fit_transform(dataset).to_table().to_pandas()

    ref = df[["x", "y"]].fillna(0.0).clip(-3.0, 3.0)
    ref = (ref - ref.mean()) / ref.std()
    np.testing.assert_allclose(out["x"], ref["x"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["y"], ref["y"], rtol=1e-4, atol=1e-5)


def test_categorify_basic(dataset, df, tmp_path):
    cats = ["id", "name-string"] >> ops.Categorify(out_path=str(tmp_path))
    wf = nvt.Workflow(cats)
    out = wf.fit_transform(dataset).to_table().to_pandas()

    # codes are >= 1 (null) and nulls map to exactly 1
    assert out["id"].min() >= 3  # no nulls in id → all vocab codes (1 OOV bucket)
    nulls = df["name-string"].isna().to_numpy()
    assert (out["name-string"].to_numpy()[nulls] == 1).all()

    # same raw value ↔ same code (bijection on non-null)
    joined = pd.DataFrame({"raw": df["id"], "code": out["id"]})
    grp = joined.groupby("raw")["code"].nunique()
    assert (grp == 1).all()
    grp2 = joined.groupby("code")["raw"].nunique()
    assert (grp2 == 1).all()

    # frequency order: most frequent id gets the lowest vocab code
    counts = df["id"].value_counts()
    top_raw = counts.index[0]
    assert out["id"][df["id"] == top_raw].iloc[0] == 3

    # schema has domain + embedding sizes
    cs = wf.output_schema["id"]
    assert cs.properties["embedding_sizes"]["cardinality"] == df["id"].nunique() + 3
    emb = ops.get_embedding_sizes(wf)
    assert "id" in emb


def test_combined_graph_concat(dataset, df, tmp_path):
    cats = ["id"] >> ops.Categorify(out_path=str(tmp_path))
    conts = ["x"] >> ops.FillMissing() >> ops.Normalize()
    wf = nvt.Workflow(cats + conts + ["label"])
    out = wf.fit_transform(dataset).to_table()
    assert set(out.column_names) == {"id", "x", "label"}
    assert out.num_rows == len(df)


def test_lambdaop_and_rename(dataset, df):
    doubled = ["y"] >> ops.LambdaOp(_double) >> ops.Rename(postfix="_2x")
    wf = nvt.Workflow(doubled)
    out = wf.fit_transform(dataset).to_table().to_pandas()
    np.testing.assert_allclose(out["y_2x"], df["y"] * 2, rtol=1e-6)


def _double(col):
    return col.values * 2


def test_transform_requires_fit(dataset):
    node = ["x"] >> ops.Normalize()
    wf = nvt.Workflow(node)
    wf.fit_schema(dataset.schema)
    with pytest.raises(RuntimeError, match="unfitted"):
        wf.transform(dataset)


def test_chained_stat_ops(dataset, df, tmp_path):
    # Normalize depends on FillMedian output → two fit phases
    node = ["x"] >> ops.FillMedian() >> ops.Normalize()
    wf = nvt.Workflow(node)
    out = wf.fit_transform(dataset).to_table().to_pandas()
    med = df["x"].median()
    ref = df["x"].fillna(med)
    ref = (ref - ref.mean()) / ref.std()
    # reservoir median is exact at this size
    np.testing.assert_allclose(out["x"], ref, rtol=1e-3, atol=1e-3)


def test_subtraction_and_getitem(dataset):
    everything = ["x", "y", "label"] >> ops.FillMissing()
    minus = everything - ["label"]
    wf = nvt.Workflow(minus)
    out = wf.fit_transform(dataset).to_table()
    assert set(out.column_names) == {"x", "y"}


def test_hash_bucket_and_cross(dataset, df):
    hb = ["name-string"] >> ops.HashBucket(num_buckets=16)
    cross = ["id", "label"] >> ops.HashedCross(num_buckets=32)
    wf = nvt.Workflow(hb + cross)
    out = wf.fit_transform(dataset).to_table().to_pandas()
    assert out["name-string"].between(0, 15).all()
    assert out["id_X_label"].between(0, 31).all()


def test_groupby_sessionization(df):
    ds = nvt.Dataset(df).shuffle_by_keys(["id"])
    node = ["id", "x", "timestamp"] >> ops.Groupby(
        groupby_cols=["id"], sort_cols=["timestamp"], aggs={"x": ["list", "mean"], "timestamp": ["first"]}
    )
    wf = nvt.Workflow(node)
    out = wf.fit_transform(ds).to_table().to_pandas()
    ref = df.groupby("id").agg(x_mean=("x", "mean")).reset_index()
    merged = out.merge(ref, on="id", suffixes=("", "_ref"))
    np.testing.assert_allclose(
        merged["x_mean"], merged["x_mean_ref"], rtol=1e-4, equal_nan=True
    )
    # lists ordered by timestamp
    row = out[out["id"] == df["id"].iloc[0]].iloc[0]
    sub = df[df["id"] == df["id"].iloc[0]].sort_values("timestamp")
    np.testing.assert_allclose(
        np.asarray(row["x_list"]), sub["x"].to_numpy(), rtol=1e-6, equal_nan=True
    )


def test_tag_based_selector():
    import pandas as pd

    from nvtabular_tpu.loader import augment_schema
    from nvtabular_tpu.tags import Tags

    df2 = pd.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0], "c": [4, 5, 6]})
    ds = nvt.Dataset(df2)
    ds.schema = augment_schema(ds.schema, cats=["a", "c"], conts=["b"])
    node = nvt.ColumnSelector(tags=[Tags.CATEGORICAL]) >> ops.Categorify()
    wf = nvt.Workflow(node)
    wf.fit(ds)
    assert wf.output_schema.column_names == ["a", "c"]


def test_fit_schema_without_data():
    import pandas as pd

    df2 = pd.DataFrame({"a": [1], "b": [2.0]})
    schema = nvt.Dataset(df2).schema
    wf = nvt.Workflow(["a", "b"] >> ops.Rename(postfix="_r"))
    wf.fit_schema(schema)
    assert wf.output_schema.column_names == ["a_r", "b_r"]


def test_remove_inputs_reschematizes():
    import pandas as pd

    df2 = pd.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0], "c": [4, 5, 6]})
    ds = nvt.Dataset(df2)
    wf = nvt.Workflow((["a", "c"] >> ops.Categorify()) + ["b"])
    wf.fit(ds)
    wf.remove_inputs(["c"])
    out = wf.transform(nvt.TableBatch.from_pandas(df2[["a", "b"]]))
    assert out.column_names == ["a", "b"]
    assert "c" not in wf.output_schema.column_names
