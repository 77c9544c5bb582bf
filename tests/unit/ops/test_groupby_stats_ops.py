import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


@pytest.fixture
def gdf():
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c", "d"], 300),
            "cat2": rng.choice(["p", "q"], 300),
            "cont": rng.normal(0, 1, 300),
            "target": rng.integers(0, 2, 300).astype(np.float64),
        }
    )


def test_join_groupby_matches_pandas(gdf, tmp_path):
    node = ["cat"] >> ops.JoinGroupby(
        cont_cols=["cont"], stats=["count", "sum", "mean", "std", "min", "max"],
        out_path=str(tmp_path),
    )
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(gdf, part_size=4 * 1024)
    out = wf.fit_transform(ds).to_table().to_pandas()

    ref = gdf.groupby("cat")["cont"].agg(["count", "sum", "mean", "std", "min", "max"])
    for stat in ["sum", "mean", "std", "min", "max"]:
        expected = gdf["cat"].map(ref[stat]).to_numpy()
        np.testing.assert_allclose(
            out[f"cat_cont_{stat}"], expected.astype(np.float32), rtol=1e-4
        )
    expected_count = gdf["cat"].map(ref["count"]).to_numpy()
    np.testing.assert_array_equal(out["cat_count"], expected_count.astype(np.int32))


def test_join_groupby_multi_key(gdf, tmp_path):
    node = [["cat", "cat2"]] >> ops.JoinGroupby(
        cont_cols=["cont"], stats=["mean"], out_path=str(tmp_path)
    )
    wf = nvt.Workflow(node)
    out = wf.fit_transform(nvt.Dataset(gdf)).to_table().to_pandas()
    ref = gdf.groupby(["cat", "cat2"])["cont"].mean()
    expected = gdf.set_index(["cat", "cat2"]).index.map(ref).to_numpy()
    np.testing.assert_allclose(out["cat_cat2_cont_mean"], expected.astype(np.float32), rtol=1e-4)


def test_target_encoding_no_folds_matches_formula(gdf, tmp_path):
    p = 20.0
    node = ["cat"] >> ops.TargetEncoding("target", kfold=1, p_smooth=p, out_path=str(tmp_path))
    wf = nvt.Workflow(node)
    out = wf.fit_transform(nvt.Dataset(gdf, part_size=4 * 1024)).to_table().to_pandas()

    gmean = gdf["target"].mean()
    grp = gdf.groupby("cat")["target"].agg(["sum", "count"])
    te = (grp["sum"] + p * gmean) / (grp["count"] + p)
    expected = gdf["cat"].map(te).to_numpy()
    np.testing.assert_allclose(out["TE_cat_target"], expected.astype(np.float32), rtol=1e-5)


def test_target_encoding_kfold_out_of_fold(gdf, tmp_path):
    p = 10.0
    kfold = 3
    node = ["cat"] >> ops.TargetEncoding(
        "target", kfold=kfold, fold_seed=7, p_smooth=p, out_path=str(tmp_path), drop_folds=False
    )
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(gdf, part_size=4 * 1024)
    out = wf.fit_transform(ds).to_table().to_pandas()
    assert "__fold__" in out.columns
    folds = out["__fold__"].to_numpy()
    assert set(np.unique(folds)) <= {0, 1, 2}

    gmean = gdf["target"].mean()
    df = gdf.copy()
    df["fold"] = folds
    # manual OOF computation
    expected = np.empty(len(df))
    total = df.groupby("cat")["target"].agg(["sum", "count"])
    per_fold = df.groupby(["fold", "cat"])["target"].agg(["sum", "count"])
    for i, row in df.iterrows():
        s_all, c_all = total.loc[row["cat"]]
        key = (row["fold"], row["cat"])
        s_f, c_f = per_fold.loc[key] if key in per_fold.index else (0.0, 0.0)
        expected[i] = ((s_all - s_f) + p * gmean) / ((c_all - c_f) + p)
    np.testing.assert_allclose(out["TE_cat_target"], expected.astype(np.float32), rtol=1e-4)


def test_target_encoding_transform_new_keys(gdf, tmp_path):
    node = ["cat"] >> ops.TargetEncoding("target", kfold=1, p_smooth=20, out_path=str(tmp_path))
    wf = nvt.Workflow(node)
    wf.fit(nvt.Dataset(gdf))
    new = pd.DataFrame({"cat": ["UNSEEN"], "target": [0.0]})
    out = wf.transform(nvt.Dataset(new)).to_table().to_pandas()
    np.testing.assert_allclose(out["TE_cat_target"][0], gdf["target"].mean(), rtol=1e-5)


def test_join_groupby_device_matches_host(tmp_path):
    """Device gather path (single-int-key groups) must equal the host
    arrow-join path, including unseen keys (pad slot) and cuckoo wide keys."""
    from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor

    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "cat": rng.integers(0, 50, n).astype(np.int64),
            "wide": rng.choice(rng.integers(0, 1 << 30, 300), n).astype(np.int64),
            "price": rng.normal(10, 3, n).astype(np.float32),
        }
    )
    ds = nvt.Dataset(df, part_size=64 * 1024)

    def build():
        return ["cat", "wide"] >> ops.JoinGroupby(
            cont_cols=["price"], stats=["mean", "std", "count"], out_path=str(tmp_path)
        )

    ex = JitExecutor(jit_min_rows=0)
    out_dev = nvt.Workflow(build(), executor=ex).fit_transform(ds).to_table().to_pandas()
    assert len(ex._jit_cache) >= 1  # transform actually compiled

    wf2 = nvt.Workflow(build(), executor=LocalExecutor())
    wf2.fit(ds)
    out_host = wf2.transform(ds).to_table().to_pandas()
    for c in out_dev.columns:
        if out_dev[c].dtype.kind == "f":
            np.testing.assert_allclose(out_dev[c], out_host[c], rtol=1e-4, err_msg=c)
        else:
            np.testing.assert_array_equal(out_dev[c], out_host[c], err_msg=c)


def test_target_encoding_device_matches_host_foldfree(tmp_path):
    """kfold<=1 TE (serving/new-data path) runs fused on device; parity
    with the host arrow-join path. kfold>1 stays host (fold RNG)."""
    from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor

    rng = np.random.default_rng(1)
    n = 4000
    df = pd.DataFrame(
        {
            "cat": rng.integers(0, 60, n).astype(np.int64),
            "y": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    ds = nvt.Dataset(df, part_size=64 * 1024)

    def build(k):
        return ["cat"] >> ops.TargetEncoding(["y"], kfold=k, p_smooth=10, out_path=str(tmp_path))

    ex = JitExecutor(jit_min_rows=0)
    out_dev = nvt.Workflow(build(1) + ["y"], executor=ex).fit_transform(ds).to_table().to_pandas()
    assert len(ex._jit_cache) >= 1
    wf2 = nvt.Workflow(build(1) + ["y"], executor=LocalExecutor())
    wf2.fit(ds)
    out_host = wf2.transform(ds).to_table().to_pandas()
    np.testing.assert_allclose(out_dev["TE_cat_y"], out_host["TE_cat_y"], rtol=1e-5)

    # kfold>1 must NOT take the device path (fold ids are host RNG)
    ex2 = JitExecutor(jit_min_rows=0)
    te_op = ops.TargetEncoding(["y"], kfold=3, out_path=str(tmp_path))
    wf3 = nvt.Workflow((["cat"] >> te_op) + ["y"], executor=ex2)
    out_k = wf3.fit_transform(ds).to_table().to_pandas()
    assert np.isfinite(out_k[[c for c in out_k.columns if c.startswith("TE_")][0]]).all()


def test_target_encoding_multi_target_and_multi_group(tmp_path):
    """TE with several targets and several groups → one TE column per
    (group, target) pair, each matching the smoothing formula."""
    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 20, n).astype(np.int64),
            "b": rng.integers(0, 10, n).astype(np.int64),
            "y1": rng.integers(0, 2, n).astype(np.int64),
            "y2": rng.normal(0, 1, n),
        }
    )
    node = ["a", "b"] >> ops.TargetEncoding(
        ["y1", "y2"], kfold=1, p_smooth=5, out_path=str(tmp_path)
    )
    wf = nvt.Workflow(node + ["y1", "y2"])
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    te_cols = sorted(c for c in out.columns if c.startswith("TE_"))
    assert te_cols == ["TE_a_y1", "TE_a_y2", "TE_b_y1", "TE_b_y2"]
    # golden: smoothing formula for one (group, target) pair
    g = df.groupby("a")["y1"].agg(["sum", "count"])
    mean = df["y1"].mean()
    expect = (g.loc[df["a"], "sum"].to_numpy() + 5 * mean) / (
        g.loc[df["a"], "count"].to_numpy() + 5
    )
    np.testing.assert_allclose(out["TE_a_y1"], expect, rtol=1e-5)


def test_join_groupby_int64_beyond_int32_falls_back_to_host(tmp_path):
    """Keys outside int32 can't be matched on device (inputs are int32);
    lookup_struct must decline so the host path runs — regression for the
    DirectLookup overflow."""
    from nvtabular_tpu.dag.executor import JitExecutor

    base = np.int64(5_000_000_000)
    df = pd.DataFrame(
        {
            "k": (base + np.arange(300) % 50).astype(np.int64),
            "x": np.random.default_rng(0).normal(0, 1, 300),
        }
    )
    node = ["k"] >> ops.JoinGroupby(cont_cols=["x"], stats=["mean"], out_path=str(tmp_path))
    wf = nvt.Workflow(node, executor=JitExecutor(jit_min_rows=0))
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    ref = df.groupby("k")["x"].transform("mean").to_numpy()
    np.testing.assert_allclose(out["k_x_mean"], ref, rtol=1e-5)


def test_join_groupby_null_keys_host_device_agree(tmp_path):
    """A null-masked key must MISS on both paths (previously host joined
    the underlying value while device missed)."""
    from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor
    from nvtabular_tpu.table import Column, TableBatch

    rng = np.random.default_rng(0)
    n = 400
    keys = rng.integers(0, 20, n).astype(np.int64)
    x = rng.normal(0, 1, n)
    validity = rng.random(n) > 0.2

    def dataset():
        tb = TableBatch({"k": Column(keys, None, validity), "x": Column(x)})
        return nvt.Dataset(tb)

    def build():
        return ["k"] >> ops.JoinGroupby(cont_cols=["x"], stats=["count"], out_path=str(tmp_path))

    host_wf = nvt.Workflow(build(), executor=LocalExecutor())
    host_wf.fit(dataset())
    host = host_wf.transform(dataset()).to_table().to_pandas()
    dev_wf = nvt.Workflow(build(), executor=JitExecutor(jit_min_rows=0))
    dev_wf.fit(dataset())
    dev = dev_wf.transform(dataset()).to_table().to_pandas()
    np.testing.assert_array_equal(host["k_count"], dev["k_count"])
    assert (np.asarray(host["k_count"])[~validity] == 0).all()


def test_multikey_h64_collision_falls_back_exact(monkeypatch):
    """If the fitted 64-bit composite hashes collide, the native table must
    be refused and the exact (arrow) join used instead."""
    import nvtabular_tpu.ops.groupby_stats as gs

    df = pd.DataFrame(
        {
            "a": np.array([1, 1, 2, 2, 3, 3] * 50, dtype=np.int64),
            "b": np.array([10, 11, 10, 11, 10, 11] * 50, dtype=np.int64),
            "x": np.arange(300, dtype=np.float32),
        }
    )
    wf = nvt.Workflow(
        ["a", "b"] >> ops.JoinGroupby(cont_cols=["x"], stats=["mean"])
    )
    golden = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()

    # force every composite hash to collide: native table must refuse
    monkeypatch.setattr(
        gs, "_h64_multi_key", lambda arrays: np.zeros(len(arrays[0]), np.int64)
    )
    wf2 = nvt.Workflow(
        ["a", "b"] >> ops.JoinGroupby(cont_cols=["x"], stats=["mean"])
    )
    got = wf2.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    for col in golden.columns:
        np.testing.assert_allclose(
            got[col].to_numpy(), golden[col].to_numpy(), err_msg=col
        )


def test_sentinel_int64_min_key_joins_exactly():
    """INT64_MIN is the native map's empty-slot sentinel; a real key equal
    to it must still join through the dedicated sentinel path."""
    kmin = np.iinfo(np.int64).min
    df = pd.DataFrame(
        {
            "k": np.array([kmin, 5, kmin, 7, 5] * 40, dtype=np.int64),
            "x": np.arange(200, dtype=np.float32),
        }
    )
    wf = nvt.Workflow(["k"] >> ops.JoinGroupby(cont_cols=["x"], stats=["count", "mean"]))
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    pdf = df.copy()
    want_count = pdf.groupby("k")["x"].transform("count").to_numpy()
    want_mean = pdf.groupby("k")["x"].transform("mean").to_numpy()
    np.testing.assert_allclose(out["k_count_x"] if "k_count_x" in out else out[[c for c in out.columns if "count" in c][0]], want_count)
    np.testing.assert_allclose(out[[c for c in out.columns if "mean" in c][0]], want_mean, rtol=1e-6)
