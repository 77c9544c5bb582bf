"""Golden-value tests vs pandas/numpy reference implementations for ops
whose semantics the schema sweep can't check (SURVEY §4: golden comparisons
against pandas are the backbone of the reference's op tests)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor


def test_groupby_aggs_match_pandas():
    rng = np.random.default_rng(0)
    n = 1000
    df = pd.DataFrame(
        {
            "sess": rng.integers(0, 30, n).astype(np.int64),
            "ts": rng.integers(0, 1000, n).astype(np.int64),
            "price": rng.normal(10, 3, n).astype(np.float32),
        }
    )
    node = ["sess", "ts", "price"] >> ops.Groupby(
        groupby_cols=["sess"],
        sort_cols=["ts"],
        aggs={"price": ["mean", "std", "count", "max"], "ts": ["first", "last"]},
    )
    ds = nvt.Dataset(df)  # single partition → partition-local == global
    out = wf_out = nvt.Workflow(node).fit_transform(ds).to_table().to_pandas()
    out = out.sort_values("sess").reset_index(drop=True)

    ref = df.sort_values(["sess", "ts"], kind="stable").groupby("sess").agg(
        price_mean=("price", "mean"),
        price_std=("price", "std"),
        price_count=("price", "count"),
        price_max=("price", "max"),
        ts_first=("ts", "first"),
        ts_last=("ts", "last"),
    ).reset_index()
    np.testing.assert_array_equal(out["sess"], ref["sess"])
    np.testing.assert_allclose(out["price_mean"], ref["price_mean"], rtol=1e-5)
    np.testing.assert_allclose(out["price_std"], ref["price_std"], rtol=1e-4)
    np.testing.assert_array_equal(out["price_count"], ref["price_count"])
    np.testing.assert_allclose(out["price_max"], ref["price_max"], rtol=1e-6)
    np.testing.assert_array_equal(out["ts_first"], ref["ts_first"])
    np.testing.assert_array_equal(out["ts_last"], ref["ts_last"])


def test_groupby_list_agg():
    df = pd.DataFrame(
        {"s": [1, 1, 2, 2, 2], "t": [2, 1, 3, 1, 2], "v": [10, 20, 30, 40, 50]}
    )
    node = ["s", "t", "v"] >> ops.Groupby(
        groupby_cols=["s"], sort_cols=["t"], aggs={"v": ["list"]}
    )
    out = nvt.Workflow(node).fit_transform(nvt.Dataset(df)).to_table()
    lists = dict(zip(np.asarray(out["s"].values).tolist(), out["v_list"].to_pylist()))
    assert lists[1] == [20, 10]  # sorted by t
    assert lists[2] == [40, 50, 30]


def test_difference_lag_matches_pandas_shift():
    df = pd.DataFrame(
        {
            "uid": [1, 1, 1, 2, 2, 3],
            "x": [1.0, 4.0, 9.0, 2.0, 8.0, 5.0],
        }
    )
    node = ["x"] >> ops.DifferenceLag("uid", shift=[1, -1])
    wf = nvt.Workflow(node + ["uid"])
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    ref_lag = df.groupby("uid")["x"].diff(1)
    ref_lead = df.groupby("uid")["x"].diff(-1)
    np.testing.assert_allclose(out["x_difference_lag_1"], ref_lag, rtol=1e-6)
    np.testing.assert_allclose(out["x_difference_lag_-1"], ref_lead, rtol=1e-6)


def test_bucketize_matches_digitize():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 100, 500)
    bounds = [10.0, 30.0, 70.0]
    df = pd.DataFrame({"x": x})
    node = ["x"] >> ops.Bucketize({"x": bounds})
    out = nvt.Workflow(node).fit_transform(nvt.Dataset(df)).to_table()
    np.testing.assert_array_equal(
        np.asarray(out["x"].values), np.digitize(x, bounds)
    )


def test_hash_ops_host_device_deterministic():
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 1 << 30, 3000).astype(np.int64),
            "b": rng.integers(0, 1 << 30, 3000).astype(np.int64),
        }
    )
    node = (["a"] >> ops.HashBucket(64)) + ([("a", "b")] >> ops.HashedCross(128))
    ds = nvt.Dataset(df)
    host = nvt.Workflow(node, executor=LocalExecutor()).fit_transform(ds).to_table()
    jit = nvt.Workflow(node, executor=JitExecutor(jit_min_rows=0))
    jit_out = jit.fit_transform(ds).to_table()
    np.testing.assert_array_equal(
        np.asarray(host["a"].values), np.asarray(jit_out["a"].to_host().values)
    )
    np.testing.assert_array_equal(
        np.asarray(host["a_X_b"].values), np.asarray(jit_out["a_X_b"].to_host().values)
    )
    assert np.asarray(host["a"].values).max() < 64
    assert np.asarray(host["a_X_b"].values).max() < 128


def test_target_encoding_oof_no_leakage():
    """A unique-key category's OOF encoding must NOT equal its own target
    (out-of-fold means exclude the row's own fold)."""
    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "cat": np.arange(n).astype(np.int64),  # every key unique
            "y": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    node = ["cat"] >> ops.TargetEncoding(["y"], kfold=4, p_smooth=0)
    wf = nvt.Workflow(node + ["y"])
    out = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    te = out[[c for c in out.columns if c.startswith("TE_")][0]]
    # if leaking, TE would equal y exactly for unique keys
    assert not np.allclose(te, out["y"])
