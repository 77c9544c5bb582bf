"""Hybrid execution: mixed graphs fuse their jit-safe PREFIX into one
device program while host-only ops (UDF, TargetEncoding, strings) run
eagerly on the fused results — instead of the whole graph falling back to
host when any single op is host-only."""

import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor


def _frontier_programs(ex: JitExecutor) -> int:
    return sum(
        1 for k in ex._jit_cache if isinstance(k[0], tuple) and k[0][0] == "frontier"
    )


def _mixed_df(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "a": rng.integers(0, 100, n).astype(np.int64),
            "b": rng.integers(0, 50, n).astype(np.int64),
            "x": rng.normal(0, 1, n),
            "y": rng.integers(0, 2, n).astype(np.int64),
        }
    )


def triple(col):
    return np.asarray(col) * 3.0


def test_mixed_graph_uses_frontier_and_matches_host():
    df = _mixed_df()
    cats = ["a", "b"] >> ops.Categorify()
    lam = (["x"] >> ops.Normalize()) >> ops.LambdaOp(triple, dtype=np.float64)
    te = cats >> ops.TargetEncoding(["y"], kfold=2)
    graph = cats + lam + te + ["y"]
    ds = nvt.Dataset(df, part_size=64 * 1024)

    ex = JitExecutor(jit_min_rows=0)
    out_hybrid = nvt.Workflow(graph, executor=ex).fit_transform(ds).to_table().to_pandas()
    assert _frontier_programs(ex) >= 1  # the jit island actually compiled

    wf2 = nvt.Workflow(
        (["a", "b"] >> ops.Categorify())
        + ((["x"] >> ops.Normalize()) >> ops.LambdaOp(triple, dtype=np.float64))
        + ((["a", "b"] >> ops.Categorify()) >> ops.TargetEncoding(["y"], kfold=2))
        + ["y"],
        executor=LocalExecutor(),
    )
    wf2.fit(ds)
    out_host = wf2.transform(ds).to_table().to_pandas()
    for c in out_hybrid.columns:
        if out_hybrid[c].dtype.kind == "f":
            np.testing.assert_allclose(out_hybrid[c], out_host[c], rtol=1e-5, err_msg=c)
        else:
            np.testing.assert_array_equal(out_hybrid[c], out_host[c], err_msg=c)


def test_string_columns_stay_host_while_numeric_fuses():
    rng = np.random.default_rng(1)
    n = 3000
    df = pd.DataFrame(
        {
            "s": rng.choice(["u", "v", "w"], n),
            "i": rng.integers(0, 40, n).astype(np.int64),
        }
    )
    graph = (["s"] >> ops.Categorify()) + (["i"] >> ops.Categorify())
    ds = nvt.Dataset(df)
    ex = JitExecutor(jit_min_rows=0)
    out = nvt.Workflow(graph, executor=ex).fit_transform(ds).to_table().to_pandas()
    assert _frontier_programs(ex) >= 1  # the int branch fused
    # string branch still encoded correctly on host
    assert set(out["s"].unique()) <= {3, 4, 5}
    assert out["i"].min() >= 3


def test_all_host_graph_no_frontier():
    df = _mixed_df(500)
    graph = ["x"] >> ops.LambdaOp(triple, dtype=np.float64)
    ex = JitExecutor(jit_min_rows=0)
    out = nvt.Workflow(graph, executor=ex).fit_transform(nvt.Dataset(df)).to_table()
    assert _frontier_programs(ex) == 0
    np.testing.assert_allclose(
        np.asarray(out["x"].values), df["x"].to_numpy() * 3.0, rtol=1e-12
    )


def test_hetero_streaming_order_and_parity():
    """hetero=f routes a fraction of batches through the host executor on a
    worker thread; outputs must come back in order with identical values."""
    rng = np.random.default_rng(2)
    n = 60_000
    df = pd.DataFrame(
        {f"C{i}": rng.integers(0, 300, n).astype(np.int64) for i in range(4)}
        | {"x": rng.normal(0, 1, n)}
    )
    cats = [f"C{i}" for i in range(4)] >> ops.Categorify()
    wf = nvt.Workflow(cats + (["x"] >> ops.Normalize()), executor=JitExecutor(jit_min_rows=0))
    ds = nvt.Dataset(df, part_size=512 * 1024)
    wf.fit(ds)
    normal = [b.to_pandas() for b in wf.transform(ds).to_batches()]
    for frac in (0.34, 1.0):
        hetero = [b.to_pandas() for b in wf.transform(ds).to_batches(hetero=frac)]
        assert len(hetero) == len(normal)
        for a, b in zip(normal, hetero):
            for c in a.columns:
                if a[c].dtype.kind == "f":
                    np.testing.assert_allclose(a[c], b[c], rtol=1e-5)
                else:
                    np.testing.assert_array_equal(a[c], b[c])
