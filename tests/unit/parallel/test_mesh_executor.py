"""Data-parallel ETL transform over the virtual 8-device mesh: the SAME
fused workflow program, rows sharded over the mesh's data axis, state
replicated (SURVEY §2.8 P1; reference bench/examples/MultiGPUBench.md runs
the ETL over a LocalCUDACluster the analogous way)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor
from nvtabular_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"data": -1})


def _make_df(n=40_000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "c1": rng.integers(0, 500, n).astype(np.int64),
            "c2": rng.integers(0, 50, n).astype(np.int64),
            "x": rng.normal(3.0, 2.0, n),
            "y": rng.uniform(-1, 1, n),
        }
    )


def _workflow(executor):
    cats = ["c1", "c2"] >> ops.Categorify()
    conts = ["x", "y"] >> ops.FillMissing() >> ops.Normalize()
    return nvt.Workflow(cats + conts, executor=executor)


def test_mesh_transform_matches_host(mesh):
    df = _make_df()
    ds = nvt.Dataset(df, npartitions=2)

    host_wf = _workflow(None)  # default executor
    expected = host_wf.fit_transform(nvt.Dataset(df, npartitions=2)).to_table().to_pandas()

    mesh_wf = _workflow(JitExecutor(jit_min_rows=1024, mesh=mesh))
    got = mesh_wf.fit_transform(ds).to_table().to_pandas()

    for col in expected.columns:
        np.testing.assert_allclose(
            np.asarray(got[col], dtype=np.float64),
            np.asarray(expected[col], dtype=np.float64),
            rtol=1e-5,
            atol=1e-6,
            err_msg=col,
        )


def test_mesh_transform_actually_shards(mesh):
    """The dispatched input arrays must be laid out across all 8 devices,
    not replicated on one."""
    df = _make_df()
    ex = JitExecutor(jit_min_rows=1024, mesh=mesh)
    wf = _workflow(ex)
    ds = nvt.Dataset(df, npartitions=1)
    wf.fit(ds)

    captured = {}
    orig = ex._put_batch

    def spy(stacked):
        out = orig(stacked)
        captured.update(out if isinstance(out, dict) else {})
        return out

    ex._put_batch = spy
    wf.transform(ds).to_table()
    assert captured, "mesh path did not dispatch any device arrays"
    sharded = [
        v
        for v in captured.values()
        if hasattr(v, "sharding") and len(v.sharding.device_set) == 8
    ]
    assert sharded, {k: getattr(v, "sharding", None) for k, v in captured.items()}


def test_mesh_falls_back_on_ragged(mesh):
    """Batches with list columns can't row-shard (offsets are rows+1):
    executor must still produce correct output via the single-device path."""
    n = 20_000
    rng = np.random.default_rng(1)
    values = rng.integers(0, 30, n * 2).astype(np.int64)
    offsets = np.arange(0, 2 * n + 1, 2, dtype=np.int64)
    df = pd.DataFrame({"c": rng.integers(0, 100, n).astype(np.int64)})
    from nvtabular_tpu.table import Column, TableBatch

    tb = TableBatch.from_pandas(df)
    tb["mh"] = Column(values, offsets, None)

    wf = nvt.Workflow(
        ["c", "mh"] >> ops.Categorify(),
        executor=JitExecutor(jit_min_rows=1024, mesh=mesh),
    )
    out = wf.fit_transform(nvt.Dataset(tb)).to_table()
    assert out["c"].values.min() >= 3
    assert out["mh"].is_list
