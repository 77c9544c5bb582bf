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


def _ragged_batch(n=20_000, seed=1):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 5, n)
    values = rng.integers(0, 30, int(lens.sum())).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    df = pd.DataFrame({"c": rng.integers(0, 100, n).astype(np.int64)})
    from nvtabular_tpu.table import Column, TableBatch

    tb = TableBatch.from_pandas(df)
    tb["mh"] = Column(values, offsets, None)
    return tb


def test_mesh_shards_ragged(mesh):
    """List columns SHARD over the mesh (shard_map with per-shard rebased
    offsets — the P1 gap round 2 carried): output matches the host path
    bit for bit, and the dispatched arrays live on all 8 devices."""
    tb = _ragged_batch()
    graph = ["c", "mh"] >> ops.Categorify()

    host_wf = nvt.Workflow(graph)
    expected = host_wf.fit_transform(nvt.Dataset(_ragged_batch())).to_table()

    ex = JitExecutor(jit_min_rows=1024, mesh=mesh)
    wf = nvt.Workflow(["c", "mh"] >> ops.Categorify(), executor=ex)
    ds = nvt.Dataset(tb)
    wf.fit(ds)

    captured = {}
    orig = ex._shardmap_transform

    def spy(batch, node):
        out = orig(batch, node)
        captured["ran"] = True
        return out

    ex._shardmap_transform = spy
    got = wf.transform(ds).to_table()
    assert captured.get("ran"), "ragged batch did not take the shard_map path"

    np.testing.assert_array_equal(
        np.asarray(got["c"].values), np.asarray(expected["c"].values)
    )
    assert got["mh"].is_list
    # list parity row by row (offset layouts may differ; contents must not)
    go, gv = np.asarray(got["mh"].offsets), np.asarray(got["mh"].values)
    eo, ev = np.asarray(expected["mh"].offsets), np.asarray(expected["mh"].values)
    np.testing.assert_array_equal(go[1:] - go[:-1], eo[1:] - eo[:-1])
    for r in range(0, len(go) - 1, 997):
        np.testing.assert_array_equal(
            gv[go[r] : go[r + 1]], ev[eo[r] : eo[r + 1]]
        )
    np.testing.assert_array_equal(gv[go[0] : go[-1]], ev[eo[0] : eo[-1]])


def test_mesh_kitchen_sink_shards(mesh):
    """The FULL engine-matrix-style workflow — multihot Categorify, k-fold
    TargetEncoding, multi-key JoinGroupby, HashedCross, Bucketize, fused
    cont chain — runs sharded over the mesh with list columns present,
    matching the host executor (reference distributes this whole workflow
    through dask, bench/examples/MultiGPUBench.md)."""
    n = 16_000
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "cat_tiny": rng.integers(0, 9, n).astype(np.int64),
            "cat_big": rng.integers(0, 1 << 30, n).astype(np.int64),
            "user": rng.integers(0, 50, n).astype(np.int64),
            "item": rng.integers(0, 400, n).astype(np.int64),
            "x1": rng.normal(3.0, 2.0, n).astype(np.float32),
            "x2": rng.normal(-1.0, 4.0, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int32),
        }
    )
    df.loc[rng.random(n) < 0.07, "x1"] = np.nan

    def make_batch():
        from nvtabular_tpu.table import Column, TableBatch

        lens = np.random.default_rng(42).integers(0, 4, n)
        values = np.random.default_rng(43).integers(0, 31, int(lens.sum())).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        b = TableBatch.from_pandas(df)
        b["genres"] = Column(values, offsets)
        return b

    def graph():
        cats = ["cat_tiny", "cat_big", "genres"] >> ops.Categorify()
        te = ["user", "item"] >> ops.TargetEncoding(
            target="label", kfold=3, p_smooth=20, seed=7
        )
        jg = ["user", "item"] >> ops.JoinGroupby(
            cont_cols=["x2"], stats=["mean", "count"]
        )
        conts = (
            ["x1", "x2"]
            >> ops.FillMissing()
            >> ops.Clip(min_value=-5.0, max_value=8.0)
            >> ops.Normalize()
        )
        cross = ["user", "item"] >> ops.HashedCross(num_buckets=128)
        bucket = ["x2"] >> ops.Bucketize(
            boundaries={"x2": [-4.0, -1.0, 0.0, 2.0, 5.0]}
        )
        return cats + te + jg + conts + cross + bucket + ["label"]

    expected = (
        nvt.Workflow(graph()).fit_transform(nvt.Dataset(make_batch())).to_table()
    )

    ex = JitExecutor(jit_min_rows=1024, mesh=mesh)
    wf = nvt.Workflow(graph(), executor=ex)
    ds = nvt.Dataset(make_batch())
    wf.fit(ds)
    ran = {}
    orig = ex._shardmap_transform

    def spy(b, o):
        ran["x"] = True
        return orig(b, o)

    ex._shardmap_transform = spy
    got = wf.transform(ds).to_table()
    assert ran.get("x"), "kitchen-sink batch did not take the shard_map path"

    for name in expected.column_names:
        e, g = expected[name], got[name]
        if e.is_list:
            eo, go = np.asarray(e.offsets), np.asarray(g.offsets)
            np.testing.assert_array_equal(eo[1:] - eo[:-1], go[1:] - go[:-1])
            np.testing.assert_array_equal(
                np.asarray(g.values)[go[0] : go[-1]],
                np.asarray(e.values)[eo[0] : eo[-1]],
            )
        else:
            np.testing.assert_allclose(
                np.asarray(g.values, dtype=np.float64),
                np.asarray(e.values, dtype=np.float64),
                rtol=1e-5,
                atol=1e-6,
                err_msg=name,
            )


def test_mesh_fit_counts_on_device(mesh):
    """Categorify vocabulary counts run ON the mesh (one all_to_all
    exchange+sort per column): fit_mesh must be invoked, and the fitted
    vocab — order, codes, null handling, freq_threshold — must equal the
    host fit exactly. Columns whose values exceed int32 fall back to the
    host counter inside fit_mesh, still exact."""
    rng = np.random.default_rng(9)
    n = 30_000
    df = pd.DataFrame(
        {
            "c_pow": rng.choice(rng.integers(0, 1 << 30, 4000), n).astype(np.int64),
            "c_small": rng.integers(0, 15, n).astype(np.int64),
            "c_wide": rng.integers(0, 1 << 40, n).astype(np.int64),  # > int32
            "x": rng.normal(size=n).astype(np.float32),
        }
    )
    df.loc[rng.random(n) < 0.1, "c_small"] = -1  # will ride validity? no: value
    from nvtabular_tpu.table import TableBatch

    tb = TableBatch.from_pandas(df)

    def graph():
        return (
            ["c_pow", "c_small", "c_wide"] >> ops.Categorify(freq_threshold=2)
        ) + (["x"] >> ops.Normalize())

    host_wf = nvt.Workflow(graph())
    expected = host_wf.fit_transform(nvt.Dataset(TableBatch.from_pandas(df))).to_table()

    ex = JitExecutor(jit_min_rows=1024, mesh=mesh)
    wf = nvt.Workflow(graph(), executor=ex)
    cat_op = [nd.op for nd in wf.graph.nodes if isinstance(nd.op, ops.Categorify)][0]
    called = {}
    orig = cat_op.fit_mesh

    def spy(buffers, m, axis="data"):
        called["cols"] = sorted(buffers)
        return orig(buffers, m, axis)

    cat_op.fit_mesh = spy
    got = wf.fit_transform(nvt.Dataset(tb)).to_table()
    assert called.get("cols") == ["c_pow", "c_small", "c_wide"], called

    for name in expected.column_names:
        np.testing.assert_allclose(
            np.asarray(got[name].values, dtype=np.float64),
            np.asarray(expected[name].values, dtype=np.float64),
            rtol=1e-5,
            atol=1e-6,
            err_msg=name,
        )


def test_mesh_fit_multihot_and_nulls(mesh):
    """Mesh fit over a list (multihot) column — flat values counted — and a
    nullable int column; parity with the host fit."""
    rng = np.random.default_rng(4)
    n = 8192
    lens = rng.integers(0, 4, n)
    values = rng.integers(0, 200, int(lens.sum())).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    from nvtabular_tpu.table import Column, TableBatch

    def make():
        b = TableBatch()
        b["mh"] = Column(values.copy(), offsets.copy())
        nullable = rng.integers(0, 50, n).astype(np.int64)
        b["c"] = Column(nullable, None, rng.random(n) > 0.1)
        return b

    batch = make()
    expected = (
        nvt.Workflow(["mh", "c"] >> ops.Categorify())
        .fit_transform(nvt.Dataset(batch))
        .to_table()
    )
    got = (
        nvt.Workflow(
            ["mh", "c"] >> ops.Categorify(),
            executor=JitExecutor(jit_min_rows=1024, mesh=mesh),
        )
        .fit_transform(nvt.Dataset(batch))
        .to_table()
    )
    np.testing.assert_array_equal(
        np.asarray(got["c"].values), np.asarray(expected["c"].values)
    )
    np.testing.assert_array_equal(
        np.asarray(got["mh"].values)[: int(offsets[-1])],
        np.asarray(expected["mh"].values)[: int(offsets[-1])],
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mesh_ragged_fuzz_shapes(mesh, seed):
    """Random ragged batches — odd row counts, empty lists, rows fewer
    than one shard's bucket, nullable scalars — must shard and match the
    host path exactly."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.choice([1500, 4097, 9000, 20011]))
    lens = rng.integers(0, 6, n)
    lens[rng.random(n) < 0.3] = 0  # plenty of empty lists
    values = rng.integers(0, 40, int(lens.sum())).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    from nvtabular_tpu.table import Column, TableBatch

    def make():
        b = TableBatch()
        b["mh"] = Column(values.copy(), offsets.copy())
        b["c"] = Column(
            rng.integers(0, 300, n).astype(np.int64), None, rng.random(n) > 0.05
        )
        b["x"] = Column(rng.normal(size=n).astype(np.float32))
        return b

    batch = make()

    def graph():
        return (["mh", "c"] >> ops.Categorify()) + (["x"] >> ops.Normalize())

    expected = nvt.Workflow(graph()).fit_transform(nvt.Dataset(batch)).to_table()
    got = (
        nvt.Workflow(graph(), executor=JitExecutor(jit_min_rows=256, mesh=mesh))
        .fit_transform(nvt.Dataset(batch))
        .to_table()
    )
    np.testing.assert_array_equal(
        np.asarray(got["c"].values), np.asarray(expected["c"].values)
    )
    np.testing.assert_allclose(
        np.asarray(got["x"].values), np.asarray(expected["x"].values), rtol=1e-5
    )
    eo, go = np.asarray(expected["mh"].offsets), np.asarray(got["mh"].offsets)
    np.testing.assert_array_equal(eo[1:] - eo[:-1], go[1:] - go[:-1])
    np.testing.assert_array_equal(
        np.asarray(got["mh"].values)[go[0] : go[-1]],
        np.asarray(expected["mh"].values)[eo[0] : eo[-1]],
    )
