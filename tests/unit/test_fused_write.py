"""Fused transform→write stream (io/stream_fuse.py + nvtpq_write_column_op).

The fused path must be BIT-IDENTICAL to the two-phase host stream: same
serving kernels (nvt_cat_encode_* / nvt_cont_pipe_*) over the same values,
same shuffle seeds — only the pass structure changes (reference analog:
dask materializing the workflow transform inside each to_parquet write
task, nvtabular/workflow/workflow.py:239-248).
"""

import os

import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.table import Column, TableBatch

pq = pytest.importorskip("pyarrow.parquet")


def _dataset(rows=3000, parts=5, seed=0, with_validity=False, list_col=False):
    rng = np.random.default_rng(seed)
    out = []
    for p in range(parts):
        d = TableBatch.from_pydict(
            {
                "cat_a": rng.integers(0, 50, rows).astype(np.int32),
                "cat_b": (rng.integers(0, 2**40, rows)).astype(np.int64),
                "x": rng.normal(1.0, 2.0, rows).astype(np.float32),
                "y": rng.normal(-1.0, 1.0, rows).astype(np.float32),
                "label": rng.integers(0, 2, rows).astype(np.int32),
            }
        )
        nan = rng.random(rows) < 0.1
        xv = np.asarray(d["x"].values).copy()
        xv[nan] = np.nan
        d["x"] = Column(xv)
        if with_validity and p == 2:
            d["cat_a"] = Column(
                np.asarray(d["cat_a"].values), None, rng.random(rows) > 0.2
            )
        if list_col and p == 1:
            vals = np.asarray(d["cat_a"].values)
            offs = np.arange(0, rows + 1, dtype=np.int64)
            d["cat_a"] = Column(vals, offs)
        out.append(d)
    return nvt.Dataset(out)


def _workflow(ds, **cat_kw):
    cats = ["cat_a", "cat_b"] >> ops.Categorify(**cat_kw)
    conts = (
        ["x", "y"]
        >> ops.FillMissing()
        >> ops.Clip(min_value=-3.0)
        >> ops.LogOp()
        >> ops.Normalize()
    )
    wf = nvt.Workflow(cats + conts + ["label"])
    wf.fit(ds)
    return wf


def _read_all(path):
    import pyarrow.parquet as pqm

    return {
        f: pqm.read_table(os.path.join(path, f))
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    }


def _assert_identical(d1, d2, float_ulps: bool = False):
    """Exact file equality; ``float_ulps`` relaxes float columns to a ULP
    tolerance — the two-phase stream through the workflow's default (jit)
    executor computes log1p with numpy/XLA rounding while the fused stream
    runs the host kernel (documented ≤3 ULP apart, dag/host_fuse.py)."""
    t1, t2 = _read_all(d1), _read_all(d2)
    assert set(t1) == set(t2)
    total = 0
    for f in t1:
        a, b = t1[f], t2[f]
        assert a.schema.names == b.schema.names
        assert a.num_rows == b.num_rows
        for c in a.schema.names:
            va = a.column(c).to_numpy()
            vb = b.column(c).to_numpy()
            assert va.dtype == vb.dtype, (f, c)
            if float_ulps and va.dtype.kind == "f":
                assert np.allclose(va, vb, rtol=1e-5, atol=1e-6, equal_nan=True), (f, c)
            else:
                assert np.array_equal(va, vb, equal_nan=True), (f, c)
        total += a.num_rows
    return total


def test_spec_extraction_shape():
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    ds = _dataset()
    wf = _workflow(ds)
    spec = extract_stream_spec(wf)
    assert spec is not None
    kinds = {c.name: c.kind for c in spec.columns}
    assert kinds == {
        "cat_a": "cat",
        "cat_b": "cat",
        "x": "cont",
        "y": "cont",
        "label": "none",
    }
    # output order matches the workflow's output schema
    assert [c.name for c in spec.columns] == [
        c.name for c in wf.graph.output_node.output_schema
    ]
    ops_list = spec.make_ops()
    assert ops_list[[c.name for c in spec.columns].index("label")] is None


def test_spec_rejects_unsupported():
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    ds = _dataset()
    # multi-bucket OOV has no native table
    wf = _workflow(ds, num_buckets=4)
    assert extract_stream_spec(wf) is None
    # an op outside the fusable set
    hashed = ["cat_a"] >> ops.HashBucket(100)
    wf2 = nvt.Workflow(hashed + ["label"])
    wf2.fit(ds)
    assert extract_stream_spec(wf2) is None
    # a lone LogOp must NOT fuse (numpy log1p rounding differs from the
    # kernel's — two-phase runs numpy for single-op chains)
    lone = ["x"] >> ops.LogOp()
    wf3 = nvt.Workflow(lone)
    wf3.fit(ds)
    assert extract_stream_spec(wf3) is None


def test_fused_equals_two_phase(tmp_path):
    ds = _dataset()
    wf = _workflow(ds)
    td = wf.transform(ds)
    d1, d2 = str(tmp_path / "fused"), str(tmp_path / "twophase")
    d3 = str(tmp_path / "host_twophase")
    os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
    try:
        td.to_parquet(d1, shuffle="per_worker", output_files=3)
        os.environ["NVT_FUSED_WRITE"] = "0"
        td.to_parquet(d2, shuffle="per_worker", output_files=3)
        os.environ.pop("NVT_FUSED_WRITE")
        # two-phase through the HOST engine (what the fused stream fuses):
        # must match BIT FOR BIT
        from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
        from nvtabular_tpu.io.shuffle import check_shuffle_arg
        from nvtabular_tpu.io.writer import write_dataset

        host = FusedHostExecutor()
        node = wf.graph.output_node

        class _S:
            def to_batches(self, prefetch=1, **kw):
                for b in ds.to_batches():
                    yield host.transform_batch(b, node)

        write_dataset(_S(), d3, shuffle=check_shuffle_arg("per_worker"), out_files=3)
    finally:
        os.environ.pop("NVT_FUSED_WRITE", None)
        os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
    total = _assert_identical(d1, d3)
    assert total == ds.num_rows
    # vs the default (jit) two-phase stream: float columns may differ by
    # log1p ULPs between the host kernel and numpy/XLA — engine-difference
    # class, everything else exact
    _assert_identical(d1, d2, float_ulps=True)


def test_fused_fallback_windows(tmp_path):
    """A window with validity / list columns degrades to the transform
    fallback and still matches the two-phase stream exactly."""
    for variant in ("validity", "list"):
        ds = _dataset(
            with_validity=variant == "validity", list_col=variant == "list"
        )
        wf = _workflow(ds)
        td = wf.transform(ds)
        d1 = str(tmp_path / f"fused_{variant}")
        d2 = str(tmp_path / f"two_{variant}")
        os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
        try:
            td.to_parquet(d1, shuffle="per_worker", output_files=2)
            os.environ["NVT_FUSED_WRITE"] = "0"
            td.to_parquet(d2, shuffle="per_worker", output_files=2)
        finally:
            os.environ.pop("NVT_FUSED_WRITE", None)
            os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
        if variant == "list":
            # list windows route both paths through arrow; compare row sets
            t1, t2 = _read_all(d1), _read_all(d2)
            n1 = sum(t.num_rows for t in t1.values())
            n2 = sum(t.num_rows for t in t2.values())
            assert n1 == n2 == ds.num_rows
        else:
            # fallback windows draw the window shuffle differently
            # (permutation vs seeded Fisher-Yates) — same rows per file
            # (hash split is identical), different order. Compare content
            # keyed by cat_b's raw-unique codes.
            t1, t2 = _read_all(d1), _read_all(d2)
            assert set(t1) == set(t2)
            for f in t1:
                a, b = t1[f], t2[f]
                assert a.num_rows == b.num_rows
                ka = np.argsort(a.column("cat_b").to_numpy(), kind="stable")
                kb = np.argsort(b.column("cat_b").to_numpy(), kind="stable")
                for c in a.schema.names:
                    va = a.column(c).to_numpy()[ka]
                    vb = b.column(c).to_numpy()[kb]
                    if va.dtype.kind == "f":
                        assert np.allclose(va, vb, rtol=1e-5, atol=1e-6, equal_nan=True), (f, c)
                    else:
                        assert np.array_equal(va, vb), (f, c)


def test_fused_ops_direct(tmp_path):
    """NvtpqOp-level check: cat probe + cont pipe against the host kernels."""
    from nvtabular_tpu.io import native_parquet as npq
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    if not npq.native_parquet_available():
        pytest.skip("native parquet unavailable")
    ds = _dataset(rows=4000, parts=1)
    wf = _workflow(ds)
    spec = extract_stream_spec(wf)
    assert spec is not None
    batch = list(ds.to_batches())[0]
    n = batch.num_rows
    gidx = np.random.default_rng(3).permutation(n).astype(np.int64)
    path = str(tmp_path / "direct.parquet")
    f = npq.NativeParquetFile(path, spec.schema())
    f.write_row_group(
        [[np.ascontiguousarray(np.asarray(batch[c.source].values))] for c in spec.columns],
        gidx,
        n,
        ops=spec.make_ops(),
    )
    f.close()
    got = pq.read_table(path)
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor

    expect = FusedHostExecutor().transform_batch(batch, wf.graph.output_node)
    for c in spec.columns:
        want = np.asarray(expect[c.name].values)[gidx]
        have = got.column(c.name).to_numpy()
        assert np.array_equal(
            want.astype(have.dtype, copy=False), have, equal_nan=True
        ), c.name


def test_fused_spec_reflects_refit(tmp_path):
    """The stream spec is extracted per to_parquet call: a refit must not
    leak the previous generation's tables into the fused write (the same
    staleness class as the jit-program and host-chain caches)."""
    rng = np.random.default_rng(5)
    ds1 = nvt.Dataset(
        [TableBatch.from_pydict({"c": rng.integers(0, 10, 2000).astype(np.int32)})]
    )
    # second dataset: disjoint id space -> completely different vocab
    ds2 = nvt.Dataset(
        [
            TableBatch.from_pydict(
                {"c": (rng.integers(0, 10, 2000) + 1000).astype(np.int32)}
            )
        ]
    )
    wf = nvt.Workflow(["c"] >> ops.Categorify())
    os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
    try:
        wf.fit(ds1)
        d1 = str(tmp_path / "gen1")
        wf.transform(ds1).to_parquet(d1, shuffle="per_worker", output_files=1)
        wf.clear_stats()
        wf.fit(ds2)
        d2 = str(tmp_path / "gen2")
        wf.transform(ds2).to_parquet(d2, shuffle="per_worker", output_files=1)
    finally:
        os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
    got2 = pq.read_table(os.path.join(d2, "part_0.parquet")).column("c").to_numpy()
    # every gen-2 value must be in-vocabulary (>= 3), not OOV=2 — a stale
    # gen-1 table would map the +1000 ids to OOV
    assert (got2 >= 3).all(), got2[:20]


def test_fused_single_table_offsets(tmp_path):
    """single_table=True shifts each column's codes by the shared-table
    offset; the fused probe must carry vocab.offset into the C++ op."""
    rng = np.random.default_rng(6)
    ds = nvt.Dataset(
        [
            TableBatch.from_pydict(
                {
                    "a": rng.integers(0, 20, 4000).astype(np.int32),
                    "b": rng.integers(0, 30, 4000).astype(np.int32),
                }
            )
        ]
    )
    wf = nvt.Workflow(["a", "b"] >> ops.Categorify(single_table=True))
    wf.fit(ds)
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    spec = extract_stream_spec(wf)
    if spec is None:
        pytest.skip("single_table spec unsupported on this build")
    os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
    try:
        d = str(tmp_path / "st")
        wf.transform(ds).to_parquet(d, shuffle="per_worker", output_files=1)
    finally:
        os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
    got = pq.read_table(os.path.join(d, "part_0.parquet"))
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor

    expect = FusedHostExecutor().transform_batch(
        list(ds.to_batches())[0], wf.graph.output_node
    )
    # codes land in DISJOINT ranges per column (the single_table contract)
    ga = got.column("a").to_numpy()
    gb = got.column("b").to_numpy()
    assert set(np.unique(ga)) == set(np.unique(np.asarray(expect["a"].values)))
    assert set(np.unique(gb)) == set(np.unique(np.asarray(expect["b"].values)))
    assert not (set(np.unique(ga)) & set(np.unique(gb)))


def test_keep_pages_overwrite(tmp_path):
    """NVT_PQ_KEEP_PAGES=1 overwrites parquet files in place (r+b, truncate
    at close): a SHORTER rewrite must leave no stale tail — the footer
    locator sits at EOF, so any leftover bytes corrupt the file."""
    from nvtabular_tpu.io import native_parquet as npq

    if not npq.native_parquet_available():
        pytest.skip("native parquet unavailable")
    rng = np.random.default_rng(9)
    path = str(tmp_path / "kp.parquet")
    os.environ["NVT_PQ_KEEP_PAGES"] = "1"
    try:
        for rows in (40_000, 12_000, 25_000):  # long, shorter, mid rewrite
            vals = rng.integers(0, 1000, rows).astype(np.int32)
            f = npq.NativeParquetFile(path, [("v", np.dtype(np.int32))])
            f.write_row_group([[vals]], None, rows)
            f.close()
            got = pq.read_table(path).column("v").to_numpy()
            assert np.array_equal(got, vals), rows
    finally:
        os.environ.pop("NVT_PQ_KEEP_PAGES", None)


def test_fused_unshuffled_write(tmp_path):
    """shuffle=None to_parquet also rides the fused path: raw batches
    round-robin to the file workers, transformed inside the encode; output
    must equal the two-phase host stream file for file, row for row."""
    ds = _dataset()
    wf = _workflow(ds)
    td = wf.transform(ds)
    d1, d2 = str(tmp_path / "fused"), str(tmp_path / "host")
    os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
    try:
        td.to_parquet(d1, output_files=2)
        from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
        from nvtabular_tpu.io.writer import write_dataset

        host = FusedHostExecutor()
        node = wf.graph.output_node

        class _S:
            def to_batches(self, prefetch=1, **kw):
                for b in ds.to_batches():
                    yield host.transform_batch(b, node)

        write_dataset(_S(), d2, out_files=2)
    finally:
        os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
    total = _assert_identical(d1, d2)
    assert total == ds.num_rows


def test_fused_joint_encoding(tmp_path):
    """encode_type='joint' shares one vocabulary across member columns;
    each column still encodes itself — the fused spec must resolve each
    member to the SHARED table and match the host path exactly."""
    rng = np.random.default_rng(8)
    ds = nvt.Dataset(
        [
            TableBatch.from_pydict(
                {
                    "src": rng.integers(0, 40, 3000).astype(np.int32),
                    "dst": rng.integers(10, 60, 3000).astype(np.int32),
                }
            )
        ]
    )
    wf = nvt.Workflow([["src", "dst"]] >> ops.Categorify(encode_type="joint"))
    wf.fit(ds)
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    spec = extract_stream_spec(wf)
    if spec is None:
        pytest.skip("joint spec unsupported on this build")
    os.environ["NVT_NATIVE_PARQUET_MIN_ROWS"] = "1"
    try:
        d = str(tmp_path / "joint")
        wf.transform(ds).to_parquet(d, shuffle="per_worker", output_files=1)
    finally:
        os.environ.pop("NVT_NATIVE_PARQUET_MIN_ROWS", None)
    got = pq.read_table(os.path.join(d, "part_0.parquet"))
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor

    expect = FusedHostExecutor().transform_batch(
        list(ds.to_batches())[0], wf.graph.output_node
    )
    # same multiset per column (one file, shuffled order)
    for c in ("src", "dst"):
        assert np.array_equal(
            np.sort(got.column(c).to_numpy()),
            np.sort(np.asarray(expect[c].values).astype(np.int32)),
        ), c
    # joint contract: the same raw id maps to the same code in BOTH columns
    raw = list(ds.to_batches())[0]
    m_src = dict(zip(np.asarray(raw["src"].values).tolist(), np.asarray(expect["src"].values).tolist()))
    m_dst = dict(zip(np.asarray(raw["dst"].values).tolist(), np.asarray(expect["dst"].values).tolist()))
    for k in set(m_src) & set(m_dst):
        assert m_src[k] == m_dst[k]
