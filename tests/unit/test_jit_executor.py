import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor, _next_bucket


def test_bucket_sizes():
    assert _next_bucket(1) == 1024
    assert _next_bucket(1024) == 1024
    assert _next_bucket(1025) == 2048
    assert _next_bucket(100_000) == 131072


def test_jit_fused_transform_matches_host():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "i": rng.integers(0, 100, 3000).astype(np.int64),
            "x": rng.normal(0, 1, 3000),
        }
    )
    cats = ["i"] >> ops.Categorify()
    conts = ["x"] >> ops.FillMissing(0.0) >> ops.Clip(min_value=-2, max_value=2) >> ops.Normalize()
    wf = nvt.Workflow(cats + conts, executor=JitExecutor(jit_min_rows=0))
    ds = nvt.Dataset(df, part_size=32 * 1024)
    wf.fit(ds)

    jit_out = wf.transform(ds).to_table().to_pandas()

    wf_host = nvt.Workflow(cats + conts, executor=LocalExecutor())
    host_out = wf_host.transform(ds).to_table().to_pandas()

    np.testing.assert_array_equal(jit_out["i"], host_out["i"])
    np.testing.assert_allclose(jit_out["x"], host_out["x"], rtol=1e-5, atol=1e-6)


def test_jit_batched_categorify_matches_host():
    """Many same-shape cat columns take the column-batched lookup path
    (one fused gather); results must match the host per-column path,
    including OOV (freq_threshold) and wide keys (cuckoo)."""
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            # compact keys → BatchedDirect
            "a": rng.integers(0, 50, n).astype(np.int64),
            "b": rng.integers(0, 500, n).astype(np.int64),
            # wide keys from a small pool → BatchedCuckoo (range too wide
            # for the dense direct map, but values repeat so they survive
            # the frequency threshold)
            "c": rng.choice(rng.integers(0, 1 << 30, 500), n).astype(np.int64),
            "d": rng.choice(rng.integers(0, 1 << 30, 500), n).astype(np.int64),
        }
    )
    cats = ["a", "b", "c", "d"] >> ops.Categorify(freq_threshold=2)
    ds = nvt.Dataset(df, part_size=64 * 1024)

    wf = nvt.Workflow(cats, executor=JitExecutor(jit_min_rows=0))
    wf.fit(ds)
    jit_out = wf.transform(ds).to_table().to_pandas()

    wf_host = nvt.Workflow(["a", "b", "c", "d"] >> ops.Categorify(freq_threshold=2), executor=LocalExecutor())
    wf_host.fit(ds)
    host_out = wf_host.transform(ds).to_table().to_pandas()

    for col in ["a", "b", "c", "d"]:
        np.testing.assert_array_equal(jit_out[col], host_out[col])


def test_jit_cache_reuse():
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"x": rng.normal(0, 1, 5000)})
    node = ["x"] >> ops.Normalize()
    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(node, executor=ex)
    ds = nvt.Dataset(df, part_size=8 * 1024)  # several same-bucket partitions
    wf.fit(ds)
    _ = wf.transform(ds).to_table()
    # partitions of equal bucket share one compiled program
    assert len(ex._jit_cache) <= 2


def test_jit_multihot_categorify_matches_host():
    """Ragged (list) columns survive the jit path: padding of values and
    offsets, device encode of flat values, offset re-wrap, unpadding."""
    rng = np.random.default_rng(6)
    n = 3000
    df = pd.DataFrame({"i": rng.integers(0, 50, n).astype(np.int64)})
    df["mh"] = [list(rng.integers(0, 12, rng.integers(0, 5)).astype(np.int64)) for _ in range(n)]
    ds = nvt.Dataset(df, part_size=64 * 1024)

    wf = nvt.Workflow(["i", "mh"] >> ops.Categorify(), executor=JitExecutor(jit_min_rows=0))
    jit_out = wf.fit_transform(ds).to_table()
    wf2 = nvt.Workflow(["i", "mh"] >> ops.Categorify(), executor=LocalExecutor())
    wf2.fit(ds)
    host_out = wf2.transform(ds).to_table()
    np.testing.assert_array_equal(
        np.asarray(jit_out["i"].values), np.asarray(host_out["i"].values)
    )
    assert jit_out["mh"].to_pylist() == host_out["mh"].to_pylist()


def test_jit_kfold_target_encoding_matches_host():
    """K-fold OOF TargetEncoding stays INSIDE the fused jit program: fold
    ids come from the traced global row offset, the OOF merge is a gather
    over [kfold, groups+1] in-fold matrices (reference target_encoding.py:
    301-384 does this join via cudf merge on the GPU cluster)."""
    rng = np.random.default_rng(5)
    n = 6000
    df = pd.DataFrame(
        {
            "c": rng.integers(0, 40, n).astype(np.int64),
            "label": rng.random(n),
        }
    )
    te = ops.TargetEncoding("label", kfold=3, p_smooth=10)
    graph = ["c"] >> te
    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(graph, executor=ex)
    ds = nvt.Dataset(df, part_size=16 * 1024)  # several partitions → offsets
    wf.fit(ds)

    # the graph must be jittable (TE no longer forces the host path)
    batch = ds.to_table()
    assert ex.graph_is_jittable(wf.graph.output_node, batch)

    jit_out = wf.transform(ds).to_table().to_pandas()
    host_out = nvt.Workflow(graph, executor=LocalExecutor()).transform(ds).to_table().to_pandas()
    np.testing.assert_allclose(
        jit_out["TE_c_label"], host_out["TE_c_label"], rtol=1e-4, atol=1e-5
    )


def test_jit_multikey_te_and_joingroupby_match_host():
    """Multi-int-key TE/JoinGroupby groups ride the collision-checked hash
    pair lookup and stay on the device path."""
    rng = np.random.default_rng(6)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 20, n).astype(np.int64),
            "b": rng.integers(0, 15, n).astype(np.int64),
            "y": rng.random(n),
        }
    )
    te = ops.TargetEncoding("y", kfold=2, p_smooth=5)
    jg = ops.JoinGroupby(cont_cols=["y"], stats=["count", "mean"])
    graph = ([["a", "b"]] >> te) + ([["a", "b"]] >> jg)
    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(graph, executor=ex)
    ds = nvt.Dataset(df, part_size=16 * 1024)
    wf.fit(ds)

    batch = ds.to_table()
    assert ex.graph_is_jittable(wf.graph.output_node, batch)

    jit_out = wf.transform(ds).to_table().to_pandas()
    host_out = nvt.Workflow(graph, executor=LocalExecutor()).transform(ds).to_table().to_pandas()
    for col in host_out.columns:
        np.testing.assert_allclose(
            np.asarray(jit_out[col], dtype=np.float64),
            np.asarray(host_out[col], dtype=np.float64),
            rtol=1e-4,
            atol=1e-5,
            err_msg=col,
        )


def test_jit_te_unseen_keys_get_prior_mean():
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {"c": rng.integers(0, 10, n).astype(np.int64), "y": rng.random(n)}
    )
    te = ops.TargetEncoding("y", kfold=1, p_smooth=0)
    wf = nvt.Workflow(["c"] >> te, executor=JitExecutor(jit_min_rows=0))
    ds = nvt.Dataset(df)
    wf.fit(ds)
    probe = pd.DataFrame({"c": np.full(2048, 999, dtype=np.int64), "y": np.zeros(2048)})
    out = wf.transform(nvt.Dataset(probe)).to_table().to_pandas()
    np.testing.assert_allclose(out["TE_c_y"], df["y"].mean(), rtol=1e-5)


def test_refit_replaces_device_tables():
    """Refit on different data must not serve stale HBM lookup tables:
    the device-state cache is identity-keyed per fitted arrays (ADVICE r1:
    a bare id() token could alias a recycled array). Codes after the
    second fit must reflect the NEW vocabulary on the device path."""
    import pandas as pd

    from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor

    rng = np.random.default_rng(21)

    def build(seed, offset):
        r = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "c": (r.integers(0, 4000, 30_000) * 7 + offset).astype(np.int64),
                "x": r.normal(0, 1, 30_000).astype(np.float32),
            }
        )

    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(
        (["c"] >> ops.Categorify()) + (["x"] >> ops.Normalize()), executor=ex
    )

    df_a = build(1, 0)
    wf.fit(nvt.Dataset(df_a, part_size=1 << 19))
    out_a = wf.transform(nvt.Dataset(df_a, part_size=1 << 19)).to_table().to_pandas()

    # refit the SAME workflow object on disjoint data through the SAME
    # executor (its _device_state_cache still holds fit-A tables and its
    # jit cache the fit-A programs) — plain fit() refits, like the
    # reference's DaskExecutor.fit recomputing every StatOperator
    df_b = build(2, 3)  # offset 3: no key overlap with A (A keys ≡ 0 mod 7)
    wf.fit(nvt.Dataset(df_b, part_size=1 << 19))
    out_b = wf.transform(nvt.Dataset(df_b, part_size=1 << 19)).to_table().to_pandas()

    # device results equal a fresh host-path fit on B (stale A tables would
    # turn most of B's codes into OOV=2)
    host_wf = nvt.Workflow(
        (["c"] >> ops.Categorify()) + (["x"] >> ops.Normalize()),
        executor=LocalExecutor(),
    )
    host_wf.fit(nvt.Dataset(df_b, part_size=1 << 19))
    want = host_wf.transform(nvt.Dataset(df_b, part_size=1 << 19)).to_table().to_pandas()
    np.testing.assert_array_equal(out_b["c"].to_numpy(), want["c"].to_numpy())
    np.testing.assert_allclose(
        out_b["x"].to_numpy(), want["x"].to_numpy(), rtol=2e-5, atol=2e-6
    )
    # and the two fits really did differ
    assert not np.array_equal(out_a["c"].to_numpy()[:100], out_b["c"].to_numpy()[:100])
