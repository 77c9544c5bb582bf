"""Fused host continuous chains (dag/host_fuse.py + cpp nvt_cont_pipe).

Checks the single-pass native evaluation of FillMissing/Clip/LogOp/
Normalize chains against the node-by-node LocalExecutor — results must be
bitwise identical (the kernel copies the ops' stage expressions) — and
that every out-of-contract shape falls back without changing results.
"""

import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import LocalExecutor
from nvtabular_tpu.dag.host_fuse import FusedHostExecutor, extract_chain
from nvtabular_tpu.io.dataset import Dataset
from nvtabular_tpu.table import Column, TableBatch

native = pytest.importorskip("nvtabular_tpu.serving.native")
if not native.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)


def _batch(n=1000, seed=0, dtype=np.float32, nan_frac=0.1):
    rng = np.random.default_rng(seed)
    tb = TableBatch()
    for name in ("x", "y"):
        v = rng.normal(size=n).astype(dtype) * 4
        v[rng.random(n) < nan_frac] = np.nan
        tb[name] = Column(v)
    return tb


def _fit_graph(graph, batch):
    ds = Dataset(batch.to_pandas())
    wf = nvt.Workflow(graph)
    wf.fit(ds)
    return wf


def _assert_ulp_close(got, want, ulps=4):
    """Equal within `ulps` float32 ULPs (log1p implementations differ by
    ≤2 ULP between numpy and libm; every other stage is bitwise exact)."""
    got, want = np.asarray(got), np.asarray(want)
    assert got.dtype == want.dtype
    if got.dtype == np.float64:
        np.testing.assert_array_equal(got, want)
        return
    nan_g, nan_w = np.isnan(got), np.isnan(want)
    np.testing.assert_array_equal(nan_g, nan_w)
    gi = got.view(np.int32)[~nan_g]
    wi = want.view(np.int32)[~nan_w]
    assert np.abs(gi - wi).max(initial=0) <= ulps


class TestContPipeKernel:
    def test_stages_match_numpy(self):
        v = np.array([np.nan, -5.0, 0.5, 7.0, np.nan, 2.0], dtype=np.float32)
        got = native.cont_pipe(v, fill=1.0, lo=0.0, hi=4.0, log1p=True, sub=0.5, div=2.0)
        ref = np.log1p(np.clip(np.nan_to_num(v, nan=1.0), 0.0, 4.0))
        ref = (ref - np.float32(0.5)) / np.float32(2.0)
        _assert_ulp_close(got, ref)

    def test_no_log_stages_bitwise(self):
        rng = np.random.default_rng(1)
        v = rng.normal(size=10000).astype(np.float32) * 5
        v[rng.random(10000) < 0.2] = np.nan
        got = native.cont_pipe(v, fill=0.25, lo=-2.0, hi=2.0, sub=0.1, div=0.7)
        ref = (np.clip(np.nan_to_num(v, nan=0.25), -2.0, 2.0) - np.float32(0.1)) / np.float32(0.7)
        np.testing.assert_array_equal(got, ref)

    def test_nan_passthrough_no_fill(self):
        v = np.array([np.nan, 1.0], dtype=np.float32)
        got = native.cont_pipe(v, lo=0.0, hi=2.0)
        assert np.isnan(got[0]) and got[1] == 1.0

    def test_f64(self):
        v = np.array([np.nan, -1.0, 3.0], dtype=np.float64)
        got = native.cont_pipe(v, fill=0.5, lo=0.0)
        np.testing.assert_array_equal(got, [0.5, 0.0, 3.0])


class TestChainExtraction:
    def test_full_chain(self, tmp_path):
        graph = (
            ["x", "y"]
            >> ops.FillMissing(0.0)
            >> ops.Clip(min_value=-3.0, max_value=3.0)
            >> ops.LogOp()
            >> ops.Normalize()
        )
        wf = _fit_graph(graph, _batch())
        spec = extract_chain(wf.output_node)
        assert spec is not None
        assert set(spec.names) == {"x", "y"}
        assert spec.casts_f32
        assert spec.params["x"]["fill"] == 0.0
        assert spec.params["x"]["lo"] == -3.0 and spec.params["x"]["hi"] == 3.0
        assert spec.params["x"]["log1p"] is True
        assert "sub" in spec.params["x"] and "div" in spec.params["x"]

    def test_out_of_order_not_fused(self, tmp_path):
        graph = ["x"] >> ops.Normalize() >> ops.Clip(min_value=-1.0, max_value=1.0)
        wf = _fit_graph(graph, _batch())
        assert extract_chain(wf.output_node) is None

    def test_binary_cols_not_fused(self):
        graph = ["x"] >> ops.FillMissing(0.0, add_binary_cols=True) >> ops.Clip(min_value=0.0)
        wf = _fit_graph(graph, _batch())
        assert extract_chain(wf.output_node) is None

    def test_single_op_not_fused(self):
        graph = ["x"] >> ops.Clip(min_value=0.0)
        wf = _fit_graph(graph, _batch())
        assert extract_chain(wf.output_node) is None

    def test_shared_intermediate_not_fused(self):
        filled = ["x"] >> ops.FillMissing(0.0)
        a = filled >> ops.Clip(min_value=0.0)
        b = filled >> ops.Rename(postfix="_raw")
        wf = nvt.Workflow(a + b)
        ds = Dataset(_batch().to_pandas())
        wf.fit(ds)
        # `filled` feeds two consumers: the Clip tail must not swallow it
        clip_tail = [n for n in (wf.output_node.parents_with_dependencies) if "Clip" in n.op.label]
        assert clip_tail and extract_chain(clip_tail[0]) is None


class TestFusedExecution:
    @pytest.mark.parametrize("chain", ["full", "fill_clip", "clip_norm", "fill_log"])
    def test_bitwise_matches_local(self, chain):
        graphs = {
            "full": lambda c: c
            >> ops.FillMissing(0.0)
            >> ops.Clip(min_value=-3.0, max_value=3.0)
            >> ops.LogOp()
            >> ops.Normalize(),
            "fill_clip": lambda c: c >> ops.FillMissing(1.5) >> ops.Clip(min_value=0.0),
            "clip_norm": lambda c: c >> ops.Clip(max_value=2.0) >> ops.NormalizeMinMax(),
            "fill_log": lambda c: c >> ops.FillMedian() >> ops.LogOp(),
        }
        batch = _batch(n=4096, seed=3)
        wf = _fit_graph(graphs[chain](["x", "y"]), batch)
        fused = FusedHostExecutor()
        want = LocalExecutor().transform_batch(batch, wf.output_node)
        got = fused.transform_batch(batch, wf.output_node)
        # the chain must actually have been fused, not fallen back
        assert any(v is not None for v in fused._chain_cache.values())
        has_log = chain in ("full", "fill_log")
        for name in ("x", "y"):
            g, w = np.asarray(got[name].values), np.asarray(want[name].values)
            if has_log:
                # ≤2 ULP log1p difference; a later (v - mean) near zero can
                # amplify it in relative terms, so compare with an abs floor
                np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)
            else:
                np.testing.assert_array_equal(g, w)

    def test_f64_no_cast_chain(self):
        batch = _batch(dtype=np.float64)
        wf = _fit_graph(["x"] >> ops.FillMissing(0.0) >> ops.Clip(min_value=-1.0), batch)
        fused = FusedHostExecutor()
        got = fused.transform_batch(batch, wf.output_node)
        want = LocalExecutor().transform_batch(batch, wf.output_node)
        assert np.asarray(got["x"].values).dtype == np.float64
        np.testing.assert_array_equal(np.asarray(got["x"].values), np.asarray(want["x"].values))

    def test_f64_cast_chain_falls_back(self):
        batch = _batch(dtype=np.float64)
        wf = _fit_graph(["x"] >> ops.FillMissing(0.0) >> ops.LogOp(), batch)
        fused = FusedHostExecutor()
        got = fused.transform_batch(batch, wf.output_node)
        want = LocalExecutor().transform_batch(batch, wf.output_node)
        np.testing.assert_array_equal(np.asarray(got["x"].values), np.asarray(want["x"].values))

    def test_validity_mask_falls_back(self):
        batch = TableBatch()
        v = np.arange(10, dtype=np.float32)
        batch["x"] = Column(v, validity=np.array([True] * 9 + [False]))
        wf = _fit_graph(["x"] >> ops.FillMissing(7.0) >> ops.Clip(min_value=2.0), _batch())
        fused = FusedHostExecutor()
        got = fused.transform_batch(batch, wf.output_node)
        want = LocalExecutor().transform_batch(batch, wf.output_node)
        np.testing.assert_array_equal(np.asarray(got["x"].values), np.asarray(want["x"].values))
        assert np.asarray(got["x"].values)[9] == 7.0

    def test_mixed_graph_cats_and_conts(self, tmp_path):
        rng = np.random.default_rng(0)
        import pandas as pd

        df = pd.DataFrame(
            {
                "c": rng.integers(0, 50, size=2000),
                "x": rng.normal(size=2000).astype(np.float32),
            }
        )
        df.loc[rng.random(2000) < 0.1, "x"] = np.nan
        graph = (
            ["c"] >> ops.Categorify(out_path=str(tmp_path))
        ) + (
            ["x"] >> ops.FillMissing(0.0) >> ops.Clip(min_value=-2.0, max_value=2.0) >> ops.Normalize()
        )
        wf = nvt.Workflow(graph)
        ds = Dataset(df)
        wf.fit(ds)
        batch = ds.to_table()
        fused = FusedHostExecutor()
        got = fused.transform_batch(batch, wf.output_node)
        want = LocalExecutor().transform_batch(batch, wf.output_node)
        for name in ("c", "x"):
            np.testing.assert_array_equal(
                np.asarray(got[name].values), np.asarray(want[name].values)
            )


def test_refit_reextracts_chain_params():
    """A long-lived FusedHostExecutor must not serve a refitted chain with
    the OLD snapshotted scalars (means/stds bake into the chain spec)."""
    import pandas as pd

    from nvtabular_tpu.dag.executor import LocalExecutor

    rng = np.random.default_rng(5)
    df_a = pd.DataFrame({"x": rng.normal(0.0, 1.0, 50_000).astype(np.float32)})
    df_b = pd.DataFrame({"x": rng.normal(9.0, 3.0, 50_000).astype(np.float32)})

    wf = nvt.Workflow(["x"] >> ops.FillMissing() >> ops.Normalize())
    hx = FusedHostExecutor()

    wf.fit(nvt.Dataset(df_a))
    node = wf.graph.output_node
    from nvtabular_tpu.table import TableBatch

    out_a = hx.transform_batch(TableBatch.from_pandas(df_a), node)

    wf.fit(nvt.Dataset(df_b))  # refit; executor instance unchanged
    out_b = hx.transform_batch(TableBatch.from_pandas(df_b), node)
    got = np.asarray(out_b["x"].values)
    # B normalized with B's OWN stats is ~N(0,1); stale A stats would give
    # mean ~9 and std ~3
    assert abs(float(got.mean())) < 0.05, got.mean()
    assert abs(float(got.std()) - 1.0) < 0.05, got.std()
    assert out_a is not out_b
