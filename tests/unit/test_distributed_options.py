"""Distributed-options sweep: one parametrized test crosses the Categorify
option space (freq_threshold x num_buckets x cat_cache x shuffle) through
all four executors — the analog of the reference's dask sweep
(reference tests/unit/test_dask_nvt.py:51-141, which crosses
engine x freq_limit x cat_cache x on_host x shuffle x cpu through a real
LocalCluster).

Every combination asserts the three non-eager engines match the eager
LocalExecutor bit-for-bit (float: allclose), and the shuffled write
round-trips the exact row multiset.
"""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor
from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
from nvtabular_tpu.table import TableBatch

N = 4000


@pytest.fixture(scope="module")
def parts():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "c_small": rng.integers(0, 12, N).astype(np.int64),
            "c_big": rng.choice(rng.integers(0, 1 << 28, 900), N).astype(np.int64),
            "x": rng.normal(1.0, 3.0, N).astype(np.float32),
        }
    )
    df.loc[rng.random(N) < 0.05, "x"] = np.nan
    half = N // 2
    return [
        TableBatch.from_pandas(df.iloc[:half].reset_index(drop=True)),
        TableBatch.from_pandas(df.iloc[half:].reset_index(drop=True)),
    ]


def _graph(freq_threshold, num_buckets, cat_cache, out_path):
    cats = ["c_small", "c_big"] >> ops.Categorify(
        freq_threshold=freq_threshold,
        num_buckets=num_buckets,
        cat_cache=cat_cache,
        out_path=out_path,
    )
    conts = ["x"] >> ops.FillMissing() >> ops.Normalize()
    return cats + conts


def _frames_equal(a, b, label):
    assert list(a.columns) == list(b.columns), label
    for col in a.columns:
        if np.issubdtype(a[col].dtype, np.floating):
            np.testing.assert_allclose(
                a[col].to_numpy(), b[col].to_numpy(), rtol=2e-5, atol=2e-6,
                err_msg=f"{label}:{col}",
            )
        else:
            np.testing.assert_array_equal(
                a[col].to_numpy(), b[col].to_numpy(), err_msg=f"{label}:{col}"
            )


@pytest.mark.parametrize("shuffle", [None, "per_worker"])
@pytest.mark.parametrize("cat_cache", ["host", "disk"])
@pytest.mark.parametrize("num_buckets", [1, 4])
@pytest.mark.parametrize("freq_threshold", [0, 3])
def test_options_sweep_across_executors(
    parts, freq_threshold, num_buckets, cat_cache, shuffle, tmp_path
):
    ds = nvt.Dataset(parts)

    def run(executor, hetero=None):
        wf = nvt.Workflow(
            _graph(freq_threshold, num_buckets, cat_cache, str(tmp_path / "cats")),
            executor=executor,
        )
        wf.fit(ds)
        kw = {"hetero": hetero} if hetero else {}
        frames = [
            b.to_host().to_pandas() for b in wf.transform(ds).to_batches(**kw)
        ]
        return pd.concat(frames, ignore_index=True), wf

    golden, golden_wf = run(LocalExecutor())

    # freq_threshold prunes rare keys to OOV; num_buckets spreads OOV codes
    oov_lo, oov_hi = 2, 2 + num_buckets
    if freq_threshold:
        assert ((golden["c_big"] >= oov_lo) & (golden["c_big"] < oov_hi)).any()

    for label, executor, hetero in (
        ("fused-host", FusedHostExecutor(), None),
        ("jit", JitExecutor(jit_min_rows=0), None),
        ("hetero", JitExecutor(jit_min_rows=0), 0.5),
    ):
        got, _ = run(executor, hetero)
        _frames_equal(got, golden, f"{label}/ft{freq_threshold}/nb{num_buckets}/{cat_cache}")

    if shuffle:
        out_dir = str(tmp_path / "out")
        golden_wf.transform(ds).to_parquet(out_dir, shuffle=shuffle, output_files=3)
        back = nvt.Dataset(out_dir).to_table().to_pandas()
        assert len(back) == N
        np.testing.assert_array_equal(
            np.sort(back["c_big"].to_numpy()), np.sort(golden["c_big"].to_numpy())
        )
        ok = ~np.isnan(golden["x"].to_numpy())
        np.testing.assert_allclose(
            np.sort(back["x"].to_numpy()[~np.isnan(back["x"].to_numpy())]),
            np.sort(golden["x"].to_numpy()[ok]),
            rtol=1e-6,
        )
