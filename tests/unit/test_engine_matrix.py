"""Cross-engine equivalence on one kitchen-sink workflow.

The reference runs its full DLRM-style workflow against every executor
configuration (reference tests/unit/test_dask_nvt.py:51-141, parametrized
over engine x cat_cache x on_host x shuffle x cpu). The analog here: ONE
realistic graph — joint Categorify (tiny + large vocabs), TargetEncoding,
JoinGroupby, a fused continuous chain, HashedCross, Bucketize, a multihot
list column, and a string column (which forces HYBRID islands on the
device path) — asserted bit-identical (float: allclose) across:

  * LocalExecutor          (eager numpy op-by-op)
  * FusedHostExecutor      (native cont-pipe + C++ hash encodes)
  * JitExecutor            (fused XLA program / hybrid islands)
  * hetero streaming       (both engines interleaved, order-preserving)
"""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor
from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
from nvtabular_tpu.table import TableBatch


N = 6000


def _data(seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            # tiny vocab (compare-select bin on device)
            "cat_tiny": rng.integers(0, 9, N).astype(np.int64),
            # large sparse vocab (cuckoo bin)
            "cat_big": rng.integers(0, 1 << 30, N).astype(np.int64),
            "user": rng.integers(0, 50, N).astype(np.int64),
            "item": rng.integers(0, 400, N).astype(np.int64),
            "x1": rng.normal(3.0, 2.0, N).astype(np.float32),
            "x2": rng.normal(-1.0, 4.0, N).astype(np.float32),
            "city": rng.choice(["sf", "nyc", "tokyo", "berlin", None], N),
            "label": rng.integers(0, 2, N).astype(np.int32),
        }
    )
    df.loc[rng.random(N) < 0.07, "x1"] = np.nan
    return df


def _multihot_part(df):
    rng = np.random.default_rng(42)
    lens = rng.integers(0, 4, len(df))
    values = rng.integers(0, 31, int(lens.sum())).astype(np.int64)
    offsets = np.zeros(len(df) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    batch = TableBatch.from_pandas(df)
    from nvtabular_tpu.table import Column

    batch["genres"] = Column(values, offsets)
    return batch


def _graph():
    cats = ["cat_tiny", "cat_big", "genres"] >> ops.Categorify()
    te = (
        ["user"]
        >> ops.TargetEncoding(target="label", kfold=3, p_smooth=20, seed=7)
    )
    jg = ["item"] >> ops.JoinGroupby(cont_cols=["x2"], stats=["mean", "count"])
    conts = (
        ["x1", "x2"]
        >> ops.FillMissing()
        >> ops.Clip(min_value=-5.0, max_value=8.0)
        >> ops.Normalize()
    )
    cross = ["user", "item"] >> ops.HashedCross(num_buckets=128)
    bucket = ["x2"] >> ops.Bucketize(boundaries={"x2": [-4.0, -1.0, 0.0, 2.0, 5.0]})
    strings = ["city"] >> ops.Categorify(name_sep="~")
    return cats + te + jg + conts + cross + bucket + strings + ["label"]


def _run(executor, parts, hetero=None):
    wf = nvt.Workflow(_graph(), executor=executor or LocalExecutor())
    ds = nvt.Dataset(parts)
    wf.fit(ds)
    out = wf.transform(ds)
    frames = []
    kw = {"hetero": hetero} if hetero else {}
    for b in out.to_batches(**kw):
        frames.append(b.to_host().to_pandas())
    got = pd.concat(frames, ignore_index=True)
    return got


def _assert_frames_equal(a, b, label):
    assert list(a.columns) == list(b.columns), label
    for col in a.columns:
        va, vb = a[col], b[col]
        if va.dtype == object and isinstance(va.iloc[0], (list, np.ndarray)):
            assert [list(r) for r in va] == [list(r) for r in vb], (label, col)
        elif np.issubdtype(va.dtype, np.floating):
            np.testing.assert_allclose(
                va.to_numpy(), vb.to_numpy(), rtol=2e-5, atol=2e-6,
                err_msg=f"{label}:{col}",
            )
        else:
            np.testing.assert_array_equal(
                va.to_numpy(), vb.to_numpy(), err_msg=f"{label}:{col}"
            )


@pytest.fixture(scope="module")
def parts():
    df = _data()
    return [
        _multihot_part(df.iloc[:N // 2].reset_index(drop=True)),
        _multihot_part(df.iloc[N // 2:].reset_index(drop=True)),
    ]


@pytest.fixture(scope="module")
def golden(parts):
    return _run(LocalExecutor(), parts)


def test_fused_host_engine_matches_local(parts, golden):
    got = _run(FusedHostExecutor(), parts)
    _assert_frames_equal(got, golden, "fused-host")


def test_jit_executor_matches_local(parts, golden):
    got = _run(JitExecutor(jit_min_rows=0), parts)
    _assert_frames_equal(got, golden, "jit")


def test_hetero_streaming_matches_local(parts, golden):
    got = _run(JitExecutor(jit_min_rows=0), parts, hetero=0.5)
    _assert_frames_equal(got, golden, "hetero")


def test_hetero_auto_calibrates_and_matches_local():
    """hetero='auto' calibrates the host/device split from the first batch
    on each engine, then ROUTES the remaining stream by the measured
    rates — order-preserving and value-identical to the host path."""
    df = _data(seed=3).drop(columns=["city"])  # numeric-only: both engines engage
    step = N // 8
    many_parts = [
        TableBatch.from_pandas(df.iloc[i : i + step].reset_index(drop=True))
        for i in range(0, N, step)
    ]

    def graph():
        return (
            (["cat_tiny", "cat_big"] >> ops.Categorify())
            + (["x1", "x2"] >> ops.FillMissing() >> ops.Normalize())
            + ["label"]
        )

    def run(executor, hetero=None):
        wf = nvt.Workflow(graph(), executor=executor)
        ds = nvt.Dataset(many_parts)
        wf.fit(ds)
        kw = {"hetero": hetero} if hetero else {}
        frames = [
            b.to_host().to_pandas() for b in wf.transform(ds).to_batches(**kw)
        ]
        return pd.concat(frames, ignore_index=True)

    golden = run(LocalExecutor())
    got = run(JitExecutor(jit_min_rows=0), hetero="auto")
    _assert_frames_equal(got, golden, "hetero-auto")


def test_eager_dataframe_serving_matches_batch(parts, golden):
    """The singledispatch DataFrame path (serving) must agree with the
    batch path row-for-row on rows it has seen."""
    wf = nvt.Workflow(_graph())
    ds = nvt.Dataset(parts)
    wf.fit(ds)
    df = parts[0].to_pandas().head(64)
    got = wf.transform(df)
    want = golden.head(64)
    for col in ("cat_tiny", "cat_big", "x1", "x2_bucket" if "x2_bucket" in golden else "label"):
        if col in got and col in want:
            va, vb = got[col].to_numpy(), want[col].to_numpy()
            if np.issubdtype(want[col].dtype, np.floating):
                np.testing.assert_allclose(va, vb, rtol=2e-5, atol=2e-6, err_msg=col)
            else:
                np.testing.assert_array_equal(va, vb, err_msg=col)


@pytest.mark.parametrize("tier", ["device", "host", "disk"])
def test_cat_cache_tiers_match(parts, golden, tier, tmp_path):
    """cat_cache tier must not change any output value (reference sweeps
    engine x cat_cache x on_host across its full workflow,
    test_dask_nvt.py:51-141)."""

    def graph():
        cats = ["cat_tiny", "cat_big", "genres"] >> ops.Categorify(
            cat_cache=tier, out_path=str(tmp_path)
        )
        te = ["user"] >> ops.TargetEncoding(target="label", kfold=3, p_smooth=20, seed=7)
        jg = ["item"] >> ops.JoinGroupby(cont_cols=["x2"], stats=["mean", "count"])
        conts = (
            ["x1", "x2"]
            >> ops.FillMissing()
            >> ops.Clip(min_value=-5.0, max_value=8.0)
            >> ops.Normalize()
        )
        cross = ["user", "item"] >> ops.HashedCross(num_buckets=128)
        bucket = ["x2"] >> ops.Bucketize(boundaries={"x2": [-4.0, -1.0, 0.0, 2.0, 5.0]})
        strings = ["city"] >> ops.Categorify(name_sep="~", out_path=str(tmp_path))
        return cats + te + jg + conts + cross + bucket + strings + ["label"]

    wf = nvt.Workflow(graph(), executor=LocalExecutor())
    ds = nvt.Dataset(parts)
    wf.fit(ds)
    frames = [b.to_host().to_pandas() for b in wf.transform(ds).to_batches()]
    got = pd.concat(frames, ignore_index=True)
    _assert_frames_equal(got, golden, f"cat_cache={tier}")
