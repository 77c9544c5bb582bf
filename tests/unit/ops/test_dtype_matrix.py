"""Input-dtype matrix through the hot ops, host vs device executor.

The x64-disabled jax runtime silently narrows int64/float64 device inputs,
and the reference sweeps engines x dtypes heavily
(reference tests/unit/ops/test_categorify.py:41-741, test_ops.py). This
matrix drives Categorify and the continuous chain with every practical
input dtype on BOTH executors and asserts identical codes/values."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ColumnSelector, Workflow, ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor

INT_DTYPES = [np.int8, np.int16, np.int32, np.int64, np.uint8, np.uint16, np.uint32]
FLOAT_DTYPES = [np.float32, np.float64]


def _run_both(graph, df):
    outs = {}
    for name, ex in (("host", LocalExecutor()), ("jit", JitExecutor())):
        wf = Workflow(graph)
        wf.executor = ex
        outs[name] = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    return outs["host"], outs["jit"]


@pytest.mark.parametrize("dtype", INT_DTYPES)
def test_categorify_int_dtypes(dtype):
    info = np.iinfo(dtype)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, min(int(info.max), 1000), 4000).astype(dtype)
    df = pd.DataFrame({"c": vals})
    host, jit = _run_both(ColumnSelector(["c"]) >> ops.Categorify(), df)
    assert (host["c"].to_numpy() == jit["c"].to_numpy()).all()
    # codes are a bijection of the distinct inputs (0/1/2 reserved)
    n_distinct = len(np.unique(vals))
    assert host["c"].nunique() == n_distinct
    assert host["c"].min() >= 3


def test_categorify_int64_beyond_int32_range_falls_back_to_host():
    # keys outside int32: the device gather cannot represent them — both
    # executors must still agree (jit path routes these columns host-side)
    df = pd.DataFrame({"c": np.array([1, 5_000_000_000, 7_000_000_000, 1], dtype=np.int64)})
    host, jit = _run_both(ColumnSelector(["c"]) >> ops.Categorify(), df)
    assert (host["c"].to_numpy() == jit["c"].to_numpy()).all()
    assert host["c"].nunique() == 3


@pytest.mark.parametrize("dtype", FLOAT_DTYPES)
def test_continuous_chain_dtypes(dtype):
    rng = np.random.default_rng(1)
    vals = rng.normal(2.0, 5.0, 4000).astype(dtype)
    vals[::17] = np.nan
    df = pd.DataFrame({"x": vals})
    graph = (
        ColumnSelector(["x"])
        >> ops.FillMissing()
        >> ops.Clip(min_value=0.0)
        >> ops.LogOp()
        >> ops.Normalize()
    )
    host, jit = _run_both(graph, df)
    np.testing.assert_allclose(
        host["x"].to_numpy(), jit["x"].to_numpy(), rtol=2e-5, atol=2e-6
    )
    assert not np.isnan(host["x"].to_numpy()).any()


@pytest.mark.parametrize("dtype", [np.int16, np.int32, np.int64])
def test_hashbucket_dtypes_agree(dtype):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"h": rng.integers(0, 500, 2000).astype(dtype)})
    host, jit = _run_both(ColumnSelector(["h"]) >> ops.HashBucket(64), df)
    got_h, got_j = host["h"].to_numpy(), jit["h"].to_numpy()
    assert (got_h == got_j).all()
    assert got_h.min() >= 0 and got_h.max() < 64


def test_mixed_frame_dtype_preservation():
    """Untouched passthrough columns keep their dtypes exactly."""
    df = pd.DataFrame(
        {
            "cat": np.array([5, 6, 5, 7], dtype=np.int32),
            "keep8": np.array([1, 2, 3, 4], dtype=np.int8),
            "keepf64": np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float64),
        }
    )
    graph = (ColumnSelector(["cat"]) >> ops.Categorify()) + ["keep8", "keepf64"]
    host, jit = _run_both(graph, df)
    for out in (host, jit):
        assert out["keep8"].dtype == np.int8
        assert out["keepf64"].dtype == np.float64
    np.testing.assert_array_equal(host["keepf64"], df["keepf64"])
