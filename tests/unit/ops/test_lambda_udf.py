"""LambdaOp/UDF behavior sweep, mirroring the reference's test_lambda.py
(reference tests/unit/ops/test_lambda.py:42-252): columnwise math, list
columns, batch-aware two-arg functions, schema/dtype propagation through
chains, and serialization rules (named function round-trips, lambda
rejected)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ColumnSelector, Workflow, ops
from nvtabular_tpu.table import TableBatch


def _df():
    return pd.DataFrame(
        {
            "x": np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32),
            "y": np.array([10, 20, 30, 40], dtype=np.int64),
            "z": np.array([0.5, 1.5, 2.5, 3.5], dtype=np.float64),
        }
    )


def _out(wf_graph, df=None):
    wf = Workflow(wf_graph)
    return wf.fit_transform(nvt.Dataset(df if df is not None else _df())).to_table().to_pandas()


def test_lambda_basic_math():
    out = _out(ColumnSelector(["x"]) >> ops.LambdaOp(lambda c: c.values * 2 + 1))
    np.testing.assert_allclose(out["x"], [3.0, 5.0, 7.0, 9.0])


def test_lambda_ufunc_direct():
    # np ufuncs are accepted directly (reference test_lambdaop engine=np)
    out = _out(ColumnSelector(["x", "z"]) >> ops.LambdaOp(np.sqrt))
    np.testing.assert_allclose(out["x"], np.sqrt([1, 2, 3, 4]), rtol=1e-6)
    np.testing.assert_allclose(out["z"], np.sqrt([0.5, 1.5, 2.5, 3.5]), rtol=1e-6)


def test_lambda_two_arg_reads_batch():
    # two-positional-arg functions receive (column, node_input_batch);
    # sibling columns must be part of the selection (reference LambdaOp's
    # `f(col, df)` sees the selected frame the same way)
    def x_plus_y(col, batch):
        return col.values + np.asarray(batch["y"].values, dtype=col.values.dtype)

    out = _out(ColumnSelector(["x", "y"]) >> ops.LambdaOp(x_plus_y))
    np.testing.assert_allclose(out["x"], [11.0, 22.0, 33.0, 44.0])
    np.testing.assert_allclose(out["y"], [20, 40, 60, 80])


def test_lambda_list_column_elementwise():
    from nvtabular_tpu.table import Column

    batch = TableBatch()
    batch["ragged"] = Column(
        np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
        np.array([0, 2, 3, 6], dtype=np.int64),
    )
    batch["n"] = Column(np.arange(3, dtype=np.int64))
    wf = Workflow(ColumnSelector(["ragged"]) >> ops.LambdaOp(lambda c: c.values * 10))
    out = wf.fit_transform(nvt.Dataset(batch)).to_table()
    col = out["ragged"]
    assert col.is_list
    np.testing.assert_array_equal(np.asarray(col.values), [10, 20, 30, 40, 50, 60])
    np.testing.assert_array_equal(np.asarray(col.offsets), [0, 2, 3, 6])


def test_lambda_dtype_override_propagates_schema():
    node = ColumnSelector(["y"]) >> ops.LambdaOp(lambda c: c.values * 0.5, dtype=np.float32)
    wf = Workflow(node)
    wf.fit(nvt.Dataset(_df()))
    schema = wf.output_schema
    assert schema["y"].dtype.numpy_dtype == np.dtype(np.float32)


def test_lambda_multi_op_chain_dtype():
    # dtype flows through a chain of UDFs (reference
    # test_lambdaop_dtype_multi_op_propagation)
    node = (
        ColumnSelector(["x"])
        >> ops.LambdaOp(lambda c: c.values.astype(np.float64), dtype=np.float64)
        >> ops.LambdaOp(lambda c: c.values + 1)
    )
    wf = Workflow(node)
    out = wf.fit_transform(nvt.Dataset(_df())).to_table().to_pandas()
    np.testing.assert_allclose(out["x"], [2.0, 3.0, 4.0, 5.0])


def test_lambda_tags_attach():
    node = ColumnSelector(["x"]) >> ops.LambdaOp(lambda c: c.values, tags=["custom_tag"])
    wf = Workflow(node)
    wf.fit(nvt.Dataset(_df()))
    assert "custom_tag" in {str(t) for t in wf.output_schema["x"].tags}


def test_lambda_rejected_at_save(tmp_path):
    wf = Workflow(ColumnSelector(["x"]) >> ops.LambdaOp(lambda c: c.values * 2))
    wf.fit(nvt.Dataset(_df()))
    with pytest.raises(Exception):
        wf.save(str(tmp_path / "wf"))


def _double(col):
    return col.values * 2


def test_named_function_saves(tmp_path):
    wf = Workflow(ColumnSelector(["x"]) >> ops.LambdaOp(_double))
    wf.fit(nvt.Dataset(_df()))
    wf.save(str(tmp_path / "wf"))
    wf2 = Workflow.load(str(tmp_path / "wf"))
    out = wf2.transform(nvt.Dataset(_df())).to_table().to_pandas()
    np.testing.assert_allclose(out["x"], [2.0, 4.0, 6.0, 8.0])
