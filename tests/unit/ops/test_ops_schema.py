"""Schema-contract conformance for EVERY operator — the analog of the
reference's centralized tests/unit/ops/test_ops_schema.py: for each op,
the schema the graph PROMISES (compute_output_schema) must match what
transform actually PRODUCES (names, dtypes, list-ness), after a real
fit/transform on a representative batch."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import dtypes as md
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import FitEngine, LocalExecutor


def _df(n=400, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "cat_a": rng.integers(0, 40, n).astype(np.int64),
            "cat_b": rng.integers(0, 20, n).astype(np.int64),
            "cont_x": rng.normal(2.0, 1.5, n),
            "cont_y": rng.uniform(0, 100, n),
            "target": rng.integers(0, 2, n).astype(np.int64),
            "ts": np.repeat(np.arange(n // 4), 4).astype(np.int64),
        }
    )
    df.loc[rng.choice(n, 30, replace=False), "cont_x"] = np.nan
    df["mh"] = [list(rng.integers(0, 15, rng.integers(0, 4))) for _ in range(n)]
    return df


def double_x(col):
    return np.asarray(col) * 2.0


# op factory → (selector columns, needs_fit)
OP_CASES = [
    (lambda: ops.Categorify(freq_threshold=2), ["cat_a", "cat_b"]),
    (lambda: ops.Categorify(), ["mh"]),
    (lambda: ops.TargetEncoding(["target"], kfold=3), ["cat_a"]),
    (lambda: ops.JoinGroupby(cont_cols=["cont_x"], stats=["mean", "std"]), ["cat_a"]),
    (lambda: ops.Normalize(), ["cont_x", "cont_y"]),
    (lambda: ops.NormalizeMinMax(), ["cont_x"]),
    (lambda: ops.FillMissing(0.0), ["cont_x"]),
    (lambda: ops.FillMissing(0.0, add_binary_cols=True), ["cont_x"]),
    (lambda: ops.FillMedian(), ["cont_x"]),
    (lambda: ops.DataStats(), ["cont_x", "cat_a"]),
    (lambda: ops.ReduceDtypeSize(), ["cat_a", "cont_x"]),
    (lambda: ops.ValueCount(), ["mh"]),
    (lambda: ops.Clip(min_value=0.0, max_value=10.0), ["cont_x"]),
    (lambda: ops.LogOp(), ["cont_y"]),
    (lambda: ops.Bucketize({"cont_y": [10.0, 50.0, 90.0]}), ["cont_y"]),
    (lambda: ops.HashBucket(16), ["cat_a"]),
    (lambda: ops.HashedCross(32), [("cat_a", "cat_b")]),
    (lambda: ops.LambdaOp(double_x, dtype=np.float64), ["cont_y"]),
    (lambda: ops.Rename(postfix="_r"), ["cont_x"]),
    (lambda: ops.Dropna(), ["cont_x", "cat_a"]),
    (lambda: ops.Groupby(groupby_cols=["cat_b"], aggs={"cont_y": ["mean"]}), ["cat_b", "cont_y"]),
    (lambda: ops.DifferenceLag("ts", shift=1), ["cont_y"]),
    (lambda: ops.ListSlice(0, 2), ["mh"]),
    (lambda: ops.ListSlice(0, 2, pad=True), ["mh"]),
    (lambda: ops.AddMetadata(tags=["custom"], properties={"p": 1}), ["cont_x"]),
    (lambda: ops.AddTags([nvt.Tags.TARGET]), ["target"]),
    (lambda: ops.AddProperties({"k": "v"}), ["cat_a"]),
    (lambda: ops.TagAsUserID(), ["cat_a"]),
    (lambda: ops.TagAsItemID(), ["cat_b"]),
    (lambda: ops.TagAsUserFeatures(), ["cont_x"]),
    (lambda: ops.TagAsItemFeatures(), ["cont_y"]),
]


@pytest.mark.parametrize(
    "op_factory,cols", OP_CASES, ids=[f"{i}_{c[0].__call__().label}" if False else str(i) for i, c in enumerate(OP_CASES)]
)
def test_output_schema_matches_transform(op_factory, cols):
    df = _df()
    ds = nvt.Dataset(df)
    op = op_factory()
    node = nvt.ColumnSelector(list(cols)) >> op
    wf = nvt.Workflow(node, executor=LocalExecutor())
    wf.fit(ds)
    out = wf.transform(ds).to_table()
    schema = wf.output_schema

    # 1. exact column set + order
    assert out.column_names == schema.column_names, (
        f"{op.label}: schema promises {schema.column_names}, got {out.column_names}"
    )
    for cs in schema:
        col = out[cs.name]
        # 2. list-ness
        assert col.is_list == bool(cs.is_list), f"{op.label}:{cs.name} is_list mismatch"
        # 3. dtype (unless op declares dynamic dtypes)
        if not op.dynamic_dtypes and cs.dtype.numpy_dtype is not None:
            actual = md.normalize(np.asarray(col.to_host().values).dtype)
            if actual.is_numeric and cs.dtype.is_numeric:
                assert actual.name == cs.dtype.name, (
                    f"{op.label}:{cs.name} dtype promised {cs.dtype.name} got {actual.name}"
                )


def test_every_exported_op_is_covered():
    """Completeness guard: every op class exported from nvtabular_tpu.ops
    appears in OP_CASES (or is an explicit exemption)."""
    covered = {type(f()).__name__ for f, _ in OP_CASES}
    exempt = {
        "Operator", "StatOperator", "ColumnSelector",  # bases
        "Filter",  # row-filter: changes row count, no 1:1 schema contract
        "Dropna",
        "JoinExternal",  # needs an external dataset fixture (tested in its own file)
        "ColumnSimilarity",  # two-column op (tested in its own file)
        "DropLowCardinality",  # selector-driven (tested in its own file)
    }
    exported = {
        name
        for name in ops.__all__
        if isinstance(getattr(ops, name), type)
    }
    missing = exported - covered - exempt
    assert not missing, f"ops without schema-contract coverage: {sorted(missing)}"
