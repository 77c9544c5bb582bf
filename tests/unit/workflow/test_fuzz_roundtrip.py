"""Randomized workflow fuzz: build random DAGs from the op catalog, fit,
save/load, and require transform parity — broad-spectrum insurance over
the serializer + schema propagation + op state machinery."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


def _data(rng, n=800):
    df = pd.DataFrame(
        {
            "cat_a": rng.integers(0, 40, n).astype(np.int64),
            "cat_b": rng.choice(rng.integers(0, 1 << 29, 200), n).astype(np.int64),
            "x": rng.normal(3, 2, n),
            "y": rng.uniform(0, 50, n),
            "target": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    df.loc[rng.choice(n, 40, replace=False), "x"] = np.nan
    return df


def _random_graph(rng):
    """Compose 2-4 random branches over the fixed column pool."""
    branches = []
    cat_cols = ["cat_a", "cat_b"]
    cont_cols = ["x", "y"]

    cat_chain_ops = [
        lambda: ops.Categorify(freq_threshold=int(rng.integers(0, 3))),
        lambda: ops.HashBucket(int(rng.integers(8, 64))),
    ]
    cont_chain_ops = [
        lambda: ops.FillMissing(float(rng.uniform(-1, 1))),
        lambda: ops.Clip(min_value=0.0, max_value=float(rng.uniform(10, 60))),
        lambda: ops.LogOp(),
        lambda: ops.Normalize(),
        lambda: ops.NormalizeMinMax(),
        lambda: ops.FillMedian(),
        lambda: ops.Bucketize({c: [5.0, 20.0] for c in cont_cols}),
    ]

    node = nvt.ColumnSelector(cat_cols) >> cat_chain_ops[int(rng.integers(0, 2))]()
    if rng.random() < 0.5:
        node = node >> ops.TargetEncoding(["target"], kfold=int(rng.integers(1, 4)))
    branches.append(node)

    cont_node = nvt.ColumnSelector(cont_cols)
    for _ in range(int(rng.integers(1, 4))):
        cont_node = cont_node >> cont_chain_ops[int(rng.integers(0, len(cont_chain_ops)))]()
    branches.append(cont_node)

    if rng.random() < 0.4:
        branches.append(
            ["cat_a"] >> ops.JoinGroupby(cont_cols=["y"], stats=["mean", "count"])
        )
    if rng.random() < 0.3:
        branches.append([("cat_a", "cat_b")] >> ops.HashedCross(128))
    branches.append(["target"] >> ops.AddTags([nvt.Tags.TARGET]))

    graph = branches[0]
    for b in branches[1:]:
        graph = graph + b
    return graph


@pytest.mark.parametrize("seed", range(8))
def test_random_workflow_save_load_parity(seed, tmp_path):
    rng = np.random.default_rng(seed)
    df = _data(rng)
    ds = nvt.Dataset(df, part_size=16 * 1024)
    wf = nvt.Workflow(_random_graph(rng))
    out1 = wf.fit_transform(ds).to_table().to_pandas()

    path = str(tmp_path / f"wf_{seed}")
    wf.save(path)
    wf2 = nvt.Workflow.load(path)
    out2 = wf2.transform(ds).to_table().to_pandas()

    assert list(out1.columns) == list(out2.columns), "column order changed"
    for c in out1.columns:
        a, b = out1[c], out2[c]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, equal_nan=True, err_msg=f"{c} seed={seed}")
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{c} seed={seed}")


@pytest.mark.parametrize("seed", range(4))
def test_random_workflow_device_matches_host(seed):
    """Same random graphs through the JitExecutor (device/hybrid paths,
    jit_min_rows=0) must match the host executor."""
    from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor

    rng = np.random.default_rng(100 + seed)
    df = _data(rng)
    ds = nvt.Dataset(df, part_size=16 * 1024)

    rng_g = np.random.default_rng(100 + seed)
    wf_dev = nvt.Workflow(_random_graph(rng_g), executor=JitExecutor(jit_min_rows=0))
    out_dev = wf_dev.fit_transform(ds).to_table().to_pandas()

    rng_g = np.random.default_rng(100 + seed)
    wf_host = nvt.Workflow(_random_graph(rng_g), executor=LocalExecutor())
    wf_host.fit(ds)
    out_host = wf_host.transform(ds).to_table().to_pandas()

    assert list(out_dev.columns) == list(out_host.columns)
    for c in out_dev.columns:
        a, b = out_dev[c], out_host[c]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, equal_nan=True, err_msg=f"{c} seed={seed}")
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{c} seed={seed}")
