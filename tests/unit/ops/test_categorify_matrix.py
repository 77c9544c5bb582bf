"""Categorify device-path matrix: joint/combo/multihot/single_table through
the fused jit executor, vocabs= round trips, batched-vs-solo encoder
equivalence — closing the coverage gap vs the reference's 24-way sweep
(reference tests/unit/ops/test_categorify.py:41-741)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor, LocalExecutor
from nvtabular_tpu.ops.categorify import NULL_INDEX, OOV_OFFSET


def _int_df(n=4000, seed=0, ncols=2, card=30):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {f"c{i}": rng.integers(0, card, n).astype(np.int64) for i in range(ncols)}
    )


def _assert_jit_matches_host(graph_fn, df, **dataset_kwargs):
    ds = nvt.Dataset(df, **(dataset_kwargs or {"part_size": 16 * 1024}))
    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(graph_fn(), executor=ex)
    wf.fit(ds)
    assert ex.graph_is_jittable(wf.graph.output_node, ds.to_table())
    jit_out = wf.transform(ds).to_table().to_pandas()

    wf_host = nvt.Workflow(graph_fn(), executor=LocalExecutor())
    wf_host.fit(ds)
    host_out = wf_host.transform(ds).to_table().to_pandas()
    for col in host_out.columns:
        vals_j, vals_h = jit_out[col], host_out[col]
        if vals_h.dtype == object:  # multihot rows
            assert [list(r) for r in vals_j] == [list(r) for r in vals_h], col
        else:
            np.testing.assert_array_equal(vals_j, vals_h, err_msg=col)
    return jit_out


def test_device_joint_encoding_matches_host():
    df = _int_df()
    _assert_jit_matches_host(
        lambda: [["c0", "c1"]] >> ops.Categorify(encode_type="joint"), df
    )


def test_device_combo_encoding_matches_host():
    df = _int_df()
    out = _assert_jit_matches_host(
        lambda: [["c0", "c1"]] >> ops.Categorify(encode_type="combo"), df
    )
    # every distinct (c0,c1) pair got a distinct code
    pairs = df.assign(code=out["c0_c1"]).groupby(["c0", "c1"])["code"].nunique()
    assert (pairs == 1).all()
    codes = df.assign(code=out["c0_c1"]).groupby("code")[["c0", "c1"]].nunique()
    assert (codes <= 1).all().all()


def test_device_combo_unseen_and_null():
    df = _int_df()
    cat = ops.Categorify(encode_type="combo")
    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow([["c0", "c1"]] >> cat, executor=ex)
    wf.fit(nvt.Dataset(df))
    probe = pd.DataFrame(
        {"c0": np.full(2048, 10**6, dtype=np.int64), "c1": np.zeros(2048, dtype=np.int64)}
    )
    out = wf.transform(nvt.Dataset(probe)).to_table().to_pandas()
    assert (out["c0_c1"] == OOV_OFFSET).all()


def test_device_multihot_matches_host():
    n = 3000
    rng = np.random.default_rng(2)
    from nvtabular_tpu.table import Column, TableBatch

    lengths = rng.integers(0, 4, n)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    values = rng.integers(0, 25, int(offsets[-1])).astype(np.int64)

    def make_batch():
        tb = TableBatch.from_pandas(
            pd.DataFrame({"solo": rng2.integers(0, 50, n).astype(np.int64)})
        )
        tb["mh"] = Column(values.copy(), offsets.copy(), None)
        return tb

    rng2 = np.random.default_rng(3)
    tb1 = make_batch()
    rng2 = np.random.default_rng(3)
    tb2 = make_batch()

    ex = JitExecutor(jit_min_rows=0)
    wf = nvt.Workflow(["solo", "mh"] >> ops.Categorify(), executor=ex)
    ds1 = nvt.Dataset(tb1)
    wf.fit(ds1)
    assert ex.graph_is_jittable(wf.graph.output_node, tb1)
    jit_out = wf.transform(ds1).to_table()

    wf_host = nvt.Workflow(["solo", "mh"] >> ops.Categorify(), executor=LocalExecutor())
    ds2 = nvt.Dataset(tb2)
    wf_host.fit(ds2)
    host_out = wf_host.transform(ds2).to_table()

    assert jit_out["mh"].is_list
    np.testing.assert_array_equal(
        np.asarray(jit_out["mh"].to_host().values), np.asarray(host_out["mh"].values)
    )
    np.testing.assert_array_equal(
        np.asarray(jit_out["mh"].to_host().offsets), np.asarray(host_out["mh"].offsets)
    )
    np.testing.assert_array_equal(
        np.asarray(jit_out["solo"].to_host().values),
        np.asarray(host_out["solo"].values),
    )


def test_device_single_table_fuzz():
    """single_table offsets on device vs host over randomized frames."""
    for seed in range(3):
        df = _int_df(2500, seed=seed, ncols=4, card=20 + seed * 17)
        _assert_jit_matches_host(
            lambda: ["c0", "c1", "c2", "c3"] >> ops.Categorify(single_table=True), df
        )


def test_vocabs_save_load_roundtrip(tmp_path):
    """Pre-supplied vocabs= survive a Workflow save/load round trip
    (reference test_categorify.py vocabs= cases)."""
    df = pd.DataFrame({"c": np.array([7, 3, 99, 3], dtype=np.int64)})
    cat = ops.Categorify(vocabs={"c": np.array([3, 7], dtype=np.int64)}, out_path=str(tmp_path))
    wf = nvt.Workflow(["c"] >> cat)
    wf.fit(nvt.Dataset(df))
    out1 = wf.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out1["c"].tolist() == [4, 3, OOV_OFFSET, 3]

    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    out2 = wf2.transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out2["c"].tolist() == out1["c"].tolist()


def test_batched_vs_solo_encoder_equivalence(monkeypatch):
    """The column-batched device encoder must equal per-column encodes."""
    df = _int_df(3000, ncols=6, card=40)
    cols = [f"c{i}" for i in range(6)]
    ds = nvt.Dataset(df)

    ex = JitExecutor(jit_min_rows=0)
    cat = ops.Categorify()
    wf = nvt.Workflow(cols >> cat, executor=ex)
    wf.fit(ds)
    batched_out = wf.transform(ds).to_table().to_pandas()

    ex2 = JitExecutor(jit_min_rows=0)
    cat2 = ops.Categorify()
    wf2 = nvt.Workflow(cols >> cat2, executor=ex2)
    wf2.fit(ds)
    monkeypatch.setattr(cat2, "_get_batched", lambda: {})
    solo_out = wf2.transform(ds).to_table().to_pandas()

    for c in cols:
        np.testing.assert_array_equal(batched_out[c], solo_out[c], err_msg=c)


def test_null_members_combo_device():
    n = 2048
    rng = np.random.default_rng(4)
    from nvtabular_tpu.table import Column, TableBatch

    c0 = rng.integers(0, 10, n).astype(np.int64)
    c1 = rng.integers(0, 10, n).astype(np.int64)
    validity = rng.random(n) > 0.1
    tb = TableBatch()
    tb["c0"] = Column(c0, None, validity)
    tb["c1"] = Column(c1, None, None)

    ex = JitExecutor(jit_min_rows=0)
    cat = ops.Categorify(encode_type="combo")
    wf = nvt.Workflow([["c0", "c1"]] >> cat, executor=ex)
    ds = nvt.Dataset(tb)
    wf.fit(ds)
    out = wf.transform(ds).to_table().to_pandas()
    got_nulls = out["c0_c1"].to_numpy() == NULL_INDEX
    np.testing.assert_array_equal(got_nulls, ~validity)


def test_tiny_and_cuckoo_bins_mixed_device_matches_host():
    """Mixed tiny + large vocabularies: tiny columns ride ONE compare bin
    (single-column compare lacks VPU batching — lookup_probe attribution),
    large ones the cuckoo bins; codes must equal the host path exactly."""
    rng = np.random.default_rng(11)
    n = 6000
    df = pd.DataFrame(
        {
            "t1": rng.integers(0, 5, n).astype(np.int64),
            "t2": rng.choice(np.arange(0, 1 << 30, 10_007), 64)[
                rng.integers(0, 64, n)
            ].astype(np.int64),
            "t3": rng.integers(0, 900, n).astype(np.int64),
            "big": rng.integers(0, 1 << 30, n).astype(np.int64),
        }
    )
    out = _assert_jit_matches_host(
        lambda: ["t1", "t2", "t3", "big"] >> ops.Categorify(),
        df,
    )
    assert out is not None

    # structural: the fitted op bins the three tiny vocabs together
    ds = nvt.Dataset(df, part_size=1 << 20)
    wf = nvt.Workflow(["t1", "t2", "t3", "big"] >> ops.Categorify())
    wf.fit(ds)
    cat = next(n_.op for n_ in wf.graph.nodes if isinstance(n_.op, ops.Categorify))
    batched = cat._get_batched()
    tiny_bins = [k for k in batched if k.startswith("tiny")]
    assert tiny_bins == ["tiny#0"], batched.keys()
    assert set(batched["tiny#0"][1]) == {"t1", "t2", "t3"}


def test_lone_large_tiny_vocab_demotes_to_cuckoo():
    """A single tiny-eligible column with >512 keys has no compare batch to
    ride: it must demote to a cuckoo bin (and still encode exactly)."""
    rng = np.random.default_rng(12)
    n = 5000
    df = pd.DataFrame({"c": rng.integers(0, 2000, n).astype(np.int64)})
    _assert_jit_matches_host(lambda: ["c"] >> ops.Categorify(), df)
    ds = nvt.Dataset(df, part_size=1 << 20)
    wf = nvt.Workflow(["c"] >> ops.Categorify())
    wf.fit(ds)
    cat = next(n_.op for n_ in wf.graph.nodes if isinstance(n_.op, ops.Categorify))
    batched = cat._get_batched()
    assert not any(k.startswith("tiny") for k in batched), batched.keys()
