import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.ops.categorify import NULL_INDEX, OOV_OFFSET, PAD_INDEX
from nvtabular_tpu.table import TableBatch


def _fit_transform(df, node):
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(df, part_size=8 * 1024)  # force multiple partitions
    return wf, wf.fit_transform(ds).to_table().to_pandas()


def test_freq_threshold(tmp_path):
    df = pd.DataFrame({"c": ["a"] * 10 + ["b"] * 5 + ["rare"] * 1})
    node = ["c"] >> ops.Categorify(freq_threshold=2, out_path=str(tmp_path))
    wf, out = _fit_transform(df, node)
    # 'rare' falls below threshold → OOV bucket (index 2 with 1 bucket)
    assert (out["c"][df["c"] == "rare"] == OOV_OFFSET).all()
    assert (out["c"][df["c"] == "a"] == 3).all()  # most frequent
    assert (out["c"][df["c"] == "b"] == 4).all()


def test_num_buckets_oov(tmp_path):
    train = pd.DataFrame({"c": ["a", "b", "a"]})
    node = ["c"] >> ops.Categorify(num_buckets=4, out_path=str(tmp_path))
    wf = nvt.Workflow(node)
    wf.fit(nvt.Dataset(train))
    test = pd.DataFrame({"c": ["a", "zzz", "qqq", None]})
    out = wf.transform(nvt.Dataset(test)).to_table().to_pandas()
    assert out["c"][0] == OOV_OFFSET + 4  # vocab starts after 4 OOV buckets
    assert OOV_OFFSET <= out["c"][1] < OOV_OFFSET + 4
    assert OOV_OFFSET <= out["c"][2] < OOV_OFFSET + 4
    assert out["c"][3] == NULL_INDEX


def test_max_size(tmp_path):
    df = pd.DataFrame({"c": ["a"] * 5 + ["b"] * 4 + ["c"] * 3 + ["d"] * 2 + ["e"]})
    # max_size=5 → pad+null+1 OOV leaves room for top-2 values
    node = ["c"] >> ops.Categorify(max_size=5, out_path=str(tmp_path))
    wf, out = _fit_transform(df, node)
    assert out["c"].max() == 4  # codes 3,4 for 'a','b'
    assert (out["c"][df["c"] == "a"] == 3).all()
    assert (out["c"][df["c"].isin(["c", "d", "e"])] == OOV_OFFSET).all()
    cs = wf.output_schema["c"]
    assert cs.properties["embedding_sizes"]["cardinality"] == 5


def test_joint_encoding(tmp_path):
    df = pd.DataFrame(
        {"u1": ["x", "y", "z"], "u2": ["y", "y", "w"]}
    )
    node = [["u1", "u2"]] >> ops.Categorify(encode_type="joint", out_path=str(tmp_path))
    wf, out = _fit_transform(df, node)
    # joint: same raw value gets the same code in both columns
    code_y_in_u1 = out["u1"][df["u1"] == "y"].iloc[0]
    code_y_in_u2 = out["u2"][df["u2"] == "y"].iloc[0]
    assert code_y_in_u1 == code_y_in_u2
    assert set(out.columns) == {"u1", "u2"}


def test_combo_encoding(tmp_path):
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["1", "2", "1"]})
    node = [["a", "b"]] >> ops.Categorify(encode_type="combo", out_path=str(tmp_path))
    wf, out = _fit_transform(df, node)
    assert list(out.columns) == ["a_b"]
    # 3 distinct (a,b) pairs → 3 distinct codes
    assert out["a_b"].nunique() == 3


def test_supplied_vocabs(tmp_path):
    df = pd.DataFrame({"c": ["b", "a", "zz"]})
    node = ["c"] >> ops.Categorify(vocabs={"c": np.array(["a", "b"], dtype=object)})
    wf = nvt.Workflow(node)
    wf.fit(nvt.Dataset(df))  # fit is a no-op for supplied vocab
    out = wf.transform(nvt.Dataset(df)).to_table().to_pandas()
    assert out["c"][1] == 3  # 'a' is first in supplied order
    assert out["c"][0] == 4
    assert out["c"][2] == OOV_OFFSET


def test_single_table(tmp_path):
    df = pd.DataFrame({"a": ["x", "y"], "b": ["p", "q"]})
    node = ["a", "b"] >> ops.Categorify(single_table=True, out_path=str(tmp_path))
    wf, out = _fit_transform(df, node)
    # contiguous global space: no code collisions across columns
    codes_a = set(out["a"])
    codes_b = set(out["b"])
    assert not codes_a & codes_b


def test_multihot_list_column(tmp_path):
    df = pd.DataFrame({"genres": [["g1", "g2"], ["g1"], [], ["g3", "g1"]]})
    node = ["genres"] >> ops.Categorify(out_path=str(tmp_path))
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(df)
    out_tb = wf.fit_transform(ds).to_table()
    col = out_tb["genres"]
    assert col.is_list
    out = out_tb.to_pandas()
    flat = [v for row in out["genres"] for v in row]
    assert all(c >= 3 for c in flat)
    # g1 appears 3× → lowest code
    lens = [len(r) for r in out["genres"]]
    assert lens == [2, 1, 0, 2]
    g1_code = out["genres"][1][0]
    assert g1_code == 3


def test_int_categorify_device_host_match(tmp_path):
    # numeric vocab → device searchsorted path must equal host path
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"i": rng.integers(0, 50, 500).astype(np.int64)})
    node = ["i"] >> ops.Categorify(out_path=str(tmp_path))
    wf = nvt.Workflow(node)
    ds = nvt.Dataset(df)
    wf.fit(ds)
    host_out = wf.transform(nvt.Dataset(df)).to_table().to_pandas()

    import jax.numpy as jnp

    vocab = wf.output_node.parents[0] if False else None
    op = [n.op for n in wf.graph.nodes if isinstance(n.op, ops.Categorify)][0]
    dev_codes = np.asarray(
        op.vocabs["i"].encode_device(jnp.asarray(df["i"].to_numpy()), None)
    )
    np.testing.assert_array_equal(host_out["i"].to_numpy(), dev_codes)


def test_dict_options_per_column(tmp_path):
    df = pd.DataFrame(
        {"a": ["x"] * 5 + ["y"], "b": ["p"] * 5 + ["q"]}
    )
    node = ["a", "b"] >> ops.Categorify(
        freq_threshold={"a": 2, "b": 0}, out_path=str(tmp_path)
    )
    wf, out = _fit_transform(df, node)
    assert (out["a"][df["a"] == "y"] == OOV_OFFSET).all()  # below a's threshold
    assert (out["b"][df["b"] == "q"] == 4).all()  # kept for b


def test_joint_group_mixed_int_widths():
    """Joint encoding over int32+int64 members shares one accumulator; wide
    keys must survive (no wrapping cast) — regression for the native-counter
    dtype promotion."""
    import pandas as pd

    big = np.int64(1 << 40)
    df = pd.DataFrame(
        {
            "a": np.array([1, 2, 1, 3], dtype=np.int32),
            "b": np.array([big, big, 5, 5], dtype=np.int64),
        }
    )
    op = ops.Categorify(encode_type="joint")
    wf = nvt.Workflow([("a", "b")] >> op)
    wf.fit(nvt.Dataset(df))
    vocab = op.vocabs["a_b"]
    assert big in np.asarray(vocab.values_by_code)
    assert np.asarray(vocab.values_by_code).min() >= 0  # nothing wrapped negative


def test_native_arrow_merge_mixed(monkeypatch):
    """fit_merge between a native-counter state and an arrow state (the
    multi-host scenario where one host lacks the toolchain)."""
    import nvtabular_tpu.ops.categorify as C

    vals = np.array([7, 7, 8], dtype=np.int32)
    native_acc = C._VocabAccum()
    native_acc.update(vals, None)
    assert native_acc.native

    monkeypatch.setattr(C, "_native_counter", lambda: False)
    arrow_acc = C._VocabAccum()
    arrow_acc.update(np.array([7, 9, 9, 9], dtype=np.int32), None)
    assert not arrow_acc.native

    merged = arrow_acc.merge(native_acc)
    values, counts, _ = merged.finalize()
    got = dict(zip(np.asarray(values).tolist(), np.asarray(counts).tolist()))
    assert got == {7: 3, 9: 3, 8: 1}


def test_search_sorted_warns_and_matches():
    """search_sorted=True is accepted for API parity but the gather path runs
    (measured faster, identical codes) — the kwarg must be observable via a
    one-time warning (reference honors it: ops/categorify.py:1779-1795)."""
    import warnings

    df = {"a": np.array([3, 1, 3, 9], dtype=np.int64)}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        op = ops.Categorify(search_sorted=True)
    assert any("search_sorted" in str(w.message) for w in rec)

    wf = nvt.Workflow(["a"] >> op)
    out = wf.fit_transform(nvt.Dataset(df)).to_table()
    ref = nvt.Workflow(["a"] >> ops.Categorify()).fit_transform(nvt.Dataset(df)).to_table()
    np.testing.assert_array_equal(
        np.asarray(out["a"].values), np.asarray(ref["a"].values)
    )


def test_multi_epoch_fit_matches_single_epoch():
    """Fitting a dataset whose partitions repeat N times (bench.py's
    full-pipeline fit) must produce the same vocabulary as one epoch —
    same keys, same order (counts scale by N, so the (-count, key) order
    is invariant). Exercises the partitioned-counter steady state (pure
    re-hits after epoch 1) and the bounded adaptive reservation."""
    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops as nops

    rng = np.random.default_rng(3)
    parts = [
        TableBatch.from_pydict(
            {
                "big": (rng.pareto(0.7, 60_000) * 3e6).astype(np.int32),
                "small": rng.integers(0, 50, 60_000).astype(np.int32),
            }
        )
        for _ in range(3)
    ]

    def fitted_vocabs(dataset):
        wf = nvt.Workflow(["big", "small"] >> nops.Categorify())
        wf.fit(dataset)
        cats = [n.op for n in wf.graph.nodes if isinstance(n.op, nops.Categorify)]
        return {k: v for c in cats for k, v in c.vocabs.items()}

    single = fitted_vocabs(nvt.Dataset(parts))
    multi = fitted_vocabs(nvt.Dataset(parts * 5))
    assert set(single) == set(multi)
    for k in single:
        np.testing.assert_array_equal(
            single[k].values_by_code, multi[k].values_by_code, err_msg=k
        )
