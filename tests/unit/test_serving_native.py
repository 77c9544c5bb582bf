"""Native (C++) serving kernels: parity with the python transform path,
cross-instance table cache, fill semantics — the analog of the reference's
C++ inference tests (tests/unit/test_ops.py inference paths)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops

native = pytest.importorskip("nvtabular_tpu.serving.native")
if not native.native_available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


@pytest.fixture
def fitted_cat(tmp_path):
    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "c_int": rng.choice(rng.integers(0, 1 << 40, 300), n).astype(np.int64),
            "c_str": rng.choice(np.array(["aa", "bb", "cc", "dd", None], dtype=object), n),
        }
    )
    cat_op = ops.Categorify(freq_threshold=2, out_path=str(tmp_path))
    wf = nvt.Workflow(["c_int", "c_str"] >> cat_op)
    wf.fit(nvt.Dataset(df))
    cat_op._write_vocab_artifacts()
    return df, cat_op, wf


def test_native_categorify_parity(fitted_cat):
    df, cat_op, wf = fitted_cat
    t = cat_op.inference_initialize(["c_int", "c_str"])
    assert t is not None
    out = t.transform(
        ["c_int", "c_str"],
        {"c_int": df["c_int"].to_numpy(), "c_str": df["c_str"].to_numpy()},
    )
    py = wf.transform(nvt.TableBatch.from_pandas(df)).to_pandas()
    np.testing.assert_array_equal(out["c_int"], py["c_int"].to_numpy())
    np.testing.assert_array_equal(out["c_str"], py["c_str"].to_numpy())
    assert out["c_int"].dtype == np.int32


def test_native_oov_and_null(fitted_cat):
    df, cat_op, wf = fitted_cat
    t = cat_op.inference_initialize(["c_int", "c_str"])
    out = t.transform(
        ["c_int", "c_str"],
        {
            "c_int": np.array([-12345678901234], dtype=np.int64),  # unseen
            "c_str": np.array([None], dtype=object),  # null
        },
    )
    assert out["c_int"][0] == 2  # OOV
    assert out["c_str"][0] == 1  # NULL


def test_cross_instance_cache(fitted_cat):
    df, cat_op, wf = fitted_cat
    lib = native._build_and_load()
    t1 = cat_op.inference_initialize(["c_int", "c_str"])
    before = lib.nvt_cache_size()
    t2 = cat_op.inference_initialize(["c_int", "c_str"])
    assert lib.nvt_cache_size() == before  # second instance reuses tables


def test_native_unsupported_configs():
    op = ops.Categorify(num_buckets=16)
    assert op.inference_initialize(["a"]) is None
    op = ops.Categorify(encode_type="combo")
    assert op.inference_initialize([("a", "b")]) is None


def test_native_fill():
    fill_op = ops.FillMissing(7.5)
    t = fill_op.inference_initialize(["x"])
    assert t is not None
    for dt in (np.float32, np.float64):
        x = np.array([1.0, np.nan, 3.0, np.nan], dtype=dt)
        out = t.transform(["x"], {"x": x})
        np.testing.assert_array_equal(out["x"], np.array([1.0, 7.5, 3.0, 7.5], dtype=dt))
        assert np.isnan(x[1])  # input not mutated
    ints = np.array([1, 2], dtype=np.int64)
    out = t.transform(["x"], {"x": ints})
    np.testing.assert_array_equal(out["x"], ints)


def test_native_fill_disabled_with_binary_cols():
    fill_op = ops.FillMissing(0.0, add_binary_cols=True)
    assert fill_op.inference_initialize(["x"]) is None


def test_gather_scatter_matches_numpy():
    """out[pos[i]] = src[idx[i]] — the fused pass the shuffled writer uses."""
    from nvtabular_tpu.serving.native import gather_scatter, native_available

    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for dtype in (np.int32, np.int64, np.float32, np.float64, np.bool_):
        src = (rng.integers(0, 100, 777)).astype(dtype)
        idx = rng.permutation(777)[:500].astype(np.int64)
        pos = rng.permutation(500).astype(np.int64)
        out = np.empty(500, dtype=dtype)
        assert gather_scatter(src, idx, out, pos)
        expect = np.empty(500, dtype=dtype)
        expect[pos] = src[idx]
        np.testing.assert_array_equal(out, expect)


def test_gather_scatter_rejects_unsupported():
    from nvtabular_tpu.serving.native import gather_scatter

    src = np.array(["a", "b"], dtype=object)
    out = np.empty(2, dtype=object)
    assert not gather_scatter(src, np.array([0, 1]), out, np.array([1, 0]))
    # dtype mismatch between src and out
    assert not gather_scatter(
        np.zeros(4, np.int32), np.arange(4), np.empty(4, np.int64), np.arange(4)
    )


def test_gather_multi_and_permute_plan_match_numpy():
    """Multi-source gather and the two-pass bucketed PermutePlan (the
    shuffled writer's flush kernels) against the numpy reference."""
    from nvtabular_tpu.serving.native import PermutePlan, gather_multi, native_available

    if not native_available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    npieces, rows = 3, 1000
    total = npieces * rows
    idxs = [rng.permutation(rows).astype(np.int64) for _ in range(npieces)]
    perm = rng.permutation(total).astype(np.int64)
    bounds = np.arange(npieces + 1) * rows
    gsrc = np.concatenate(
        [(np.int64(k) << np.int64(48)) | idxs[k] for k in range(npieces)]
    )
    g_inv = np.empty(total, dtype=np.int64)
    for k in range(npieces):
        g_inv[perm[bounds[k] : bounds[k + 1]]] = gsrc[bounds[k] : bounds[k + 1]]
    plan = PermutePlan.build(perm)
    assert plan is not None
    for dtype in (np.int32, np.int64, np.float32, np.float64, np.bool_):
        srcs = [(rng.integers(0, 100, rows)).astype(dtype) for _ in range(npieces)]
        expect = np.empty(total, dtype=dtype)
        for k in range(npieces):
            expect[perm[bounds[k] : bounds[k + 1]]] = srcs[k][idxs[k]]
        out = np.empty(total, dtype=dtype)
        assert gather_multi(srcs, g_inv, out)
        np.testing.assert_array_equal(out, expect)
        out2 = np.empty(total, dtype=dtype)
        assert plan.apply(srcs, gsrc, out2)
        np.testing.assert_array_equal(out2, expect)
    # unsupported dtype falls back
    obj = [np.array(["a"] * rows, dtype=object) for _ in range(npieces)]
    assert not gather_multi(obj, g_inv, np.empty(total, dtype=object))
    assert not plan.apply(obj, gsrc, np.empty(total, dtype=object))
    # empty window
    empty_plan = PermutePlan.build(np.empty(0, dtype=np.int64))
    assert empty_plan is not None
    assert empty_plan.apply([np.empty(0, np.int32)], np.empty(0, np.int64), np.empty(0, np.int32))


def test_counter_extract_sorted_and_reserve():
    """Reworked fit counter: count-field emptiness (INT64_MIN is an
    ordinary key), C++ (-count, key) sort, reserve pre-sizing."""
    from nvtabular_tpu.serving.native import NativeCounter

    rng = np.random.default_rng(3)
    vals = rng.integers(-(2**40), 2**40, 50000)
    vals[::11] = np.iinfo(np.int64).min  # old sentinel must count normally
    vals[::13] = 0  # key zero must count normally despite zero-filled slots
    c = NativeCounter()
    c.update(vals)
    k, cnt = c.extract()
    import collections

    ref = collections.Counter(vals.tolist())
    assert len(k) == len(ref)
    assert {int(x) for x in k} == set(ref)
    ks, cs = c.extract_sorted()
    order = np.lexsort((k, -cnt))
    np.testing.assert_array_equal(ks, k[order])
    np.testing.assert_array_equal(cs, cnt[order])

    # reserve: same result, no growth ladder
    r = NativeCounter()
    r.reserve(200_000)
    r.update(vals)
    rk, rc = r.extract_sorted()
    np.testing.assert_array_equal(rk, ks)
    np.testing.assert_array_equal(rc, cs)

    # int32 entry point == int64 path
    v32 = rng.integers(-(2**31), 2**31, 50000).astype(np.int32)
    a, b = NativeCounter(), NativeCounter()
    a.update(v32)
    b.update(v32.astype(np.int64))
    np.testing.assert_array_equal(a.extract_sorted()[0], b.extract_sorted()[0])

    # zero-count add must not fabricate an entry
    z = NativeCounter()
    z.add(np.array([5, 6], dtype=np.int64), np.array([0, 3], dtype=np.int64))
    zk, zc = z.extract()
    assert list(zk) == [6] and list(zc) == [3]


def test_native_encode_i32map_boundaries():
    """int32-keyed table variant: INT32_MIN key (the in-table sentinel),
    int64 probe values outside int32 range (must be OOV, never truncated
    into a false hit), and parity with the int64 path."""
    from nvtabular_tpu.serving.native import _ColumnTable

    keys = np.array(
        [np.iinfo(np.int32).min, -5, 0, 7, np.iinfo(np.int32).max - 1],
        dtype=np.int64,
    )
    codes = np.arange(3, 3 + len(keys), dtype=np.int32)
    t = _ColumnTable.from_arrays("i32map-test", keys, codes)

    probe = np.array(
        [
            np.iinfo(np.int32).min,          # sentinel key -> its code
            7,                               # hit
            12345,                           # miss -> OOV
            np.int64(2) ** 40,               # out of int32 range -> OOV
            -(np.int64(2) ** 40),            # out of range negative -> OOV
            # a value whose LOW 32 bits equal key 7 (truncation trap)
            np.int64(7) + (np.int64(1) << 32),
        ],
        dtype=np.int64,
    )
    out = t.encode(probe, None, null_index=1, oov_index=2, offset=0)
    np.testing.assert_array_equal(out, [3, 6, 2, 2, 2, 2])

    # int32 source width probes the same table
    out32 = t.encode(
        np.array([7, 12345, 0], dtype=np.int32), None, 1, 2, 0
    )
    np.testing.assert_array_equal(out32, [6, 2, 5])


def test_counter_dual_width_promotion():
    """int32 key streams count through the 8-byte-entry table and the
    counter promotes itself exactly: on a later int64 batch, on a
    merge-add, and (by contract) on count overflow — results always match
    a single 64-bit count."""
    import collections
    import pickle

    from nvtabular_tpu.serving.native import NativeCounter

    rng = np.random.default_rng(5)
    v32 = rng.integers(-(2**31), 2**31, 60000).astype(np.int32)
    v64 = rng.integers(2**40, 2**41, 8000)

    c = NativeCounter()
    c.update(v32)
    assert c.handle32 is not None and c.handle is None  # 32-bit mode
    c.update(v64)  # promotes
    assert c.handle is not None and c.handle32 is None

    ref = collections.Counter(v32.tolist()) + collections.Counter(v64.tolist())
    k, cnt = c.extract()
    assert len(k) == len(ref)
    got = dict(zip(k.tolist(), cnt.tolist()))
    for key in list(ref)[:300]:
        assert got[key] == ref[key]

    # extract_sorted straight from 32-bit mode matches the 64-bit order
    a = NativeCounter()
    a.update(v32)
    b = NativeCounter()
    b.update(v32.astype(np.int64))
    ka, ca = a.extract_sorted()
    kb, cb = b.extract_sorted()
    np.testing.assert_array_equal(ka, kb)
    np.testing.assert_array_equal(ca, cb)

    # merge-add promotes; pickling a 32-mode counter round-trips
    m = NativeCounter()
    m.update(v32[:100])
    m.add(np.array([2**45], dtype=np.int64), np.array([3], dtype=np.int64))
    assert 2**45 in set(m.extract()[0].tolist())
    p = pickle.loads(pickle.dumps(a))
    np.testing.assert_array_equal(p.extract_sorted()[0], ka)


def test_partitioned_counter_matches_flat():
    """High-cardinality int32 streams migrate to the radix-partitioned map
    (PCounter32); counts, vocabulary order, pickling, and promotion must
    all match the flat counter bit-for-bit."""
    from nvtabular_tpu.serving.native import NativeCounter

    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**31), 2**31, 1_500_000).astype(np.int32)
    vals[:100_000] = vals[0]  # one hot key so counts differ from 1

    part = NativeCounter()
    for i in range(0, len(vals), 200_000):
        part.update(vals[i : i + 200_000])
    assert part.phandle is not None, "expected migration past the threshold"

    flat = NativeCounter()
    flat.PARTITION_THRESHOLD = 0  # instance override: stay flat
    flat.update(vals)
    assert flat.phandle is None

    kp, cp = part.extract_sorted()
    kf, cf = flat.extract_sorted()
    np.testing.assert_array_equal(kp, kf)
    np.testing.assert_array_equal(cp, cf)

    # reserve() hint migrates early
    early = NativeCounter()
    early.update(np.arange(10, dtype=np.int32))
    early.reserve(1_000_000)
    assert early.phandle is not None
    early.update(vals[:200_000])

    # add() with in-range pairs stays partitioned; 64-bit key promotes
    early.add(np.array([3], dtype=np.int64), np.array([5], dtype=np.int64))
    assert early.phandle is not None
    early.add(np.array([2**40], dtype=np.int64), np.array([2], dtype=np.int64))
    assert early.handle is not None and early.phandle is None
    got = dict(zip(*map(lambda a: a.tolist(), early.extract())))
    expect3 = 1 + 5 + int((vals[:200_000] == 3).sum())
    assert got[3] == expect3 and got[2**40] == 2

    # pickle round-trip from partitioned mode
    import pickle

    p2 = pickle.loads(pickle.dumps(part))
    np.testing.assert_array_equal(p2.extract_sorted()[0], kp)


def test_moments_pass_matches_numpy_formulation():
    """The fused C++ moments kernel must match the numpy multi-pass
    formulation bit-for-bit in count/null semantics (NaN-as-null) and to
    float64 tolerance in the accumulations, across dtypes / validity /
    degenerate inputs."""
    import nvtabular_tpu.serving.native as nat
    from nvtabular_tpu.ops.moments import ColumnMoments
    from nvtabular_tpu.table import Column

    rng = np.random.default_rng(11)
    f = rng.normal(size=40001).astype(np.float32)
    f[rng.random(f.size) < 0.07] = np.nan
    cases = [
        Column(f),
        Column(f.copy(), None, rng.random(f.size) > 0.1),
        Column(rng.integers(-(10**12), 10**12, 20000)),
        Column(
            rng.integers(-100, 100, 20000).astype(np.int32),
            None,
            rng.random(20000) > 0.3,
        ),
        Column(rng.normal(size=5000)),
        Column(np.array([], dtype=np.float32)),
        Column(np.full(64, np.nan, dtype=np.float32)),
    ]
    for col in cases:
        fast = ColumnMoments()
        fast.update_batch(col)
        slow = ColumnMoments()
        orig = nat.moments_pass
        nat.moments_pass = lambda *a, **k: None  # force the numpy path
        try:
            slow.update_batch(col)
        finally:
            nat.moments_pass = orig
        assert fast.count == slow.count
        assert fast.null_count == slow.null_count
        assert fast.total_rows == slow.total_rows
        np.testing.assert_allclose(fast.sum, slow.sum, rtol=1e-9)
        np.testing.assert_allclose(fast.sumsq, slow.sumsq, rtol=1e-9)
        assert fast.min == slow.min or np.isclose(fast.min, slow.min)
        assert fast.max == slow.max or np.isclose(fast.max, slow.max)
