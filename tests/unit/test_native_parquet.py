"""Native parquet writer (cpp/nvt_parquet.cc): round-trip via pyarrow.

The native path is the shuffled-write hot path's encoder; correctness is
anchored by reading every output back with pyarrow (an independent parquet
implementation) and comparing bit-for-bit against numpy references.
Reference behavior mirrored: to_parquet output shuffling
(reference bench/examples/MultiGPUBench.md "Shuffling").
"""

import os
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest

from nvtabular_tpu.io.native_parquet import (
    NativeParquetFile,
    native_parquet_available,
    pack_gather_index,
)
from nvtabular_tpu.io.shuffle import check_shuffle_arg
from nvtabular_tpu.io.writer import write_dataset
from nvtabular_tpu.table import Column, TableBatch

pytestmark = pytest.mark.skipif(
    not native_parquet_available(), reason="native parquet writer unavailable"
)


def _cols(n, rng):
    return {
        "i32": rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32),
        "i64": rng.integers(-(2**62), 2**62, n, dtype=np.int64),
        "f32": rng.normal(size=n).astype(np.float32),
        "f64": rng.normal(size=n),
        "small": rng.integers(0, 3, n).astype(np.int32),
        "const": np.full(n, 7, dtype=np.int64),
    }


@pytest.mark.parametrize("n", [1, 2, 31, 32, 127, 128, 129, 130, 1000])
def test_roundtrip_sizes(n, tmp_path):
    """Delta-block boundary sizes (block=128, miniblock=32) decode exactly."""
    rng = np.random.default_rng(n)
    cols = _cols(n, rng)
    path = str(tmp_path / "t.parquet")
    w = NativeParquetFile(path, [(k, v.dtype) for k, v in cols.items()])
    w.write_row_group([[v] for v in cols.values()], None, n)
    w.close()
    tab = pq.read_table(path)
    for name, v in cols.items():
        got = tab[name].to_numpy()
        assert got.dtype == v.dtype
        np.testing.assert_array_equal(got, v, err_msg=name)


def test_roundtrip_gathered_window(tmp_path):
    """The fused shuffle gather (pieces + destination-order index) lands the
    same bytes as an explicit permute."""
    rng = np.random.default_rng(0)
    n = 50_000
    cols = _cols(n, rng)
    idx0 = rng.permutation(n)[: n // 2]
    idx1 = rng.permutation(n)[: n // 3]
    total = len(idx0) + len(idx1)
    perm = rng.permutation(total)
    gidx = pack_gather_index([idx0, idx1], perm)
    path = str(tmp_path / "t.parquet")
    w = NativeParquetFile(path, [(k, v.dtype) for k, v in cols.items()])
    w.write_row_group([[v, v] for v in cols.values()], gidx, total)
    w.close()
    tab = pq.read_table(path)
    for name, v in cols.items():
        exp = np.empty(total, dtype=v.dtype)
        exp[perm] = np.concatenate([v[idx0], v[idx1]])
        np.testing.assert_array_equal(tab[name].to_numpy(), exp, err_msg=name)


def test_multiple_row_groups_and_metadata(tmp_path):
    rng = np.random.default_rng(1)
    cols = _cols(1000, rng)
    path = str(tmp_path / "t.parquet")
    w = NativeParquetFile(path, [(k, v.dtype) for k, v in cols.items()])
    for _ in range(3):
        w.write_row_group([[v] for v in cols.values()], None, 1000)
    w.close()
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups == 3
    assert md.num_rows == 3000
    assert md.created_by.startswith("nvtabular_tpu")
    rg = md.row_group(0)
    assert "DELTA_BINARY_PACKED" in rg.column(0).encodings  # i32
    f32_idx = list(cols).index("f32")
    assert "BYTE_STREAM_SPLIT" in rg.column(f32_idx).encodings
    assert rg.column(f32_idx).compression == "ZSTD"
    tab = pq.read_table(path)
    np.testing.assert_array_equal(
        tab["i32"].to_numpy(), np.tile(cols["i32"], 3)
    )


def _batches(n_batches, n, rng, with_validity=False, all_true=True):
    out = []
    for _ in range(n_batches):
        tb = TableBatch()
        for k, v in _cols(n, rng).items():
            validity = None
            if with_validity:
                validity = (
                    np.ones(n, dtype=bool)
                    if all_true
                    else rng.random(n) > 0.1
                )
            tb[k] = Column(v, None, validity)
        out.append(tb)
    return out


class _Stream:
    def __init__(self, batches):
        self._b = batches

    def to_batches(self, **kw):
        return iter(self._b)

    def to_table(self):
        from nvtabular_tpu.table import concat_rows

        return concat_rows(self._b)


def _read_sorted(path):
    import pyarrow.dataset as pads

    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    tab = pads.dataset(files).to_table()
    return tab


@pytest.mark.parametrize("shuffle", [None, "per_worker", "per_partition"])
def test_write_dataset_native_engaged(tmp_path, shuffle):
    """write_dataset routes numeric batches through the native writer (the
    files carry its created_by stamp) and preserves the exact row multiset."""
    rng = np.random.default_rng(2)
    # per-file window pieces must clear NVT_NATIVE_PARQUET_MIN_ROWS even at
    # buffer_partitions=1 (per_partition): 60000/3 files = 20000 >= 16384
    batches = _batches(6, 60_000, rng)
    out = str(tmp_path / "out")
    write_dataset(
        _Stream(batches),
        out,
        shuffle=check_shuffle_arg(shuffle) if shuffle else None,
        out_files=3,
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 3
    md = pq.ParquetFile(os.path.join(out, files[0])).metadata
    assert md.created_by.startswith("nvtabular_tpu"), "native writer not engaged"
    tab = _read_sorted(out)
    assert tab.num_rows == 6 * 60_000
    exp = np.sort(np.concatenate([np.asarray(b["i64"].values) for b in batches]))
    np.testing.assert_array_equal(np.sort(tab["i64"].to_numpy()), exp)
    # shuffled output must not be in input order
    if shuffle:
        got = tab["i64"].to_numpy()
        assert not np.array_equal(
            got, np.concatenate([np.asarray(b["i64"].values) for b in batches])
        )


def test_write_dataset_all_true_validity_uses_native(tmp_path):
    rng = np.random.default_rng(3)
    batches = _batches(4, 30_000, rng, with_validity=True, all_true=True)
    out = str(tmp_path / "out")
    write_dataset(_Stream(batches), out, shuffle=check_shuffle_arg("per_worker"), out_files=2)
    f = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    assert pq.ParquetFile(os.path.join(out, f)).metadata.created_by.startswith(
        "nvtabular_tpu"
    )


def test_write_dataset_real_nulls_fall_back(tmp_path):
    """Real nulls can't be REQUIRED columns: arrow path takes over and the
    null positions survive."""
    rng = np.random.default_rng(4)
    batches = _batches(4, 30_000, rng, with_validity=True, all_true=False)
    out = str(tmp_path / "out")
    write_dataset(_Stream(batches), out, shuffle=check_shuffle_arg("per_worker"), out_files=2)
    f = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    assert not pq.ParquetFile(os.path.join(out, f)).metadata.created_by.startswith(
        "nvtabular_tpu"
    )
    tab = _read_sorted(out)
    exp_nulls = sum(
        (~np.asarray(b["i32"].validity)).sum() for b in batches
    )
    assert tab["i32"].null_count == exp_nulls


def test_opt_out_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NVT_NATIVE_PARQUET", "0")
    rng = np.random.default_rng(5)
    batches = _batches(2, 30_000, rng)
    out = str(tmp_path / "out")
    write_dataset(_Stream(batches), out, shuffle=None, out_files=1)
    f = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    assert not pq.ParquetFile(os.path.join(out, f)).metadata.created_by.startswith(
        "nvtabular_tpu"
    )


def test_small_first_window_stays_on_arrow(tmp_path):
    rng = np.random.default_rng(6)
    batches = _batches(2, 500, rng)  # below NVT_NATIVE_PARQUET_MIN_ROWS
    out = str(tmp_path / "out")
    write_dataset(_Stream(batches), out, shuffle=None, out_files=1)
    f = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    assert not pq.ParquetFile(os.path.join(out, f)).metadata.created_by.startswith(
        "nvtabular_tpu"
    )


def test_native_matches_arrow_bytes_semantics(tmp_path):
    """Same stream written native and arrow reads back to identical sorted
    contents (column-for-column)."""
    rng = np.random.default_rng(7)
    batches = _batches(3, 40_000, rng)
    out_n = str(tmp_path / "native")
    out_a = str(tmp_path / "arrow")
    write_dataset(_Stream(batches), out_n, shuffle=check_shuffle_arg("per_worker"), out_files=2)
    os.environ["NVT_NATIVE_PARQUET"] = "0"
    try:
        write_dataset(_Stream(batches), out_a, shuffle=check_shuffle_arg("per_worker"), out_files=2)
    finally:
        os.environ.pop("NVT_NATIVE_PARQUET")
    tn, ta = _read_sorted(out_n), _read_sorted(out_a)
    assert tn.num_rows == ta.num_rows
    for name in tn.column_names:
        a = np.sort(tn[name].to_numpy())
        b = np.sort(ta[name].to_numpy())
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_hash_split_twins_bit_identical():
    """The numpy hash-split twin (arrow fallback) must match the C++ split
    exactly: a window whose files straddle the native/arrow writers would
    otherwise drop or duplicate rows."""
    from nvtabular_tpu.io.native_parquet import build_window_index, hash_split

    n, nfiles, seed = 100_003, 5, 0x9D2C5680F1234567
    np_assign = hash_split(seed, n, nfiles)
    counts = np.bincount(np_assign, minlength=nfiles)
    seen = np.zeros(n, dtype=bool)
    for k in range(nfiles):
        gidx = build_window_index([n], [seed], nfiles, k, shuffle_seed=k + 1)
        rows = np.asarray(gidx) & ((1 << 48) - 1)
        # C++ selection == numpy selection, row for row
        np.testing.assert_array_equal(np.sort(rows), np.flatnonzero(np_assign == k))
        assert len(rows) == counts[k]
        assert not seen[rows].any()
        seen[rows] = True
    assert seen.all()


def test_seeded_stream_preserves_rows_across_native_and_arrow(tmp_path):
    """Streamed PER_WORKER shuffle through the seeded protocol: every input
    row lands exactly once, under both writers."""
    for native, sub in (("1", "n"), ("0", "a")):
        os.environ["NVT_NATIVE_PARQUET"] = native
        try:
            rng = np.random.default_rng(11)
            batches = _batches(5, 20_000, rng)
            out = str(tmp_path / sub)
            write_dataset(_Stream(batches), out, shuffle=check_shuffle_arg("per_worker"), out_files=3)
        finally:
            os.environ.pop("NVT_NATIVE_PARQUET")
        t = _read_sorted(out)
        assert t.num_rows == 5 * 20_000
        ref = np.sort(np.concatenate([np.asarray(b["i64"].values) for b in batches]))
        np.testing.assert_array_equal(np.sort(t["i64"].to_numpy()), ref)


@pytest.mark.parametrize("shuffle", [None, "per_worker", "per_partition", "full"])
def test_write_dataset_fused_transform_matches_two_phase(tmp_path, shuffle):
    """write_dataset(transform=) fuses a row-wise transform into the file
    workers; with the same seed it must produce exactly the rows the
    two-phase form (transform on the producer, then write) produces."""
    rng = np.random.default_rng(5)
    batches = _batches(4, 60_000, rng)

    def tf(tb):
        out = TableBatch()
        out["i32x"] = Column(np.asarray(tb["i32"].values) * 2 + 1)
        out["f32l"] = Column(np.log1p(np.abs(np.asarray(tb["f32"].values))))
        return out

    sh = check_shuffle_arg(shuffle) if shuffle else None
    fused_dir, two_dir = str(tmp_path / "fused"), str(tmp_path / "two")
    write_dataset(_Stream(batches), fused_dir, shuffle=sh, out_files=3,
                  transform=tf, seed=7)
    write_dataset(_Stream([tf(b) for b in batches]), two_dir, shuffle=sh,
                  out_files=3, seed=7)
    a, b = _read_sorted(fused_dir), _read_sorted(two_dir)
    assert a.num_rows == b.num_rows == 4 * 60_000
    for col in ("i32x", "f32l"):
        np.testing.assert_array_equal(
            np.sort(a[col].to_numpy()), np.sort(b[col].to_numpy())
        )
    # row pairing preserved (the transform moved with its row): join check
    ai = a.to_pandas().sort_values(["i32x", "f32l"]).reset_index(drop=True)
    bi = b.to_pandas().sort_values(["i32x", "f32l"]).reset_index(drop=True)
    assert ai.equals(bi)


def test_write_dataset_fused_transform_list_fallback(tmp_path):
    """Batches with validity fall back to the take/concat shard path and
    still transform-and-write the exact row multiset."""
    rng = np.random.default_rng(6)
    batches = _batches(3, 30_000, rng, with_validity=True, all_true=False)

    def tf(tb):
        out = TableBatch()
        v = np.asarray(tb["i64"].values).copy()
        validity = tb["i64"].validity
        if validity is not None:
            v[~np.asarray(validity)] = -1
        out["clean"] = Column(v)
        return out

    out_dir = str(tmp_path / "o")
    write_dataset(_Stream(batches), out_dir,
                  shuffle=check_shuffle_arg("per_worker"), out_files=2,
                  transform=tf)
    tab = _read_sorted(out_dir)
    assert tab.num_rows == 3 * 30_000
    exp = []
    for b in batches:
        v = np.asarray(b["i64"].values).copy()
        v[~np.asarray(b["i64"].validity)] = -1
        exp.append(v)
    np.testing.assert_array_equal(
        np.sort(tab["clean"].to_numpy()), np.sort(np.concatenate(exp))
    )
