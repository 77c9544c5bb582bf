"""Dataset I/O: shuffled parquet writes, shuffle_by_keys, repartition, csv
engine — mirrors the reference's tests/unit/test_io.py / test_dask_nvt.py
write-path coverage (shuffle=PER_PARTITION/PER_WORKER, out_files_per_proc)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu.io.shuffle import Shuffle, check_shuffle_arg


def _df(n=2000):
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 10, n).astype(np.int64),
            "x": np.arange(n, dtype=np.float64),
        }
    )


@pytest.mark.parametrize("shuffle", [None, "per_partition", "per_worker", "full"])
def test_to_parquet_shuffles_preserve_rows(tmp_path, shuffle):
    df = _df()
    ds = nvt.Dataset(df, part_size=16 * 1024)
    out_dir = str(tmp_path / f"out_{shuffle}")
    ds.to_parquet(out_dir, shuffle=shuffle, output_files=3)
    back = nvt.Dataset(out_dir)
    assert back.num_rows == 2000
    vals = np.sort(back.to_table().to_pandas()["x"].to_numpy())
    np.testing.assert_array_equal(vals, np.arange(2000, dtype=np.float64))
    if shuffle is not None:
        # rows are no longer in write order
        raw = back.to_table().to_pandas()["x"].to_numpy()
        assert not np.array_equal(raw, np.arange(2000, dtype=np.float64))


def test_to_parquet_file_count(tmp_path):
    ds = nvt.Dataset(_df(), part_size=16 * 1024)
    # shuffled writes split every buffer across all files → exact count
    ds.to_parquet(str(tmp_path / "o"), shuffle="per_partition", output_files=4)
    import os

    files = [f for f in os.listdir(tmp_path / "o") if f.endswith(".parquet")]
    assert len(files) == 4
    # unshuffled round-robin touches at most the requested number
    ds.to_parquet(str(tmp_path / "o2"), output_files=4)
    files2 = [f for f in os.listdir(tmp_path / "o2") if f.endswith(".parquet")]
    assert 1 <= len(files2) <= 4


def test_check_shuffle_arg():
    assert check_shuffle_arg(True) is Shuffle.PER_WORKER
    assert check_shuffle_arg(None) is None
    assert check_shuffle_arg(False) is None
    assert check_shuffle_arg("per_partition") is Shuffle.PER_PARTITION
    with pytest.raises(ValueError):
        check_shuffle_arg(42)


def test_shuffle_by_keys_partitions_disjoint():
    df = _df()
    ds = nvt.Dataset(df, part_size=8 * 1024)
    shuffled = ds.shuffle_by_keys(["k"])
    seen = {}
    for i, batch in enumerate(shuffled.to_batches()):
        for k in np.unique(np.asarray(batch["k"].values)):
            assert k not in seen, f"key {k} in partitions {seen[k]} and {i}"
            seen[int(k)] = i
    assert shuffled.num_rows == 2000


def test_repartition():
    ds = nvt.Dataset(_df(), part_size=8 * 1024)
    r = ds.repartition(3)
    assert r.npartitions == 3
    assert r.num_rows == 2000


def test_csv_round_trip(tmp_path):
    df = _df(500)
    p = str(tmp_path / "data.csv")
    df.to_csv(p, index=False)
    ds = nvt.Dataset(p, engine="csv")
    out = ds.to_table().to_pandas()
    np.testing.assert_array_equal(out["k"], df["k"])
    np.testing.assert_allclose(out["x"], df["x"])


def test_to_iter_and_sample():
    ds = nvt.Dataset(_df(), part_size=8 * 1024)
    total = sum(b.num_rows for b in ds.to_iter())
    assert total == 2000
    sample = ds.sample_batch(100)
    assert sample.num_rows <= 2000
