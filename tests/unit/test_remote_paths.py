"""Remote (fsspec) dataset paths — the analog of the reference's mocked-S3
tests (tests/unit/test_s3.py:36-74), using fsspec's memory:// filesystem."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops

fsspec = pytest.importorskip("fsspec")


@pytest.fixture
def memory_bucket():
    fs = fsspec.filesystem("memory")
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 7, 100).astype(np.int64),
            "x": rng.normal(0, 1, 100),
        }
    )
    for i, sl in enumerate([df.iloc[:50], df.iloc[50:]]):
        with fs.open(f"/bkt/part{i}.parquet", "wb") as f:
            pq.write_table(pa.Table.from_pandas(sl, preserve_index=False), f)
    yield df
    fs.rm("/bkt", recursive=True)


def test_remote_dir_listing_and_read(memory_bucket):
    ds = nvt.Dataset("memory://bkt")
    assert ds.num_rows == 100
    assert ds.npartitions == 2
    table = ds.to_table().to_pandas()
    np.testing.assert_array_equal(
        np.sort(table["a"].to_numpy()), np.sort(memory_bucket["a"].to_numpy())
    )


def test_remote_fit_transform(memory_bucket):
    ds = nvt.Dataset("memory://bkt")
    wf = nvt.Workflow((["a"] >> ops.Categorify()) + (["x"] >> ops.Normalize()))
    out = wf.fit_transform(ds).to_table().to_pandas()
    assert out["a"].min() >= 3
    np.testing.assert_allclose(out["x"].mean(), 0.0, atol=1e-6)


def test_remote_glob(memory_bucket):
    ds = nvt.Dataset("memory://bkt/part*.parquet")
    assert ds.num_rows == 100
