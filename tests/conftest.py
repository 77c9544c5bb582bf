"""Test fixtures.

Strategy mirrors the reference's (SURVEY.md §4): tiny synthetic datasets
forced into many partitions (out-of-core paths exercised on small data),
dual CPU-jax/TPU execution, multi-chip coverage via a virtual 8-device CPU
mesh, golden comparisons against pandas reference implementations.
"""

import os

# Virtual 8-device CPU mesh for sharding tests (must precede jax import).
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU-tunnel sitecustomize force-registers its platform via
# jax.config (overriding JAX_PLATFORMS); tests must stay hermetic on CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu.table import TableBatch


def make_df(num_rows=200, seed=42, with_nulls=True, with_lists=True, with_strings=True):
    """Synthetic timeseries-ish frame, analogous to the reference's
    `datasets` fixture (tests/conftest.py:120-198)."""
    rng = np.random.default_rng(seed)
    data = {
        "id": rng.integers(960, 1000, num_rows).astype(np.int64),
        "x": rng.normal(0.0, 2.0, num_rows),
        "y": rng.uniform(-1.0, 1.0, num_rows),
        "label": rng.integers(0, 2, num_rows).astype(np.int64),
        "timestamp": np.arange(num_rows, dtype=np.int64),
    }
    if with_strings:
        names = np.array(["alice", "bob", "carol", "dave", "eve", None], dtype=object)
        data["name-string"] = names[rng.integers(0, 6 if with_nulls else 5, num_rows)]
    df = pd.DataFrame(data)
    if with_nulls:
        null_idx = rng.choice(num_rows, num_rows // 10, replace=False)
        df.loc[null_idx, "x"] = np.nan
    if with_lists:
        df["genres"] = [
            list(rng.integers(0, 10, rng.integers(0, 5)).astype(np.int64))
            for _ in range(num_rows)
        ]
    return df


@pytest.fixture
def df():
    return make_df()


@pytest.fixture
def dataset(df, tmp_path):
    # small part_size → many partitions on tiny data
    return nvt.Dataset(df, part_size=16 * 1024)


@pytest.fixture
def paths(df, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = []
    for i, chunk in enumerate(np.array_split(np.arange(len(df)), 3)):
        p = str(tmp_path / f"data_{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df.iloc[chunk], preserve_index=False),
            p,
            row_group_size=30,
        )
        out.append(p)
    return out


@pytest.fixture
def parquet_dataset(paths):
    return nvt.Dataset(paths, part_size=16 * 1024)
