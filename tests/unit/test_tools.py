"""Tools: data generation (distribution K-S verification, mirroring
reference tests/unit/test_tools.py), inspector JSON loop, safe unpickler."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu.tools import (
    CatCol,
    ContCol,
    DatasetGen,
    DatasetInspector,
    LabelCol,
    PowerLawDistro,
    UniformDistro,
    cols_from_schema,
)


@pytest.mark.parametrize("distro", [UniformDistro(), PowerLawDistro(alpha=0.1)])
def test_cont_distribution_ks(distro):
    gen = DatasetGen(distro, seed=0)
    batch = gen.create_conts(20_000, [ContCol("x", np.float32, 1, 100)])
    (ks,) = gen.verify_df(batch)
    assert ks < 0.05  # reference asserts the same bound (test_tools.py)


def test_cat_powerlaw_skew_and_cardinality():
    gen = DatasetGen(PowerLawDistro(0.1), seed=0)
    batch = gen.create_cats(50_000, [CatCol("c", np.int64, cardinality=1000)])
    vals = np.asarray(batch["c"].values)
    assert vals.min() >= 0 and vals.max() < 1000
    counts = np.bincount(vals, minlength=1000)
    # power-law: the most frequent id dwarfs the median id
    assert counts.max() > 20 * max(np.median(counts), 1)


def test_multihot_and_string_cats():
    gen = DatasetGen(seed=1)
    batch = gen.create_cats(
        1000,
        [
            CatCol("mh", np.int64, cardinality=50, multi_min=1, multi_max=4),
            CatCol("s", np.dtype("O").type, cardinality=20, min_entry_size=2, max_entry_size=5),
        ],
        entries=True,
    )
    mh = batch["mh"]
    assert mh.is_list
    lengths = np.asarray(mh.row_lengths)
    assert lengths.min() >= 1 and lengths.max() <= 4
    s = np.asarray(batch["s"].values)
    assert len(np.unique(s)) <= 20
    assert all(isinstance(v, str) for v in s[:10])


def test_full_df_create_and_read_back(tmp_path):
    gen = DatasetGen(seed=2)
    cols = {
        "conts": [ContCol("x", np.float32, 0, 1)],
        "cats": [CatCol("c", np.int64, cardinality=100)],
        "labels": [LabelCol("label", np.int64, 2)],
    }
    paths = gen.full_df_create(5000, cols, output=str(tmp_path), files_per_output=2)
    assert len(paths) == 2
    ds = nvt.Dataset(paths)
    assert ds.num_rows == 5000
    table = ds.to_table()
    assert set(table.column_names) == {"x", "c", "label"}


def test_json_schema_round_trip(tmp_path):
    schema = {
        "num_rows": 1000,
        "conts": {"x": {"dtype": "float32", "min_val": 0, "max_val": 10}},
        "cats": {"c": {"dtype": "int64", "cardinality": 50}},
        "labels": {"label": {"dtype": "int64", "cardinality": 2}},
    }
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(schema))
    cols = cols_from_schema(str(p))
    assert cols["num_rows"] == 1000
    gen = DatasetGen(seed=3)
    batch = gen.create_df(100, cols)
    assert set(batch.column_names) == {"x", "c", "label"}


def test_inspector_feeds_datagen(tmp_path):
    """inspect → JSON → data_gen: the closed loop (reference
    dataset_inspector.py docstring)."""
    gen = DatasetGen(seed=4)
    cols = {
        "conts": [ContCol("x", np.float32, 0, 1)],
        "cats": [CatCol("c", np.int64, cardinality=30)],
        "labels": [LabelCol("label", np.int64, 2)],
    }
    batch = gen.create_df(2000, cols)
    ds = nvt.Dataset(batch)
    out_file = str(tmp_path / "stats.json")
    stats = DatasetInspector().inspect(
        ds,
        {"cats": ["c"], "conts": ["x"], "labels": ["label"]},
        output_file=out_file,
    )
    assert stats["num_rows"] == 2000
    assert 0 < stats["cats"]["c"]["cardinality"] <= 30
    assert 0.0 <= stats["conts"]["x"]["min"] <= stats["conts"]["x"]["max"] <= 1.0
    on_disk = json.loads(open(out_file).read())
    assert on_disk["cats"]["c"]["cardinality"] == stats["cats"]["c"]["cardinality"]


def test_inspector_cli(tmp_path):
    gen = DatasetGen(seed=5)
    cols = {
        "conts": [ContCol("x", np.float32, 0, 1)],
        "labels": [LabelCol("label", np.int64, 2)],
    }
    gen.full_df_create(500, cols, output=str(tmp_path / "data"))
    out_file = str(tmp_path / "stats.json")
    res = subprocess.run(
        [
            sys.executable, "-m", "nvtabular_tpu.tools.inspector_script",
            "-d", str(tmp_path / "data"), "--cont_names", "x",
            "--label_names", "label", "-o", out_file,
        ],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr
    assert json.loads(open(out_file).read())["num_rows"] == 500


def test_safe_unpickler():
    from nvtabular_tpu.tools.serialization import Unpickler, safe_loads

    data = pickle.dumps({"a": np.arange(3), "s": {1, 2}})
    out = safe_loads(data)
    np.testing.assert_array_equal(out["a"], np.arange(3))

    evil = pickle.dumps(os.system)  # pickled by reference → find_class gate
    with pytest.raises(pickle.UnpicklingError):
        safe_loads(evil)
