"""Vocab memory hierarchy: cat_cache device/host/disk tiers and the
cardinality_memory_limit LRU (reference nvtabular/ops/categorify.py:
169-173 cat_cache semantics, 1627-1643 worker-cache fetch)."""

import logging

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops


def _fit(tmp_path, n=20_000, ncols=4, card=2000, **cat_kwargs):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {f"c{i}": rng.integers(0, card, n).astype(np.int64) for i in range(ncols)}
    )
    cat_op = ops.Categorify(out_path=str(tmp_path), **cat_kwargs)
    wf = nvt.Workflow([f"c{i}" for i in range(ncols)] >> cat_op)
    ds = nvt.Dataset(df, npartitions=2)
    wf.fit(ds)
    return wf, cat_op, df, ds


def test_disk_tier_releases_between_transforms(tmp_path):
    wf, cat_op, df, ds = _fit(tmp_path, cat_cache="disk")
    # after fit, disk-tier vocabs are parquet-backed and NOT host-resident
    assert all(v.artifact_path for v in cat_op.vocabs.values())
    assert all(not v.resident for v in cat_op.vocabs.values())

    out1 = wf.transform(ds).to_table().to_pandas()
    # released again after the transform
    assert all(not v.resident for v in cat_op.vocabs.values())
    assert cat_op.cache_stats["reloads"] > 0

    out2 = wf.transform(ds).to_table().to_pandas()
    pd.testing.assert_frame_equal(out1, out2)
    # codes bijective vs raw
    joined = pd.DataFrame({"raw": df["c0"], "code": out1["c0"]})
    assert (joined.groupby("raw")["code"].nunique() == 1).all()


def test_memory_limit_lru_spills(tmp_path):
    # each vocab ~2000 int64 values -> ~50+ KB resident with sorted arrays;
    # a 100 KB budget forces most of the 6 vocabs out under LRU
    wf, cat_op, df, ds = _fit(
        tmp_path, ncols=6, cardinality_memory_limit=100 * 1024
    )
    out = wf.transform(ds).to_table().to_pandas()
    assert cat_op.cache_stats["releases"] > 0
    resident_bytes = sum(
        v.host_nbytes() for v in cat_op.vocabs.values() if v.resident
    )
    # budget holds up to one protected (in-use) vocab of slack
    per_vocab = max(v.host_nbytes() for v in cat_op.vocabs.values() if v.resident)
    assert resident_bytes <= 100 * 1024 + per_vocab, resident_bytes

    # equivalence with an unconstrained fit+transform
    cat2 = ops.Categorify(out_path=str(tmp_path / "u"))
    wf2 = nvt.Workflow([f"c{i}" for i in range(6)] >> cat2)
    wf2.fit(ds)
    expected = wf2.transform(ds).to_table().to_pandas()
    pd.testing.assert_frame_equal(out, expected)


def test_host_tier_stays_resident(tmp_path):
    wf, cat_op, df, ds = _fit(tmp_path)  # default cat_cache="host"
    wf.transform(ds).to_table()
    assert all(v.resident for v in cat_op.vocabs.values())
    assert cat_op.cache_stats["releases"] == 0


def test_per_column_tiers(tmp_path):
    wf, cat_op, df, ds = _fit(
        tmp_path, cat_cache={"c0": "disk", "c1": "device", "c2": "host"}
    )
    wf.transform(ds).to_table()
    assert not cat_op.vocabs["c0"].resident
    assert cat_op.vocabs["c1"].resident
    assert cat_op.vocabs["c2"].resident


def test_reload_logged(tmp_path, caplog):
    wf, cat_op, df, ds = _fit(tmp_path, ncols=2, cat_cache="disk")
    with caplog.at_level(logging.INFO, logger="nvtabular_tpu"):
        wf.transform(ds).to_table()
    assert any("reloaded" in r.message for r in caplog.records)


def test_save_load_respects_tiers(tmp_path):
    wf, cat_op, df, ds = _fit(tmp_path, cat_cache="disk")
    out1 = wf.transform(ds).to_table().to_pandas()
    wf.save(str(tmp_path / "wf"))
    wf2 = nvt.Workflow.load(str(tmp_path / "wf"))
    out2 = wf2.transform(ds).to_table().to_pandas()
    pd.testing.assert_frame_equal(out1, out2)
