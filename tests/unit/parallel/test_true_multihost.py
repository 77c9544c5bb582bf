"""REAL multi-process fit: two jax.distributed CPU processes each stream
their partition shard; fitted state must be identical on both hosts and
equal to a single-process full fit. This exercises the actual
process_allgather merge (parallel/multihost.py) across process boundaries —
the analog of the reference's 2-worker LocalCUDACluster tests
(tests/conftest.py:109-117)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops

WORKER = os.path.join(os.path.dirname(__file__), "..", "..", "multihost", "run_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.multichip
def test_two_process_fit_matches_single(tmp_path):
    rng = np.random.default_rng(0)
    n = 3000
    df = pd.DataFrame(
        {
            "c": rng.choice(rng.integers(0, 1 << 20, 150), n).astype(np.int64),
            "x": rng.normal(5.0, 2.0, n),
        }
    )
    data_dir = str(tmp_path / "data")
    nvt.Dataset(df, part_size=16 * 1024).to_parquet(data_dir, output_files=6)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": os.getcwd()}
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for rank in range(2):
        out_file = str(tmp_path / f"result_{rank}.json")
        outs.append(out_file)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, coordinator, str(rank), "2", data_dir, out_file],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        assert p.returncode == 0, err.decode()[-2000:]

    results = [json.load(open(f)) for f in outs]
    # both hosts finalized IDENTICAL state
    assert results[0]["vocab_values"] == results[1]["vocab_values"]
    assert results[0]["vocab_counts"] == results[1]["vocab_counts"]
    assert results[0]["mean"] == results[1]["mean"]

    # and it equals the single-process full fit
    cat_op = ops.Categorify(freq_threshold=2)
    norm_op = ops.Normalize()
    wf = nvt.Workflow((["c"] >> cat_op) + (["x"] >> norm_op))
    wf.fit(nvt.Dataset(data_dir))
    np.testing.assert_array_equal(
        np.asarray(cat_op.vocabs["c"].values_by_code), results[0]["vocab_values"]
    )
    np.testing.assert_allclose(norm_op.means["x"], results[0]["mean"], rtol=1e-12)
    np.testing.assert_allclose(norm_op.stds["x"], results[0]["std"], rtol=1e-12)
    # a 150-key vocab stays on the allgather path, not the exchange
    assert results[0]["reduce_paths"] == {"exchange": [], "str_exchange": [], "gather": ["c"]}


def _run_workers(tmp_path, data_dir, case, timeout=600, nprocs=2):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": os.getcwd()}
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    for rank in range(nprocs):
        out_file = str(tmp_path / f"result_{case}_{rank}.json")
        outs.append(out_file)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER, coordinator, str(rank),
                    str(nprocs), data_dir, out_file, case,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        assert p.returncode == 0, err.decode()[-2000:]
    return [json.load(open(f)) for f in outs]


@pytest.mark.multichip
def test_two_process_bigvocab_exchange_matches_single(tmp_path):
    """>=1M unique POWER-LAW keys: the fit must reduce through the
    all-to-all (key,count) exchange (parallel/sharded_vocab.py
    exchange_partial_counts) and match the single-process fit bit-for-bit
    — the analog of the reference's dask shuffled vocab groupby
    (nvtabular/ops/categorify.py:1344-1540). Zipf keys make the hash
    ownership skewed, exercising the exact-capacity sizing."""
    import hashlib

    rng = np.random.default_rng(7)
    n = 2_500_000
    # zipf over a huge id space, then offset so ids look realistic
    raw = rng.zipf(1.05, n).astype(np.int64)
    keys = (raw * np.int64(2654435761)) % np.int64(1 << 40)  # spread ids
    assert len(np.unique(keys)) >= 1_000_000
    df = pd.DataFrame({"c": keys})
    data_dir = str(tmp_path / "bigdata")
    nvt.Dataset(df, part_size=4 * 1024 * 1024).to_parquet(data_dir, output_files=8)

    results = _run_workers(tmp_path, data_dir, "bigvocab")
    assert results[0]["values_sha"] == results[1]["values_sha"]
    assert results[0]["counts_sha"] == results[1]["counts_sha"]
    assert results[0]["reduce_paths"] == {"exchange": ["c"], "str_exchange": [], "gather": []}

    cat_op = ops.Categorify()
    wf = nvt.Workflow(["c"] >> cat_op)
    wf.fit(nvt.Dataset(data_dir))
    vocab = cat_op.vocabs["c"]
    values = np.ascontiguousarray(np.asarray(vocab.values_by_code))
    counts = np.ascontiguousarray(np.asarray(vocab.counts, dtype=np.int64))
    assert str(values.dtype) == results[0]["values_dtype"]
    assert hashlib.sha256(values.tobytes()).hexdigest() == results[0]["values_sha"]
    assert hashlib.sha256(counts.tobytes()).hexdigest() == results[0]["counts_sha"]


@pytest.mark.multichip
def test_four_process_exchange_matches_single(tmp_path):
    """FOUR jax.distributed processes: the all-to-all (key,count) exchange
    must reduce a >65K-unique-key vocabulary identically on every rank and
    match the single-process fit — multi-rank ownership routing, not just
    the 2-way split."""
    import hashlib

    rng = np.random.default_rng(11)
    n = 600_000
    raw = rng.zipf(1.1, n).astype(np.int64)
    keys = (raw * np.int64(2654435761)) % np.int64(1 << 34)
    assert len(np.unique(keys)) > 66_000  # above NVT_VOCAB_EXCHANGE_MIN
    df = pd.DataFrame({"c": keys})
    data_dir = str(tmp_path / "data4")
    nvt.Dataset(df, part_size=2 * 1024 * 1024).to_parquet(data_dir, output_files=8)

    results = _run_workers(tmp_path, data_dir, "bigvocab", nprocs=4)
    for r in results[1:]:
        assert r["values_sha"] == results[0]["values_sha"]
        assert r["counts_sha"] == results[0]["counts_sha"]
    assert results[0]["reduce_paths"] == {"exchange": ["c"], "str_exchange": [], "gather": []}

    cat_op = ops.Categorify()
    wf = nvt.Workflow(["c"] >> cat_op)
    wf.fit(nvt.Dataset(data_dir))
    vocab = cat_op.vocabs["c"]
    values = np.ascontiguousarray(np.asarray(vocab.values_by_code))
    counts = np.ascontiguousarray(np.asarray(vocab.counts, dtype=np.int64))
    assert hashlib.sha256(values.tobytes()).hexdigest() == results[0]["values_sha"]
    assert hashlib.sha256(counts.tobytes()).hexdigest() == results[0]["counts_sha"]


@pytest.mark.multichip
def test_two_process_te_groupby_exchange_matches_single(tmp_path):
    """>=100K-group k-fold TE + multi-key JoinGroupby across two real
    processes: the keyed-stats state must reduce through the all-to-all
    row exchange (ops/groupby_stats.py reduce_accums_multihost — NOT the
    whole-accumulator pickle allgather) and match the single-process fit
    bit-for-bit. Targets are int-valued so float64 sums are order-exact.
    Analog of the reference reducing TE state through the same distributed
    groupby as vocabs (nvtabular/ops/target_encoding.py:199-214)."""
    import hashlib

    rng = np.random.default_rng(13)
    n = 1_200_000
    raw = rng.zipf(1.2, n).astype(np.int64)
    keys = (raw * np.int64(2654435761)) % np.int64(1 << 34)
    df = pd.DataFrame(
        {
            "c": keys,
            "d": rng.integers(0, 50, n).astype(np.int32),
            "y": rng.integers(0, 100, n).astype(np.float64),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    assert len(np.unique(keys)) > 100_000
    data_dir = str(tmp_path / "tedata")
    nvt.Dataset(df, part_size=8 * 1024 * 1024).to_parquet(data_dir, output_files=8)

    results = _run_workers(tmp_path, data_dir, "te_groupby")
    assert results[0] == results[1] or all(
        results[0][k] == results[1][k] for k in results[0] if k != "process"
    )
    # the heavy kfold TE table took the exchange; JoinGroupby too
    assert results[0]["te_reduce"]["exchange"] == ["c"]
    assert results[0]["jg_reduce"]["exchange"] == ["c_d"]

    # equals the single-process fit bit-for-bit
    te_op = ops.TargetEncoding("label", kfold=3, p_smooth=10)
    jg_op = ops.JoinGroupby(cont_cols=["y"], stats=["sum", "count", "mean"])
    wf = nvt.Workflow((["c"] >> te_op) + ([["c", "d"]] >> jg_op))
    wf.fit(nvt.Dataset(data_dir))

    def sha(arr):
        return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()

    keyed = te_op.fold_stats["c"]
    assert int(keyed.num_groups) == results[0]["te_groups"]
    assert sha(np.asarray(keyed.key_arrays["c"])) == results[0]["te_keys_sha"]
    assert sha(np.asarray(keyed.stats["label.sum"])) == results[0]["te_sum_sha"]
    assert sha(np.asarray(keyed.stats["label.count"])) == results[0]["te_cnt_sha"]
    assert te_op.means["label"] == results[0]["te_mean"]
    jk = jg_op.keyed["c_d"]
    assert int(jk.num_groups) == results[0]["jg_groups"]
    assert sha(np.asarray(jk.stats["y.sum"])) == results[0]["jg_sum_sha"]
    assert sha(np.asarray(jk.stats["y.mean"])) == results[0]["jg_mean_sha"]


@pytest.mark.multichip
def test_two_process_string_vocab_exchange_matches_single(tmp_path):
    """>=100K-unique STRING vocabulary across two real processes: must
    reduce through the byte-lane all-to-all
    (parallel/sharded_vocab.exchange_partial_string_counts) — O(vocab
    bytes) per host instead of the whole-accumulator pickle allgather —
    and match the single-process fit exactly. Analog of the reference's
    hash-partitioned shuffle of string uniques
    (nvtabular/ops/categorify.py:1036-1049)."""
    import hashlib

    rng = np.random.default_rng(23)
    n = 400_000
    # skewed head + uniform tail: >100K distinct ids with varied counts
    ids = np.concatenate(
        [
            (rng.zipf(1.3, n // 2) % 180_000).astype(np.int64),
            rng.integers(0, 250_000, n - n // 2),
        ]
    )
    strs = np.array([f"user_{i:07d}" for i in ids], dtype=object)
    df = pd.DataFrame({"s": strs})
    assert len(np.unique(ids)) > 100_000
    data_dir = str(tmp_path / "strdata")
    nvt.Dataset(df, part_size=4 * 1024 * 1024).to_parquet(data_dir, output_files=6)

    results = _run_workers(tmp_path, data_dir, "strvocab")
    assert all(
        results[0][k] == results[1][k] for k in results[0] if k != "process"
    )
    assert results[0]["reduce_paths"]["str_exchange"] == ["s"]
    assert results[0]["reduce_paths"]["gather"] == []

    cat_op = ops.Categorify()
    wf = nvt.Workflow(["s"] >> cat_op)
    wf.fit(nvt.Dataset(data_dir))
    vocab = cat_op.vocabs["s"]
    values = np.asarray(vocab.values_by_code)
    blob = "\x00".join(str(v) for v in values).encode()
    counts = np.ascontiguousarray(np.asarray(vocab.counts, dtype=np.int64))
    assert int(len(values)) == results[0]["n_vocab"]
    assert hashlib.sha256(blob).hexdigest() == results[0]["values_sha"]
    assert hashlib.sha256(counts.tobytes()).hexdigest() == results[0]["counts_sha"]
