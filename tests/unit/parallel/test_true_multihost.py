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
