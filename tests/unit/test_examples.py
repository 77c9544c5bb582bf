"""Example scripts stay runnable — the analog of the reference executing
its notebooks in tests (tests/unit/examples/, bench/test_notebooks.py)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = [
    "examples/01_getting_started.py",
    "examples/02_advanced_ops.py",
    "examples/03_dlrm_training.py",
    "examples/04_scaling_hetero.py",
    "examples/05_multichip_pipeline.py",
    "examples/06_fused_shuffled_write.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = {
        **os.environ,
        "NVT_EXAMPLE_ROWS": "20000",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PYTHONPATH": os.getcwd(),
    }
    # __name__ is '__main__' under -c, so the example's guard fires itself
    bootstrap = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"exec(open({script!r}).read())"
    )
    res = subprocess.run(
        [sys.executable, "-c", bootstrap],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
