"""Multi-controller smoke (2 processes x 4 virtual CPU devices) — runs
scripts/multiprocess_smoke.py end-to-end: jax.distributed coordinator,
global 8-device mesh, sharded temporal render, parity with the
single-process result. Slow tier (three jax runtimes + compiles)."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_parity():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "scripts", "multiprocess_smoke.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=3400)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "[mp] OK" in out.stderr
