"""Training-TRAJECTORY parity vs the torch reference (VERDICT r4 #2): both
arms train the same toy model on the same scene from the same init for 60
epochs crossing all three phases, reference RNG fully replayed. Runs the
two arms in SEPARATE subprocesses — torch's first Adam.step() permanently
changes XLA:CPU numerics in-process (measured; PERF.md round 5, module
docstring of scripts/trajectory_parity.py).

The full 600-epoch study (converged-geometry parity: ref 0.0341 vs ours
0.0366 mean radius error, cross-arm 0.015) is scripts/trajectory_parity.py;
this test pins the short-horizon claims at CI-able cost (~2 min).
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "..", "scripts",
                      "trajectory_parity.py")


def test_short_horizon_trajectory_parity(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--epochs", "60", "--views", "3",
         "--n_pix", "128", "--img_hw", "48", "--depth_hw", "24",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=1800)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    # first-10-epoch losses track the reference tightly
    assert summary["checks"]["early_parity"], summary
    # end-of-horizon loss windows agree
    assert summary["checks"]["window_parity"], summary
    # the two SDF fields' roots stay together (unconverged at 60 epochs;
    # the claim is cross-arm agreement, not absolute quality)
    assert summary["geometry"]["cross_mean_abs"] < 0.05, summary
