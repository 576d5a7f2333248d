"""REAL multi-controller test: two OS processes under jax.distributed,
4 simulated CPU devices each, one 8-device global mesh — the actual
multi-host code path (jax.distributed.initialize, global mesh spanning
non-addressable devices, replicated device_put of the scene cache, fused
scan dispatch over the sharded step). Asserts both controllers agree and
that the result matches the same program on a single-controller 8-device
mesh (SURVEY.md section 5.8; the single-controller equality to a single
device is covered by test_sharded_step.py)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_matches_single_controller(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "two_proc_worker.py"),
         str(port), str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    res = [json.load(open(o)) for o in outs]
    assert res[0]["n_devices"] == res[1]["n_devices"] == 8
    l0 = np.asarray(res[0]["loss"])
    l1 = np.asarray(res[1]["loss"])
    assert np.isfinite(l0).all()
    # both controllers observe the same replicated metrics
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)

    # same program on this (single-controller) 8-device CPU runtime
    from tests.multihost.dryrun_common import run_tiny_scan
    from mvsdf_tpu.parallel import make_mesh
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device simulated runtime")
    ref = run_tiny_scan(make_mesh(8))
    np.testing.assert_allclose(l0, ref, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_two_process_fullsize_matches_single_controller(tmp_path):
    """PRODUCTION shapes (8 x 4096 rays, 512x8 net) across 2 processes x 4
    devices — the DCN-analog boundary (non-addressable devices, replicated
    full-size scene upload) at the shapes of ref idr_train.py:253-315 /
    mvsdf_dtu.conf (VERDICT r3 #7). Asserts controller agreement and
    equality with the single-controller 8-device run of the same program.
    """
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    outs = [str(tmp_path / f"f{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "two_proc_worker.py"),
         str(port), str(i), outs[i], "fullsize"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    res = [json.load(open(o)) for o in outs]
    assert res[0]["n_devices"] == res[1]["n_devices"] == 8
    # both controllers observe identical replicated metrics
    assert res[0]["loss"] == res[1]["loss"]
    assert res[0]["grad_norm"] == res[1]["grad_norm"]
    assert np.isfinite(res[0]["loss"][0])

    from tests.multihost.dryrun_common import run_fullsize_step
    from mvsdf_tpu.parallel import make_mesh
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device simulated runtime")
    loss_1c, gnorm_1c = run_fullsize_step(make_mesh(8))
    # same global program, same devices-per-step partitioning; only the
    # controller layout differs -> metrics must match to f32 roundoff
    assert abs(res[0]["loss"][0] - loss_1c) <= 1e-5
    assert abs(res[0]["grad_norm"] - gnorm_1c) <= 5e-4 * abs(gnorm_1c)
