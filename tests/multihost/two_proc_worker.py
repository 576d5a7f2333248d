"""Worker for the real two-process jax.distributed test.

Usage: python two_proc_worker.py <coordinator_port> <process_id> <out.json>
       [fullsize]

Each of the two processes hosts 4 simulated CPU devices; together they
form one 8-device global mesh. Runs the tiny fused-dispatch scan
(dryrun_common.run_tiny_scan) and writes its view of the per-step losses.
"""
import json
import os
import sys


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dryrun_common import run_tiny_scan, run_fullsize_step
    from mvsdf_tpu.parallel import make_mesh

    mesh = make_mesh()  # all 8 global devices
    if len(sys.argv) > 4 and sys.argv[4] == "fullsize":
        loss, gnorm = run_fullsize_step(mesh)
        payload = {"process": pid, "n_devices": len(jax.devices()),
                   "loss": [loss], "grad_norm": gnorm}
    else:
        loss = run_tiny_scan(mesh)
        payload = {"process": pid, "n_devices": len(jax.devices()),
                   "loss": [float(x) for x in loss]}
    with open(out_path, "w") as f:
        json.dump(payload, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
