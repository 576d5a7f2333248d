"""Round-4 TPU study batch, ONE process (the tunnel's degraded mode taxes
every fresh process ~3-16 min on its first device->host fetch; batching
pays it once).

Stages, each printing its own JSON line:
  1. bench (canonical train-step throughput, bench.py main)
  2. supervised-compaction win regime (VERDICT r3 #4): mask-tight
     object-only wide-FoV scene (plane_r 0, focal_mult 0.65, intersect
     0.346 < 0.5), 600-epoch arms auto-cascade vs forced-dense
  3. seed-variance bars (VERDICT r3 #8): default-stack 600-epoch study at
     seeds 0/1/2 on the standard scene

Run solo:  timeout 14400 python scripts/round4_tpu_batch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def stage(label):
    print(f"\n===== {label} ({time.strftime('%H:%M:%S')}) =====",
          flush=True)


def main():
    only = sys.argv[1:] or ["bench", "masktight", "seeds"]

    if "bench" in only:
        stage("bench")
        import bench
        bench.main()

    import full_training_validation as ftv

    if "masktight" in only:
        stage("masktight arm A: auto supervised cascade")
        ftv.main(["--plane_r", "0", "--focal_mult", "0.65",
                  "--bf16_acts", "--supervised_compact", "auto",
                  "--out", "/tmp/mvsdf_masktight_auto"])
        stage("masktight arm B: supervised dense")
        ftv.main(["--plane_r", "0", "--focal_mult", "0.65",
                  "--bf16_acts", "--supervised_compact", "off",
                  "--out", "/tmp/mvsdf_masktight_dense"])

    if "seeds" in only:
        for seed in (0, 1, 2):
            stage(f"seed-variance: seed {seed} (default stack)")
            ftv.main(["--seed", str(seed), "--bf16_acts",
                      "--out", f"/tmp/mvsdf_seed{seed}"])


if __name__ == "__main__":
    main()
