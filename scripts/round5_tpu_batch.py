"""Round-5 TPU study batch — sequences every measured claim of the round
so it can be reproduced in one command (each stage prints its own JSON /
window tables; ~2.5 h total on a tunneled v5e):

  bench      canonical steady-state train-step throughput (bench.py)
  scatter    direct-scatter layout vs round-4 zeros+where + supervised
             tier arms (scripts/scatter_into_ab.py)
  tiertrim   fallback/march tier trims + fused-march retry
             (scripts/tier_trim_ab.py)
  slice      consumed-columns-only rt_surf scatter + donation
             (scripts/slice_scatter_ab.py)
  masktight  single-bound-tier supervised cascade on the win-regime
             scene, auto vs top (full_training_validation)
  pin        fixed-seed quality gate (scripts/quality_pin.py)

Run solo:  timeout 14400 python scripts/round5_tpu_batch.py [stages...]
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
    only = sys.argv[1:] or ["bench", "scatter", "tiertrim", "slice",
                            "masktight", "pin"]

    if "bench" in only:
        stage("bench")
        import bench
        bench.main()

    if "scatter" in only:
        stage("scatter-into layout + supervised tier arms")
        import scatter_into_ab
        scatter_into_ab.main()

    if "tiertrim" in only:
        stage("tier trims + fused-march retry")
        import tier_trim_ab
        tier_trim_ab.main()

    if "slice" in only:
        stage("consumed-columns scatter + donation")
        import slice_scatter_ab
        slice_scatter_ab.main()

    if "masktight" in only:
        stage("masktight supervised cascade: auto vs single top tier")
        import full_training_validation as ftv
        ftv.main(["--plane_r", "0", "--focal_mult", "0.65", "--bf16_acts",
                  "--supervised_compact", "twotier", "--seed", "0",
                  "--out", "/tmp/mt_twotier"])
        ftv.main(["--plane_r", "0", "--focal_mult", "0.65", "--bf16_acts",
                  "--supervised_compact", "top", "--seed", "0",
                  "--out", "/tmp/mt_top"])

    if "pin" in only:
        stage("fixed-seed quality pin")
        import subprocess
        r = subprocess.run([sys.executable,
                            os.path.join(os.path.dirname(
                                os.path.abspath(__file__)),
                                "quality_pin.py")])
        if r.returncode != 0:
            raise SystemExit("quality pin FAILED")


if __name__ == "__main__":
    main()
