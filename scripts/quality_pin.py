"""Fixed-seed trained-quality PIN (VERDICT r4 #7): a drift tripwire the
±1.5-PSNR seed bars cannot provide. Runs the 600-epoch capstone at seed 0
(scripts/full_training_validation.py, the exact bench/production stack) and
asserts final chamfer / held-out PSNR / indicator metrics against values
pinned from the round-5 run on this machine, at tight PER-SEED tolerance.

A change that silently costs quality at fixed seed (e.g. a numerics
regression inside the seed-variance band) trips this gate even though the
cross-seed bars would absorb it. Exits nonzero on drift.

Run solo (TPU, ~15 min):  timeout 3600 python scripts/quality_pin.py
Re-pin after an INTENTIONAL quality-affecting change with --print-pin.
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# Pinned from the round-5 seed-0 run (2026-08-20, v5e; PERF.md round 5).
# Measured same-day repeatability: a full rerun reproduced every pinned
# value EXACTLY (bit-reproducible at fixed seed on one machine/XLA
# build). The tolerances below absorb cross-day XLA/runtime variation
# while still catching a real regression (~1 PSNR / ~30% chamfer) that
# the ±1.5-PSNR cross-seed bars would absorb.
PIN = {
    "chamfer_overall": (0.00935, 0.003),
    "heldout_psnr": (22.82, 1.0),
    "indicator_acc": (0.642, 0.2),
    "indicator_sigmoid_on_med": (0.337, 0.15),
}
NONFINITE_MAX = 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--print-pin", action="store_true",
                    help="run and print the measured values in PIN format "
                         "instead of gating")
    ap.add_argument("--epochs", type=int, default=600)
    args = ap.parse_args()

    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "full_training_validation.py"),
         "--seed", "0", "--epochs", str(args.epochs)],
        capture_output=True, text=True, timeout=5400)
    sys.stderr.write(r.stdout[-3000:] + r.stderr[-2000:])
    if r.returncode != 0:
        raise SystemExit(f"validation run failed: {r.returncode}")
    summary = json.loads(
        [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1])

    if args.print_pin:
        print(json.dumps({k: summary[k] for k in PIN}))
        return

    failures = []
    for key, (pinned, tol) in PIN.items():
        got = summary[key]
        if abs(got - pinned) > tol:
            failures.append(f"{key}: {got} vs pinned {pinned} ±{tol}")
    nf = summary.get("nonfinite_epochs", 0)
    if nf > NONFINITE_MAX:
        failures.append(f"nonfinite_epochs: {nf}")
    if failures:
        print("QUALITY PIN FAILED:\n  " + "\n  ".join(failures))
        raise SystemExit(1)
    print("quality pin OK:",
          json.dumps({k: summary[k] for k in PIN}))


if __name__ == "__main__":
    main()
