"""Multi-step training-TRAJECTORY parity vs the PyTorch reference (VERDICT
r4 #2: the last unproven semantic layer — one-step forward/backward/optimizer
parity is certified by the goldens, but 1800 epochs of interacting phase
gates, clip schedules, and RNG streams are not).

Both arms train the SAME toy model (64-wide net, ref conf shrunk) on the
SAME synthetic shaded scene from the SAME init, with every reference random
draw replayed into our renderer per epoch (minimal-SDF steps, eikonal cube
points, phase-A dsurf jitter + np.random.choice subsets — the machinery of
tests/golden/test_e2e_vs_reference._replay_noise). The training loop
mirrors the reference runner exactly (idr_train.py:253-315): Adam
lr=2e-4*B (idr_train.py:110-113), MultiStepLR x0.1 at 4/6 and 5/6
(mvsdf_dtu.conf:6-7), global grad-norm clip 2 -> 0.5 from phase[0]
(idr_train.py:289-294, conf.py:32-33), tp = epoch/nepochs.

PROCESS ISOLATION (measured, this machine): the FIRST torch
``optimizer.step()`` in a process permanently changes subsequent XLA:CPU
results — the same jitted function on the same arguments returned a loss
of 0.8406509 before and 0.8192480 after (bisected: forward/loss/backward
are clean, Adam.step() flips it; torch.set_flush_denormal(False) does not
restore). Presumably a thread FP-environment change (FTZ/DAZ) picked up by
XLA's worker threads; near-zero SDF knife edges amplify it to percent-level
loss shifts. So each arm runs in its OWN subprocess and communicates via
npz/jsonl artifacts. The pre-contamination jax value bit-matches the torch
arm's own loss, so the isolated-arms comparison is the meaningful one.

Controlled deviation (both arms identically): the pixel subset is FIXED
across epochs instead of per-epoch resampled — removes the one RNG stream
that cannot be replayed through a fixed-shape pipeline, and makes the
trajectories directly comparable.

Float32 chaos (secant knife edges, argmin ties, mask flips) makes
step-k divergence grow with k; the claims tested are
  (a) early-trajectory parity: first EARLY_N epochs' total loss agree to
      EARLY_TOL,
  (b) converged-geometry parity: both arms' final SDF root along random
      directions lands on the GT sphere within GEO_TOL, and
  (c) statistical loss parity: final-window mean losses agree within
      WINDOW_REL.

Run (CPU, ~15-30 min):  timeout 5400 python scripts/trajectory_parity.py
Artifacts in --workdir (default /tmp/traj_parity): ref.jsonl, ours.jsonl,
noise.npz, init_params.npz, summary printed as one JSON line.
"""
import argparse
import contextlib
import io
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EARLY_N = 10
EARLY_TOL = 2e-3      # abs+rel band on total loss over the first epochs
# Both arms converge the toy scene (6 views x 256 fixed rays) to ~0.035
# mean |root - R| — the budget's floor, not an implementation gap (measured
# 600 epochs: ref 0.0341, ours 0.0366, cross-arm 0.015; init error 0.15).
# The parity claims are: both arms reach the budget's quality floor
# (GEO_TOL) AND land within GEO_MATCH of each other.
GEO_TOL = 0.06
GEO_MATCH = 0.012     # | ours_mean_err - ref_mean_err |
GEO_CROSS = 0.03      # mean |root_ours - root_ref| per direction
WINDOW_REL = 0.25     # final-window mean loss relative agreement
RADIUS = 0.45
LOSS_KEYS = ("loss", "rgb_loss", "eikonal_loss", "depth_loss", "feat_loss",
             "surf_loss")


def add_args(ap):
    ap.add_argument("--epochs", type=int, default=360)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--n_pix", type=int, default=256)
    ap.add_argument("--img_hw", type=int, default=64)
    ap.add_argument("--depth_hw", type=int, default=32)
    ap.add_argument("--seed0", type=int, default=1000)
    ap.add_argument("--npseed0", type=int, default=5000)
    ap.add_argument("--workdir", default="/tmp/traj_parity")
    # architecture (default: the 64-wide toy; pass the production shape —
    # --dims 512x8 --skip 4 --feat 256 --rdims 512x4 — for a
    # production-architecture trajectory at reduced ray count)
    ap.add_argument("--dims", default="64x4",
                    help="implicit MLP hidden dims, WxN or comma list")
    ap.add_argument("--skip", type=int, default=2)
    ap.add_argument("--feat", type=int, default=32)
    ap.add_argument("--rdims", default="64x2",
                    help="rendering MLP hidden dims, WxN or comma list")


def parse_dims(spec):
    if "x" in spec:
        w, n = spec.split("x")
        return tuple([int(w)] * int(n))
    return tuple(int(t) for t in spec.split(","))


def build_scene(args):
    from tests.golden.scene_fixtures import make_scene_shaded
    return make_scene_shaded(n=args.views, img_hw=args.img_hw,
                             depth_hw=args.depth_hw, n_pix=args.n_pix,
                             sphere_radius=RADIUS)


def make_ref_conf(args):
    """Reference-style conf object for the chosen architecture (the test
    module's _Conf hard-codes the 64-wide toy)."""
    d = {
        "feature_vector_size": args.feat,
        "implicit_network": dict(d_in=3, d_out=1,
                                 dims=list(parse_dims(args.dims)),
                                 geometric_init=True, bias=0.6,
                                 skip_in=[args.skip], weight_norm=True,
                                 multires=6),
        "rendering_network": dict(mode="idr", d_in=9, d_out=3,
                                  dims=list(parse_dims(args.rdims)),
                                  weight_norm=True, multires_view=4),
        "ray_tracer": dict(object_bounding_sphere=1.0, sdf_threshold=5.0e-5,
                           line_search_step=0.5, line_step_iters=3,
                           sphere_tracing_iters=10, n_steps=100,
                           n_secant_steps=8),
    }

    class Conf:
        def get_int(self, k):
            return d[k]

        def get_float(self, k):
            parts = k.split(".")
            v = d
            for p in parts:
                v = v[p] if isinstance(v, dict) else getattr(v, p)
            return float(v)

        def get_config(self, k):
            return d[k]

    return Conf()


def flat_params(params):
    out = {}
    for net, layers in params.items():
        for i, layer in enumerate(layers):
            for k, v in layer.items():
                out[f"{net}.{i}.{k}"] = np.asarray(v)
    return out


def unflat_params(npz):
    import jax.numpy as jnp
    nets = {}
    for key in npz.files:
        net, i, k = key.split(".")
        nets.setdefault(net, {}).setdefault(int(i), {})[k] = \
            jnp.asarray(npz[key])
    return {net: [layers[i] for i in sorted(layers)]
            for net, layers in nets.items()}


def root_dirs():
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(512, 3))
    return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)


def root_radius(sdf_at):
    """Bisect f(r*d)=0 on r in [0.05, 0.95] per direction."""
    lo = np.full(512, 0.05, np.float64)
    hi = np.full(512, 0.95, np.float64)
    flo, fhi = sdf_at(lo), sdf_at(hi)
    ok = (flo < 0) != (fhi < 0)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        fm = sdf_at(mid)
        neg_side = (fm < 0) == (flo < 0)
        lo = np.where(neg_side, mid, lo)
        flo = np.where(neg_side, fm, flo)
        hi = np.where(neg_side, hi, mid)
    return 0.5 * (lo + hi), ok


def lr_for_epoch(e, base_lr, m1, m2):
    return base_lr * (0.1 ** ((e >= m1) + (e >= m2)))


# --------------------------- reference arm ---------------------------------

def run_ref(args):
    import torch
    from tests.golden.reference_harness import (import_reference,
                                                torch_implicit_to_params)
    from tests.golden.test_e2e_vs_reference import _replay_noise

    E, B = args.epochs, args.views
    scene = build_scene(args)
    ref = import_reference()
    torch.manual_seed(0)
    model = ref["idr"].IDRNetwork(conf=make_ref_conf(args))
    model.train()
    loss_mod = ref["loss"].IDRLoss()

    params = {
        "implicit": torch_implicit_to_params(model.implicit_network),
        "render": torch_implicit_to_params(model.rendering_network),
    }
    np.savez(os.path.join(args.workdir, "init_params.npz"),
             **flat_params(params))

    # precompute EVERY epoch's replayed noise (scene+seed deterministic,
    # model-independent) so the jax arm never has to touch torch
    noise_all = {}
    for epoch in range(E):
        tp = epoch / E
        noise = _replay_noise(ref, scene, tp, args.seed0 + epoch,
                              args.npseed0 + epoch)
        for k, v in noise.items():
            noise_all[f"e{epoch}_{k}"] = np.asarray(v)
    np.savez(os.path.join(args.workdir, "noise.npz"), **noise_all)
    print(f"[ref] noise precomputed for {E} epochs", flush=True)

    t = {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in scene.items() if isinstance(v, np.ndarray)}
    model_input = {k: t[k] for k in
                   ["uv", "intrinsics", "pose", "object_mask", "depths",
                    "depth_cams"]}
    model_input["size"] = t["size"]
    model_input["center"] = t["center"]
    gt = {k: t[k] for k in ["rgb", "depths", "depth_cams", "size", "center",
                            "feat", "feat_src", "cam", "src_cams"]}

    base_lr = 2e-4 * B
    opt = torch.optim.Adam(model.parameters(), lr=base_lr)
    m1, m2 = int(E * 4 / 6), int(E * 5 / 6)
    sched_t = torch.optim.lr_scheduler.MultiStepLR(opt, [m1, m2], gamma=0.1)

    silent = io.StringIO()
    t_start = time.perf_counter()
    with open(os.path.join(args.workdir, "ref.jsonl"), "w") as f:
        for epoch in range(E):
            tp = epoch / E
            torch.manual_seed(args.seed0 + epoch)
            np.random.seed(args.npseed0 + epoch)
            with contextlib.redirect_stdout(silent):
                out = model(model_input, tp)
                losses = loss_mod(out, gt, tp, 1)
                opt.zero_grad()
                losses["loss"].backward()
                gnorm = torch.cat(
                    [p.grad.flatten() for p in model.parameters()
                     if p.grad is not None]).norm()
                if 1.0 / 6.0 <= tp:
                    torch.nn.utils.clip_grad_norm_(
                        model.parameters(), 2.0 if tp < 0.5 else 0.5)
                opt.step()
                sched_t.step()
            silent.truncate(0), silent.seek(0)
            row = {"epoch": epoch, "tp": round(tp, 5),
                   **{k: float(losses[k].detach()) for k in LOSS_KEYS},
                   "gnorm": float(gnorm),
                   "lr": lr_for_epoch(epoch, base_lr, m1, m2)}
            f.write(json.dumps(row) + "\n")
            if epoch % 20 == 0 or epoch == E - 1:
                f.flush()
                print(f"[ref {epoch}/{E}] loss={row['loss']:.4f} "
                      f"gnorm={row['gnorm']:.2f} "
                      f"{time.perf_counter()-t_start:.0f}s", flush=True)

    dirs = root_dirs()

    def sdf_ref(r):
        with torch.no_grad():
            pts = torch.from_numpy((r[:, None] * dirs).astype(np.float32))
            return model.implicit_network(pts)[:, 0].numpy().astype(
                np.float64)

    r_ref, ok = root_radius(sdf_ref)
    np.savez(os.path.join(args.workdir, "ref_roots.npz"), r=r_ref, ok=ok)
    print("[ref] done", flush=True)


# ------------------------------ our arm ------------------------------------

def run_ours(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from mvsdf_tpu.config import ModelConfig, Schedule
    from mvsdf_tpu.fields.sdf import ImplicitConfig, implicit_apply
    from mvsdf_tpu.fields.radiance import RenderConfig
    from mvsdf_tpu.tracing.sphere_trace import TracerConfig
    from mvsdf_tpu.rendering import render_forward
    from mvsdf_tpu.supervision.losses import total_loss
    from mvsdf_tpu.train.step import weights_to_array, weights_from_array

    E, B = args.epochs, args.views
    scene = build_scene(args)
    params = unflat_params(
        np.load(os.path.join(args.workdir, "init_params.npz")))
    noise_npz = np.load(os.path.join(args.workdir, "noise.npz"))

    cfg = ModelConfig(
        implicit=ImplicitConfig(feature_vector_size=args.feat,
                                dims=parse_dims(args.dims),
                                skip_in=(args.skip,), bias=0.6, multires=6),
        render=RenderConfig(feature_vector_size=args.feat,
                            dims=parse_dims(args.rdims), multires_view=4),
        tracer=TracerConfig(),
        implicit_diff_min_dot=0.0)  # reference divides unguarded
    sched = Schedule()
    inputs = {k: jnp.asarray(np.asarray(v)) for k, v in scene.items()
              if isinstance(v, np.ndarray)}
    gt_j = {k: inputs[k] for k in ["rgb", "depths", "depth_cams", "size",
                                   "center", "feat", "feat_src", "cam",
                                   "src_cams"]}
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = adam.init(params)
    base_lr = 2e-4 * B
    m1, m2 = int(E * 4 / 6), int(E * 5 / 6)

    step_cache = {}

    def make_step(gates):
        @jax.jit
        def step(params, opt_state, noise, w_arr, lr):
            weights = weights_from_array(w_arr)

            def loss_fn(p):
                out = render_forward(cfg, p, inputs, training=True,
                                     gates=gates, noise=noise)
                lt = total_loss(out, gt_j, gates, sched, weights)
                return lt.loss, lt

            (_, lt), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            leaves = jax.tree_util.tree_leaves(grads)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                 for g in leaves))
            cap = weights.grad_cap
            coef = jnp.where(cap > 0,
                             jnp.minimum(1.0, cap / (gnorm + 1e-6)), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * coef, grads)
            updates, opt_state2 = adam.update(grads, opt_state, params)
            params2 = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, params, updates)
            return params2, opt_state2, lt, gnorm
        return step

    t_start = time.perf_counter()
    with open(os.path.join(args.workdir, "ours.jsonl"), "w") as f:
        for epoch in range(E):
            tp = epoch / E
            pref = f"e{epoch}_"
            noise = {k[len(pref):]: jnp.asarray(noise_npz[k])
                     for k in noise_npz.files if k.startswith(pref)}
            gates = sched.gates(tp)
            if gates not in step_cache:
                step_cache[gates] = make_step(gates)
            w_arr = weights_to_array(sched.weights(tp))
            params, opt_state, lt, gnorm = step_cache[gates](
                params, opt_state, noise, w_arr,
                jnp.float32(lr_for_epoch(epoch, base_lr, m1, m2)))
            row = {"epoch": epoch, "tp": round(tp, 5),
                   **{k: float(getattr(lt, k)) for k in LOSS_KEYS},
                   "gnorm": float(gnorm),
                   "lr": lr_for_epoch(epoch, base_lr, m1, m2)}
            f.write(json.dumps(row) + "\n")
            if epoch % 20 == 0 or epoch == E - 1:
                f.flush()
                print(f"[ours {epoch}/{E}] loss={row['loss']:.4f} "
                      f"gnorm={row['gnorm']:.2f} "
                      f"{time.perf_counter()-t_start:.0f}s", flush=True)

    dirs = root_dirs()

    def sdf_ours(r):
        pts = jnp.asarray((r[:, None] * dirs).astype(np.float32))
        return np.asarray(implicit_apply(cfg.implicit, params["implicit"],
                                         pts)[..., 0], np.float64)

    r_ours, ok = root_radius(sdf_ours)
    np.savez(os.path.join(args.workdir, "ours_roots.npz"), r=r_ours, ok=ok)
    print("[ours] done", flush=True)


# ------------------------------ driver -------------------------------------

def summarize(args):
    def load(p):
        with open(os.path.join(args.workdir, p)) as f:
            return [json.loads(l) for l in f]

    ref_rows, our_rows = load("ref.jsonl"), load("ours.jsonl")
    E = len(ref_rows)
    ref_roots = np.load(os.path.join(args.workdir, "ref_roots.npz"))
    our_roots = np.load(os.path.join(args.workdir, "ours_roots.npz"))
    ok = ref_roots["ok"] & our_roots["ok"]
    r_ref, r_ours = ref_roots["r"][ok], our_roots["r"][ok]
    geo = {"ours_mean_abs_err": float(np.mean(np.abs(r_ours - RADIUS))),
           "ref_mean_abs_err": float(np.mean(np.abs(r_ref - RADIUS))),
           "cross_mean_abs": float(np.mean(np.abs(r_ours - r_ref))),
           "bracketed_frac": float(ok.mean())}

    early = [(a["loss"], b["loss"])
             for a, b in zip(ref_rows[:EARLY_N], our_rows[:EARLY_N])]
    early_err = max(abs(a - b) / (1 + abs(a)) for a, b in early)
    wN = max(10, E // 10)
    w_ref = float(np.mean([r["loss"] for r in ref_rows[-wN:]]))
    w_ours = float(np.mean([r["loss"] for r in our_rows[-wN:]]))
    summary = {
        "epochs": E, "early_max_rel_err": early_err,
        "final_window_mean": {"ref": w_ref, "ours": w_ours,
                              "rel": abs(w_ref - w_ours) / w_ref},
        "geometry": geo,
        "checks": {
            "early_parity": early_err < EARLY_TOL,
            "geo_ours": geo["ours_mean_abs_err"] < GEO_TOL,
            "geo_ref": geo["ref_mean_abs_err"] < GEO_TOL,
            "geo_match": abs(geo["ours_mean_abs_err"] -
                             geo["ref_mean_abs_err"]) < GEO_MATCH and
            geo["cross_mean_abs"] < GEO_CROSS,
            "window_parity": abs(w_ref - w_ours) / w_ref < WINDOW_REL,
        },
    }
    print(json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    add_args(ap)
    ap.add_argument("--arm", choices=["ref", "ours", "summary"],
                    default=None, help="run one arm in-process (internal)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.arm == "ref":
        return run_ref(args)
    if args.arm == "ours":
        return run_ours(args)
    if args.arm == "summary":
        return summarize(args)

    # driver: both arms in SEPARATE processes (torch Adam.step contaminates
    # XLA:CPU results in-process; see module docstring)
    base = [sys.executable, os.path.abspath(__file__),
            "--epochs", str(args.epochs), "--views", str(args.views),
            "--n_pix", str(args.n_pix), "--img_hw", str(args.img_hw),
            "--depth_hw", str(args.depth_hw), "--seed0", str(args.seed0),
            "--npseed0", str(args.npseed0), "--workdir", args.workdir,
            "--dims", args.dims, "--skip", str(args.skip),
            "--feat", str(args.feat), "--rdims", args.rdims]
    for arm in ("ref", "ours"):
        print(f"=== spawning {arm} arm ===", flush=True)
        r = subprocess.run(base + ["--arm", arm])
        if r.returncode != 0:
            raise SystemExit(f"{arm} arm failed: {r.returncode}")
    summarize(args)


if __name__ == "__main__":
    main()
