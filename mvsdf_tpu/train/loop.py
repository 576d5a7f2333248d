"""Per-scene training loop.

Behavioral parity target: ``code/training/idr_train.py`` (IDRTrainRunner):
shuffled drop-last batches of B images x P shared random pixels, 1800 epochs
over three phases, checkpoints + mesh plots every nepochs/12 epochs.

TPU-native execution model (differs from the reference's per-step host
loop, ref idr_train.py:253-315): scene tensors live in HBM from the start
(train/device_data.py), the host only draws the per-epoch RNG (pixel
subset + image order), and a single jitted ``lax.scan`` program runs many
optimizer steps per dispatch (train/step.py make_scan_train_step). Metrics
are fetched one chunk behind the dispatch so the device never waits on the
host. The per-epoch host-assembled path (train_epoch) remains for
multi-host runs and as the reference-shaped fallback.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MVSDFConfig
from ..data.scene import SceneData
from ..parallel import make_mesh
from ..parallel.sharding import (host_ray_slice, global_batch_from_local,
                                 replicated, validate_ray_divisibility)
from .step import (make_train_step, make_scan_train_step, init_train_state,
                   weights_to_array, TrainState)
from . import checkpoints as ckpt
from .metrics import MetricsLogger, Throughput, annotate, profile_trace


class Trainer:
    def __init__(self, cfg: MVSDFConfig, scene: SceneData, exp_dir: str,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 use_mesh: bool = True, log_fn=print,
                 profile_dir: Optional[str] = None,
                 profile_epochs: int = 0):
        if cfg.train.batch_size > scene.n_images:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} > {scene.n_images} "
                "images: drop-last batching would run zero steps per epoch")
        self.cfg = cfg
        self.scene = scene
        self.exp_dir = exp_dir
        self.ckpt_dir = os.path.join(exp_dir, "checkpoints")
        self.plots_dir = os.path.join(exp_dir, "plots")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.plots_dir, exist_ok=True)
        self.log = log_fn
        self.mesh = mesh if mesh is not None else (
            make_mesh() if use_mesh and len(jax.devices()) > 1 else None)
        validate_ray_divisibility(cfg.train.num_pixels, self.mesh)
        self.steps = {}        # phase_idx -> jitted per-call step
        self.scan_steps = {}   # phase_idx -> jitted multi-step scan
        self.cache = None      # DeviceSceneCache, built lazily
        # linear-method init when the scene provides it (ref idr_train.py:
        # 121-127 + get_pose_init); GT poses otherwise
        pose_init = (getattr(scene, "pose_init", scene.poses)
                     if cfg.train.train_cameras else None)
        self.state = init_train_state(cfg, seed=cfg.train.seed,
                                      pose_init=pose_init)
        self.rng = np.random.default_rng(cfg.train.seed)
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.start_epoch = 0
        nepochs = cfg.train.nepochs
        self.plot_freq = max(1, int(cfg.train.plot_freq * nepochs))
        self.metrics_log = MetricsLogger(
            os.path.join(exp_dir, "metrics.jsonl"), echo=lambda *_: None)
        self.throughput = Throughput()
        self.profile_dir = profile_dir
        self.profile_epochs = profile_epochs
        # one pending (epochs, device-metrics, rays, t_dispatch) chunk so
        # metric fetches trail the dispatch by one program
        self._pending = None
        self._full_render_fn = None  # jitted chunk renderer, built lazily
        self._last_fetch_t = None

    def maybe_resume(self, step=None):
        """step=None resumes the latest checkpoint; an int resumes that
        specific epoch (ref exp_runner.py --checkpoint)."""
        if step is None:
            step = ckpt.latest_step(self.ckpt_dir)
        if step is None:
            return False
        self.state, rng_state = ckpt.restore_checkpoint(
            self.ckpt_dir, step, self.state)
        if rng_state is not None:
            if rng_state.get("np_rng") is not None:
                self.rng.bit_generator.state = rng_state["np_rng"]
            if rng_state.get("jax_key") is not None:
                self.key = jnp.asarray(rng_state["jax_key"],
                                       jnp.uint32)
        self.start_epoch = int(self.state.epoch) + 1
        self.log(f"resumed from epoch {self.start_epoch - 1}")
        return True

    def _get_step(self, phase_idx: int):
        if phase_idx not in self.steps:
            self.steps[phase_idx] = make_train_step(
                self.cfg, phase_idx, mesh=self.mesh, donate=False)
        return self.steps[phase_idx]

    def _get_scan_step(self, phase_idx: int):
        if self.cache is None:
            from .device_data import DeviceSceneCache
            self.cache = DeviceSceneCache(self.scene, mesh=self.mesh)
            self.log(f"device scene cache: "
                     f"{self.cache.nbytes() / 1e6:.1f} MB resident")
        if phase_idx not in self.scan_steps:
            self.scan_steps[phase_idx] = make_scan_train_step(
                self.cfg, phase_idx, self.cache, mesh=self.mesh,
                donate=True)
        return self.scan_steps[phase_idx]

    # ------------------------------------------------------------------
    # Reference-shaped per-epoch path (host batch assembly). Used for
    # multi-host runs (host-sharded ray loading) and kept as the
    # behavioral baseline the fused path is tested against.
    def train_epoch(self, epoch: int):
        cfg = self.cfg
        tp = epoch / cfg.train.nepochs
        phase_idx = cfg.schedule.phase_index(tp)
        step = self._get_step(phase_idx)
        w = weights_to_array(cfg.schedule.weights(tp))
        self.scene.change_sampling_idx(cfg.train.num_pixels, self.rng)
        self.state = self.state._replace(
            epoch=jnp.asarray(epoch, jnp.int32))

        t0 = time.perf_counter()
        n_rays = 0
        metrics = None
        # each host loads only its ray slice of the shared pixel subset
        rs = (host_ray_slice(cfg.train.num_pixels)
              if jax.process_count() > 1 else None)
        for batch_np in self.scene.epoch_batches(cfg.train.batch_size,
                                                 self.rng, ray_slice=rs):
            if self.mesh is not None:
                batch = global_batch_from_local(self.mesh, batch_np)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            self.key, k = jax.random.split(self.key)
            self.state, metrics = step(self.state, batch, w, k)
            n_rays += cfg.train.batch_size * cfg.train.num_pixels
        if metrics is not None:
            jax.block_until_ready(metrics["loss"])
            dt = time.perf_counter() - t0
            self.throughput.add(n_rays)
            m = {k: float(v) for k, v in metrics.items()}
            self._log_epoch(epoch, n_rays / dt, m)
        return metrics

    # ------------------------------------------------------------------
    # Fused-dispatch path: one jitted scan program per chunk of epochs.
    def _chunk_end(self, e0: int) -> int:
        """Last epoch of the chunk starting at e0: stop at save/plot
        boundaries, phase changes, nepochs, and the dispatch-size cap."""
        cfg = self.cfg
        nepochs = cfg.train.nepochs
        phase0 = cfg.schedule.phase_index(e0 / nepochs)
        e = e0
        cap = e0 + self._dispatch_epochs() - 1
        while e < min(cap, nepochs):
            if e % self.plot_freq == 0 and e != 0:
                break  # e is a save epoch: checkpoint state/RNG must be
                       # exactly post-epoch-e, so the chunk closes here
            nxt = e + 1
            if cfg.schedule.phase_index(nxt / nepochs) != phase0:
                break
            e = nxt
        return e

    def _dispatch_epochs(self) -> int:
        """Fixed epochs-per-dispatch: the compile-once pad size. plot_freq
        + 1 bounds the longest possible chunk (a chunk from 0 runs to the
        first boundary inclusive), so padding never exceeds it."""
        return max(1, min(self.cfg.train.epochs_per_dispatch,
                          self.plot_freq + 1))

    def _train_chunk(self, e0: int, e1: int):
        """Run epochs [e0, e1] in one dispatch, padded to the fixed
        dispatch size with inactive no-op steps. Host RNG draws follow the
        exact stream order of the per-epoch path (sel, image order, then
        one key split per batch) so both paths are interchangeable."""
        cfg = self.cfg
        nepochs = cfg.train.nepochs
        B = cfg.train.batch_size
        P = cfg.train.num_pixels
        phase_idx = cfg.schedule.phase_index(e0 / nepochs)
        scan = self._get_scan_step(phase_idx)

        idx_rows, sel_rows, w_rows, ep_rows, key_rows = [], [], [], [], []
        for epoch in range(e0, e1 + 1):
            sel = self.rng.permutation(self.scene.total_pixels)[:P]
            order = self.rng.permutation(self.scene.n_images)
            w = np.asarray(weights_to_array(
                cfg.schedule.weights(epoch / nepochs)))
            for i in range(0, self.scene.n_images - B + 1, B):
                self.key, k = jax.random.split(self.key)
                idx_rows.append(order[i:i + B].astype(np.int32))
                sel_rows.append(sel.astype(np.int32))
                w_rows.append(w)
                ep_rows.append(epoch)
                key_rows.append(np.asarray(k))

        n_real = len(ep_rows)
        spe = n_real // (e1 + 1 - e0)  # steps per epoch
        k_rows = self._dispatch_epochs() * spe
        active = np.zeros(k_rows, bool)
        active[:n_real] = True
        while len(ep_rows) < k_rows:  # pad with inactive copies
            idx_rows.append(idx_rows[-1])
            sel_rows.append(sel_rows[-1])
            w_rows.append(w_rows[-1])
            ep_rows.append(ep_rows[-1])
            key_rows.append(key_rows[-1])

        args = (jnp.asarray(np.stack(idx_rows)),
                jnp.asarray(np.stack(sel_rows)),
                jnp.asarray(np.stack(w_rows)),
                jnp.asarray(np.asarray(ep_rows, np.int32)),
                jnp.asarray(np.stack(key_rows)),
                jnp.asarray(active))
        if self.mesh is not None:
            # replicated placement for the tiny control arrays and (no-op
            # when already resident) the state
            repl = replicated(self.mesh)
            args = tuple(jax.device_put(a, repl) for a in args)
            self.state = jax.device_put(self.state, repl)
        t_dispatch = time.perf_counter()
        with annotate(f"train_chunk[{e0}:{e1}]"):
            self.state, metrics = scan(self.state, *args)
        n_rays = n_real * B * P
        self._flush_metrics()
        self._pending = (list(range(e0, e1 + 1)), spe, metrics, n_rays,
                         t_dispatch)

    def _flush_metrics(self):
        """Fetch + log the previous chunk's metrics (device is already
        working on the next chunk, so this sync costs nothing)."""
        if self._pending is None:
            return
        epochs, steps_per_epoch, metrics, n_rays, t_dispatch = self._pending
        self._pending = None
        m_np = {k: np.asarray(v) for k, v in metrics.items()}  # sync point
        now = time.perf_counter()
        t0 = self._last_fetch_t if self._last_fetch_t is not None \
            else t_dispatch
        dt = max(now - t0, 1e-9)
        self._last_fetch_t = now
        self.throughput.add(n_rays)
        rays_per_s = n_rays / dt
        for j, epoch in enumerate(epochs):
            row = slice(j * steps_per_epoch, (j + 1) * steps_per_epoch)
            m = {k: float(v[row][-1]) for k, v in m_np.items()}
            self._log_epoch(epoch, rays_per_s, m)

    def _log_epoch(self, epoch, rays_per_s, m):
        cfg = self.cfg
        self.metrics_log.log(epoch, rays_per_s=rays_per_s, **m)
        self.log(
            f"[{epoch}/{cfg.train.nepochs}] loss={m['loss']:.4f} "
            f"rgb={m['rgb_loss']:.4f} eik={m['eikonal_loss']:.4f} "
            f"depth={m['depth_loss']:.4f} feat={m['feat_loss']:.4f} "
            f"surf={m['surf_loss']:.4f} |g|={m['grad_norm']:.2f} "
            f"lr={m['lr']:.2e} hit={m['hit_frac']:.2f} "
            f"rays/s={rays_per_s:.0f}")

    def save(self, epoch: int):
        ckpt.save_checkpoint(self.ckpt_dir, epoch, self.state,
                             rng_state=self.rng.bit_generator.state,
                             jax_key=np.asarray(self.key))

    def plot(self, epoch: int, resolution: int = 100, full: bool = False,
             chunk_pixels: int = 10000):
        """Periodic mesh snapshot (analog of plots.get_surface_trace,
        ref idr_train.py:246-247); with full=True also renders one full
        image and writes a rendered-vs-GT grid (ref plot_epoch full)."""
        from ..eval.marching import extract_mesh
        from ..eval.mesh import save_obj
        from ..fields.sdf import sdf_apply

        params = self.state.params

        def sdf(x):
            return sdf_apply(self.cfg.model.implicit, params["implicit"], x)

        verts, faces = extract_mesh(sdf, resolution=resolution)
        if len(faces):
            save_obj(os.path.join(self.plots_dir,
                                  f"surface_{epoch}.obj"), verts, faces)
            # scene snapshot: surface + camera cones (the reference's
            # plotly scene plot, ref plots.py:12-65) — static PNG plus
            # the interactive HTML artifact
            from ..eval.plots import plot_scene_snapshot
            from ..eval.html_viewer import write_scene_html
            plot_scene_snapshot(
                os.path.join(self.plots_dir, f"scene_{epoch}.png"),
                verts, faces, poses=self.scene.poses)
            write_scene_html(
                os.path.join(self.plots_dir, f"scene_{epoch}.html"),
                verts, faces, poses=self.scene.poses,
                title=f"epoch {epoch}")

        if full:
            from ..eval.plots import plot_image_grid
            idx = int(self.rng.integers(self.scene.n_images))
            # ONE jitted fixed-chunk program (pad the tail), cached on the
            # runner and dispatched from a host loop — the round-3 form ran
            # render_forward EAGERLY per chunk, compiling hundreds of tiny
            # op-programs that each fall under the persistent cache's
            # min-compile-time threshold: ~220 s once per process at the
            # first full render (PERF.md round 4, VERDICT r3 #3).
            total = self.scene.total_pixels
            chunk = min(chunk_pixels, total)
            n_chunks = -(-total // chunk)
            sel_all = np.concatenate(
                [np.arange(total),
                 np.zeros(n_chunks * chunk - total, np.int64)]
            ).reshape(n_chunks, chunk)
            if self._full_render_fn is None:
                from ..rendering import render_forward

                @jax.jit
                def _render_chunk(p, uv1, intr, pose, m1):
                    inputs = {"uv": uv1[None], "intrinsics": intr[None],
                              "pose": pose[None], "object_mask": m1[None]}
                    return render_forward(self.cfg.model, p, inputs,
                                          training=False).rgb_values[0]

                self._full_render_fn = _render_chunk
            uv_chunks = jnp.asarray(self.scene.uv[sel_all])
            intr_d = jnp.asarray(self.scene.intrinsics[idx])
            pose_d = jnp.asarray(self.scene.poses[idx])
            mask_chunks = jnp.asarray(self.scene.masks[idx][sel_all])
            out = [self._full_render_fn(params, uv_chunks[c], intr_d,
                                        pose_d, mask_chunks[c])
                   for c in range(n_chunks)]
            rgb = np.concatenate([np.asarray(o) for o in out])[:total][None]
            plot_image_grid(
                os.path.join(self.plots_dir, f"rendering_{epoch}.png"),
                rgb, self.scene.rgb[idx][None], self.scene.img_res)

    def run(self, resume: bool = True, resume_step=None):
        if resume:
            self.maybe_resume(resume_step)
        cfg = self.cfg
        fused = (cfg.train.fused_dispatch and jax.process_count() == 1)
        self.throughput.reset()
        prof = profile_trace(self.profile_dir) if (
            self.profile_dir and self.profile_epochs > 0) else None
        prof_remaining = self.profile_epochs
        if prof is not None:
            prof.__enter__()
        try:
            epoch = self.start_epoch
            while epoch <= cfg.train.nepochs:
                if fused:
                    e1 = self._chunk_end(epoch)
                    if prof is not None:
                        e1 = min(e1, epoch + prof_remaining - 1)
                    self._train_chunk(epoch, e1)
                else:
                    e1 = epoch
                    self.train_epoch(epoch)
                if prof is not None:
                    prof_remaining -= e1 + 1 - epoch
                    if prof_remaining <= 0:
                        self._flush_metrics()
                        jax.block_until_ready(
                            jax.tree_util.tree_leaves(self.state.params))
                        prof.__exit__(None, None, None)
                        prof = None
                for e in range(epoch, e1 + 1):
                    if e % self.plot_freq == 0 and e != 0:
                        self._flush_metrics()
                        self.save(e)
                        try:
                            # full render every 4th plot (ref :324-328)
                            full = (e // self.plot_freq) % 4 == 0
                            self.plot(e, full=full)
                        except Exception as exc:  # never kill training
                            self.log(f"plot failed at epoch {e}: {exc}")
                epoch = e1 + 1
        finally:
            if prof is not None:
                prof.__exit__(None, None, None)
        self._flush_metrics()
        self.save(cfg.train.nepochs)
        rates = self.throughput.rates()
        self.log(f"training done: {rates['rays_per_s']:.0f} rays/s "
                 f"({rates['steps_per_s']:.2f} epochs/s overall)")
        return self.state
