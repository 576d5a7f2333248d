"""Per-scene training loop.

Behavioral parity target: ``code/training/idr_train.py`` (IDRTrainRunner):
shuffled drop-last batches of B images x P shared random pixels, 1800 epochs
over three phases, checkpoints + mesh plots every nepochs/12 epochs. Batches
are assembled host-side (numpy), shipped to the device mesh, and the step is
one jitted program per phase.
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
from ..parallel import make_mesh, device_put_batch
from ..parallel.sharding import host_ray_slice, global_batch_from_local
from .step import (make_train_step, init_train_state, weights_to_array,
                   TrainState)
from . import checkpoints as ckpt
from .metrics import MetricsLogger, Throughput


class Trainer:
    def __init__(self, cfg: MVSDFConfig, scene: SceneData, exp_dir: str,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 use_mesh: bool = True, log_fn=print):
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
        self.steps = {}  # phase_idx -> jitted step
        pose_init = scene.poses if cfg.train.train_cameras else None
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
            self.rng.bit_generator.state = rng_state
        self.start_epoch = int(self.state.epoch) + 1
        self.log(f"resumed from epoch {self.start_epoch - 1}")
        return True

    def _get_step(self, phase_idx: int):
        if phase_idx not in self.steps:
            self.steps[phase_idx] = make_train_step(
                self.cfg, phase_idx, mesh=self.mesh, donate=False)
        return self.steps[phase_idx]

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
            m = {k: float(v) for k, v in metrics.items()}
            self.metrics_log.log(epoch, rays_per_s=n_rays / dt, **m)
            self.log(
                f"[{epoch}/{cfg.train.nepochs}] loss={m['loss']:.4f} "
                f"rgb={m['rgb_loss']:.4f} eik={m['eikonal_loss']:.4f} "
                f"depth={m['depth_loss']:.4f} feat={m['feat_loss']:.4f} "
                f"surf={m['surf_loss']:.4f} |g|={m['grad_norm']:.2f} "
                f"lr={m['lr']:.2e} hit={m['hit_frac']:.2f} "
                f"rays/s={n_rays / dt:.0f}")
        return metrics

    def save(self, epoch: int):
        ckpt.save_checkpoint(self.ckpt_dir, epoch, self.state,
                             rng_state=self.rng.bit_generator.state)

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

        if full:
            from ..rendering import render_forward
            from ..eval.plots import plot_image_grid
            idx = int(self.rng.integers(self.scene.n_images))
            rows = []
            for s in range(0, self.scene.total_pixels, chunk_pixels):
                sel = np.arange(s, min(s + chunk_pixels,
                                       self.scene.total_pixels))
                inputs = {
                    "uv": jnp.asarray(self.scene.uv[sel][None]),
                    "intrinsics": jnp.asarray(
                        self.scene.intrinsics[idx][None]),
                    "pose": jnp.asarray(self.scene.poses[idx][None]),
                    "object_mask": jnp.asarray(
                        self.scene.masks[idx][sel][None]),
                }
                out = render_forward(self.cfg.model, params, inputs,
                                     training=False)
                rows.append(np.asarray(out.rgb_values[0]))
            rgb = np.concatenate(rows, 0)[None]
            plot_image_grid(
                os.path.join(self.plots_dir, f"rendering_{epoch}.png"),
                rgb, self.scene.rgb[idx][None], self.scene.img_res)

    def run(self, resume: bool = True, resume_step=None):
        if resume:
            self.maybe_resume(resume_step)
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.train.nepochs + 1):
            self.train_epoch(epoch)
            if epoch % self.plot_freq == 0 and epoch != 0:
                self.save(epoch)
                try:
                    # full render every 4th plot (ref idr_train.py:324-328)
                    full = (epoch // self.plot_freq) % 4 == 0
                    self.plot(epoch, full=full)
                except Exception as e:  # plotting must never kill training
                    self.log(f"plot failed at epoch {epoch}: {e}")
        self.save(cfg.train.nepochs)
        return self.state
