"""Jitted training step: forward + loss + grad + clip + Adam.

Behavioral parity targets:
  - Adam with lr = 2e-4 * batch_size (ref idr_train.py:110-113)
  - MultiStepLR x0.1 at 4/6 and 5/6 of training (ref idr_train.py:114-119),
    computed *inside* the step from a dynamic epoch scalar so no recompile
  - global grad-norm clip, cap scheduled 2 -> 0.5, enabled from phase A end
    (ref idr_train.py:289-294, conf.py:32-33)

Static per-phase gates select one of <= 3 compiled variants; everything else
(loss weights, lr, epoch) is dynamic. With a mesh, the batch's ray axes are
sharded and parameters replicated; XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import MVSDFConfig, Weights
from ..fields.sdf import init_implicit
from ..fields.radiance import init_render
from ..rendering import render_forward
from ..supervision.losses import total_loss
from .. import parallel


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32
    pose_vecs: Any = None   # (n_images, 7) when camera opt is on
    cam_opt: Any = None     # SparseAdamState when camera opt is on


GT_KEYS = ("rgb", "depths", "depth_cams", "size", "center", "feat",
           "feat_src", "cam", "src_cams")


def init_params(cfg: MVSDFConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    return {"implicit": init_implicit(cfg.model.implicit, rng),
            "render": init_render(cfg.model.render, rng)}


def make_optimizer(cfg: MVSDFConfig):
    base_lr = cfg.train.learning_rate * cfg.train.batch_size
    milestones = jnp.asarray(
        [int(m * cfg.train.nepochs) for m in cfg.train.sched_milestones])

    def lr_for_epoch(epoch):
        n = jnp.sum(epoch >= milestones)
        return base_lr * (cfg.train.sched_factor ** n)

    # lr applied via scale_by_learning_rate with the dynamic value injected
    # per-step (see train_step); adam transform keeps torch defaults.
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), lr_for_epoch


def _clip_by_global_norm(grads, cap):
    """torch.nn.utils.clip_grad_norm_ semantics (cap <= 0 disables)."""
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in leaves))
    coef = jnp.where(cap > 0, jnp.minimum(1.0, cap / (gnorm + 1e-6)), 1.0)
    return jax.tree_util.tree_map(lambda g: g * coef, grads), gnorm


def weights_to_array(w: Weights) -> jnp.ndarray:
    return jnp.asarray([w.rgb, w.eikonal, w.surf, w.feat, w.depth,
                        w.far_att, w.near_att, w.grad_cap], jnp.float32)


def weights_from_array(a) -> Weights:
    return Weights(rgb=a[0], eikonal=a[1], surf=a[2], feat=a[3], depth=a[4],
                   far_att=a[5], near_att=a[6], grad_cap=a[7])


def make_step_body(cfg: MVSDFConfig, phase_idx: int,
                   mesh: Optional[jax.sharding.Mesh] = None):
    """The pure (un-jitted) step body step(state, batch, weights_arr, key)
    -> (state, metrics), shared by the per-call jit path (make_train_step)
    and the fused multi-epoch scan path (make_scan_train_step)."""
    gates = cfg.schedule.gates_for_phase(phase_idx)
    sched = cfg.schedule
    adam, lr_for_epoch = make_optimizer(cfg)

    train_cameras = cfg.train.train_cameras

    def step(state: TrainState, batch, weights_arr, key):
        weights = weights_from_array(weights_arr)

        def loss_fn(params, pose_vecs):
            inputs = batch
            if train_cameras:
                # 7-d quat+trans pose per batch image (ref idr_train:263)
                inputs = dict(batch)
                inputs["pose"] = pose_vecs[batch["indices"]]
            with jax.named_scope("render_forward"):
                out = render_forward(cfg.model, params, inputs,
                                     training=True, gates=gates, key=key,
                                     mesh=mesh)
            gt = {k: batch[k] for k in GT_KEYS}
            with jax.named_scope("loss"):
                lt = total_loss(out, gt, gates, sched, weights)
            return lt.loss, (lt, out.network_object_mask)

        if train_cameras:
            (loss_val, (lt, hits)), (grads, pose_grads) = \
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.pose_vecs)
        else:
            (loss_val, (lt, hits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, None)
            pose_grads = None
        grads, gnorm = _clip_by_global_norm(grads, weights.grad_cap)
        if cfg.train.skip_nonfinite_updates:
            # zero the whole update on a non-finite batch (the reference
            # author's commented-out guard, idr_train.py:296-300)
            finite = jnp.isfinite(gnorm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, 0.0), grads)
        updates, opt_state = adam.update(grads, state.opt_state, state.params)
        lr = lr_for_epoch(state.epoch)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)

        pose_vecs, cam_opt = state.pose_vecs, state.cam_opt
        if train_cameras:
            from .cameras_opt import sparse_adam_step
            touched = jnp.zeros(pose_vecs.shape[0], bool).at[
                batch["indices"]].set(True)
            cam_opt, pose_vecs = sparse_adam_step(
                cam_opt, pose_vecs, pose_grads, touched,
                cfg.train.learning_rate_cam)

        metrics = {
            "loss": lt.loss, "rgb_loss": lt.rgb_loss,
            "eikonal_loss": lt.eikonal_loss, "depth_loss": lt.depth_loss,
            "feat_loss": lt.feat_loss, "surf_loss": lt.surf_loss,
            "grad_norm": gnorm, "lr": lr,
            "hit_frac": jnp.mean(hits.astype(jnp.float32)),
        }
        return TrainState(params, opt_state, state.epoch, pose_vecs,
                          cam_opt), metrics

    return step


def make_train_step(cfg: MVSDFConfig, phase_idx: int,
                    mesh: Optional[jax.sharding.Mesh] = None,
                    donate: bool = True):
    """Returns a jitted step(state, batch, weights_arr, key) -> (state,
    metrics). ``weights_arr`` from weights_to_array(schedule.weights(tp))."""
    step = make_step_body(cfg, phase_idx, mesh=mesh)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = parallel.replicated(mesh)
    state_holder = {}

    @functools.wraps(step)
    def wrapper(state, batch, weights_arr, key):
        # Shardings depend on the batch pytree structure; resolve on first
        # call: ray axes sharded over 'data', everything else replicated.
        if "fn" not in state_holder:
            batch_sh = parallel.batch_shardings(mesh, batch)
            state_sh = jax.tree_util.tree_map(lambda _: repl, state)
            state_holder["fn"] = jax.jit(
                step,
                in_shardings=(state_sh, batch_sh, repl, repl),
                donate_argnums=(0,) if donate else ())
        return state_holder["fn"](state, batch, weights_arr, key)

    return wrapper


def make_scan_train_step(cfg: MVSDFConfig, phase_idx: int, cache,
                         mesh: Optional[jax.sharding.Mesh] = None,
                         donate: bool = True):
    """Fused multi-step dispatch: one jitted program runs K optimizer steps
    via ``lax.scan``, gathering each step's batch in-graph from the
    device-resident scene cache (train/device_data.py). Replaces the
    reference's per-step host loop (ref idr_train.py:253-315) with a single
    device program per chunk: no host batch assembly, no per-step sync, no
    re-upload of depth/feature tensors.

    Returns fn(state, indices (K,B), sel (K,P), weights (K,8), epochs (K,),
    keys (K,) PRNG keys, active (K,) bool) -> (state, metrics stacked over
    K). K is FIXED per compiled program: shorter chunks (checkpoint/phase
    boundaries) are padded with active=False rows, whose steps run but
    leave the state untouched — one compile per phase instead of one per
    distinct chunk length.
    """
    body = make_step_body(cfg, phase_idx, mesh=mesh)

    def scan_step(state: TrainState, indices, sel, weights, epochs, keys,
                  active):
        def one(st, xs):
            idx, s, w, ep, key, act = xs
            batch = cache.gather(idx, s, mesh=mesh)
            new_st, metrics = body(st._replace(epoch=ep), batch, w, key)
            st_out = jax.tree_util.tree_map(
                lambda a, b: jnp.where(act, a, b), new_st, st)
            return st_out, metrics

        return jax.lax.scan(one, state,
                            (indices, sel, weights, epochs, keys, active))

    return jax.jit(scan_step, donate_argnums=(0,) if donate else ())


def init_train_state(cfg: MVSDFConfig, seed: int = 0,
                     pose_init: Optional[np.ndarray] = None) -> TrainState:
    """pose_init (n_images, 4, 4) or (n_images, 7) seeds the optimizable
    camera embeddings when cfg.train.train_cameras."""
    params = init_params(cfg, seed)
    adam, _ = make_optimizer(cfg)
    opt_state = adam.init(params)
    pose_vecs = cam_opt = None
    if cfg.train.train_cameras:
        from .cameras_opt import (pose_vecs_from_matrices, init_sparse_adam)
        if pose_init is None:
            raise ValueError("train_cameras requires pose_init")
        pv = np.asarray(pose_init, np.float32)
        if pv.ndim == 3:
            pv = pose_vecs_from_matrices(pv)
        pose_vecs = jnp.asarray(pv)
        cam_opt = init_sparse_adam(pose_vecs)
    return TrainState(params=params, opt_state=opt_state,
                      epoch=jnp.zeros((), jnp.int32),
                      pose_vecs=pose_vecs, cam_opt=cam_opt)
