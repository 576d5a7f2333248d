"""Typed configuration tree + phase schedule as data.

The reference splits configuration across pyhocon (.conf), a python module of
schedule lambdas (``code/model/conf.py``), IDR_* env vars, and argparse
(SURVEY.md section 5.6). Here everything is one dataclass tree; the loss /
sample-source schedule is expressed as per-phase tables so that:
  - boolean gates are *static* per phase (selecting one of <=3 jit variants),
  - scalar weights are plain floats passed as dynamic args (no recompile).

Reference schedule semantics (``code/model/conf.py:3-33``): training progress
tp = epoch / nepochs, phases A/B/C split at (1/6, 1/2); depth-surface sample
sources only in phase A; feature weight 0 -> 0.1 -> 0.01; near-attenuation
1 -> 0.1 -> 0.01; grad cap 2 -> 2 -> 0.5 (enabled from phase A end).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .fields.sdf import ImplicitConfig
from .fields.radiance import RenderConfig
from .tracing.sphere_trace import TracerConfig


@dataclasses.dataclass(frozen=True)
class Gates:
    """Static per-phase gates (jit-variant selectors).

    d_use_* gates pick which sample groups feed the depth-carving loss,
    eik_use_* which feed the eikonal loss (ref conf.py:5-12);
    detach_geometry_for_rgb freezes geometry into the radiance net during
    phase A (ref implicit_differentiable_renderer.py:331-334)."""
    d_use_rt_surf: bool = True
    d_use_eik: bool = True
    d_use_dsurf_on: bool = False
    d_use_dsurf_jitter: bool = False
    eik_use_rt_surf: bool = True
    eik_use_eik: bool = True
    eik_use_dsurf_on: bool = False
    eik_use_dsurf_jitter: bool = False
    detach_geometry_for_rgb: bool = False
    enable_feat: bool = True
    enable_surf: bool = True

    @property
    def use_dsurf(self) -> bool:
        return (self.d_use_dsurf_on or self.d_use_dsurf_jitter or
                self.eik_use_dsurf_on or self.eik_use_dsurf_jitter)


@dataclasses.dataclass(frozen=True)
class Weights:
    """Dynamic per-step loss weights (traced scalars, no recompile)."""
    rgb: float = 0.5
    eikonal: float = 0.1
    surf: float = 0.01
    feat: float = 0.0
    depth: float = 1.0
    far_att: float = 1.0
    near_att: float = 1.0
    grad_cap: float = 0.0  # <= 0 disables clipping


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Phase tables indexed A=0, B=1, C=2 (ref conf.py values)."""
    phase: Tuple[float, float] = (1.0 / 6.0, 1.0 / 2.0)
    rgb_weight: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    feat_weight: Tuple[float, float, float] = (0.0, 0.1, 0.01)
    depth_weight: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    eikonal_weight: float = 0.1
    surf_weight: float = 0.01
    far_thresh: float = 0.25
    far_att: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    near_thresh: float = 0.1
    near_att: Tuple[float, float, float] = (1.0, 0.1, 0.01)
    smooth: Tuple[Optional[float], Optional[float], Optional[float]] = (
        None, None, None)
    grad_cap: Tuple[float, float, float] = (2.0, 2.0, 0.5)
    enable_grad_cap: bool = True
    enable_feat: bool = True
    enable_rgb: bool = True
    use_dsurf_phase: Tuple[bool, bool, bool] = (True, False, False)
    use_invalid: bool = False  # carving_t vs carving_t2 (conf.py:16)
    out_thresh_perc: float = 1.0 / 8.0
    feat_img_scale: int = 2

    def phase_index(self, tp: float) -> int:
        if tp < self.phase[0]:
            return 0
        if tp < self.phase[1]:
            return 1
        return 2

    def gates(self, tp: float) -> Gates:
        return self.gates_for_phase(self.phase_index(tp))

    def gates_for_phase(self, i: int) -> Gates:
        ds = self.use_dsurf_phase[i]
        return Gates(
            d_use_dsurf_on=ds, d_use_dsurf_jitter=ds,
            eik_use_dsurf_on=ds, eik_use_dsurf_jitter=ds,
            detach_geometry_for_rgb=(i == 0),
            enable_feat=(i > 0 and self.enable_feat),
            enable_surf=(i > 0),
        )

    def weights(self, tp: float) -> Weights:
        i = self.phase_index(tp)
        cap = self.grad_cap[i] if (
            self.enable_grad_cap and tp >= self.phase[0]) else 0.0
        return Weights(
            rgb=self.rgb_weight[i] if self.enable_rgb else 0.0,
            eikonal=self.eikonal_weight,
            surf=self.surf_weight,
            feat=self.feat_weight[i],
            depth=self.depth_weight[i],
            far_att=self.far_att[i],
            near_att=self.near_att[i],
            grad_cap=cap,
        )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    implicit: ImplicitConfig = ImplicitConfig()
    render: RenderConfig = RenderConfig()
    tracer: TracerConfig = TracerConfig()
    use_mask: bool = False           # conf.py:17
    disable_rgb_grad: bool = False   # conf.py:14
    # Robustness guard (0 = reference-exact): clamp |grad . dir| away from
    # zero in the implicit-function differentiation so grazing-incidence
    # rays cannot produce unbounded surface-point gradients.
    # Clamp |grad . dir| in the implicit-diff division away from zero.
    # The reference divides unguarded (ref sample_network.py:10-20), which
    # NaNs the whole gradient on grazing rays: at the full 1800-epoch CLI
    # budget 27% of epochs hit a non-finite gradient with min_dot=0 (the
    # skip-guard kept training alive but discarded those updates). 1e-2
    # only alters rays whose implicit gradient is already meaningless.
    # Parity tests pin 0.0 explicitly.
    implicit_diff_min_dot: float = 1e-2
    # Run the (no-grad) trace under shard_map on the data mesh: per-device
    # convergence loops and per-device fallback compaction (no global
    # argsort), and the Pallas kernels run per device — the multi-chip-
    # legal form of every trace optimization. Results are exact either way.
    shard_map_trace: bool = False
    # Fused Pallas SDF evaluation for the (no-grad) trace phase: MLP weights
    # resident in VMEM, no per-layer HBM round trips. TPU only
    # (pallas_interpret=True runs the kernel interpreted for CPU testing).
    use_pallas_trace: bool = False
    # Fuse the whole march loop into one kernel (requires use_pallas_trace).
    use_pallas_march: bool = False
    # Fuse the 8-step secant refinement into one kernel (requires
    # use_pallas_trace): bracket state in VMEM scratch, one launch instead
    # of n_secant_steps sequential MLP launches.
    use_pallas_secant: bool = False
    pallas_block: int = 1024
    pallas_march_block: int = 512
    pallas_interpret: bool = False
    # Compute the positional encoding inside the kernel from raw xyz
    # (input stream 8 lanes instead of 128); interpret-verified, off until
    # profiled faster on real TPU.
    pallas_in_kernel_pe: bool = False
    # Supervised-path compaction (training renderer): the rt_surf sample
    # group and the shading pass read only surface-hit lanes (every
    # consumer multiplies non-hit lanes by an exactly-zero mask), so both
    # are gathered into a fixed-capacity block before the live-gradient
    # MLP calls — the backward is then automatically compacted too.
    # Fractions of B*P build a capacity cascade (tightest fitting tier
    # runs; dense on overflow — exact either way, same machinery as the
    # trace-side _compact_call). () = dense (reference-parity default).
    # Single-chip optimization: the gather crosses ray-shard boundaries,
    # leave () on multi-chip meshes.
    supervised_compact_frac: Tuple[float, ...] = ()
    # Rematerialize (jax.checkpoint) the supervised compaction's tier
    # functions: lax.cond linearization zero-fills the UNTAKEN branches'
    # residual slots, so without remat every step the compact tier is
    # taken materializes the dense branch's full-width activation stack
    # as zero broadcasts (~50 x [B*P, 512] splats, measured 5-8 ms/step
    # on the full-size v5e step — PERF.md round 5). Remat trades that for
    # recomputing the tier-sized forward in the backward pass; gradients
    # are bit-identical. No effect when supervised_compact_frac is ().
    supervised_remat: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (ref mvsdf_dtu.conf train{} + exp_runner)."""
    learning_rate: float = 2e-4     # scaled by batch size (idr_train.py:111)
    batch_size: int = 8
    num_pixels: int = 4096
    nepochs: int = 1800
    sched_milestones: Tuple[float, float] = (4.0 / 6.0, 5.0 / 6.0)
    sched_factor: float = 0.1
    plot_freq: float = 1.0 / 12.0
    seed: int = 0
    # optional camera-pose optimization (ref idr_train.py:121-127)
    train_cameras: bool = False
    learning_rate_cam: float = 1e-4
    # Fused-dispatch execution (single-process): scene tensors resident on
    # device, one jitted lax.scan program runs up to epochs_per_dispatch
    # epochs per dispatch, metrics fetched one chunk behind. Multi-host
    # runs always use the per-epoch host-sharded path.
    fused_dispatch: bool = True
    epochs_per_dispatch: int = 16
    # Skip optimizer updates on non-finite gradients (the reference author
    # prototyped exactly this guard, idr_train.py:296-300, commented out).
    # With finite gradients the guard is a numeric no-op, so every finite
    # step stays reference-exact; when a gradient spike goes non-finite the
    # update would poison the parameters permanently (observed in practice:
    # phase A is unclipped per the reference schedule), so skipping is
    # strictly better. Default on; disable for strict step-count parity.
    skip_nonfinite_updates: bool = True


@dataclasses.dataclass(frozen=True)
class MVSDFConfig:
    model: ModelConfig = ModelConfig()
    schedule: Schedule = Schedule()
    train: TrainConfig = TrainConfig()
