"""AOT export of the trained renderer for serving (no reference analog).

Serializes the eval-mode render function (fixed chunk of rays -> RGB) as a
portable StableHLO artifact via ``jax.export``: a serving process (or a
non-Python runtime via the StableHLO module) can load and call it without
the model code, config system, or dataset layer — only the checkpoint's
parameter pytree is passed at call time, so one artifact serves every
checkpoint of the same architecture.

The export uses the pure-XLA trace path (portable across cpu/tpu
lowerings); the Pallas kernels stay a runtime optimization of the live
CLIs.

CLI:
    python -m mvsdf_tpu.eval.export --conf mvsdf_dtu.conf \
        --out renderer.bin [--chunk 10000] [--platforms cpu,tpu]

Loading:
    from mvsdf_tpu.eval.export import load_renderer
    fn = load_renderer("renderer.bin")   # fn(params, uv, intr, pose, mask)
"""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def make_render_fn(cfg):
    """The (params, uv, intrinsics, pose, object_mask) -> rgb eval-mode
    render closure the artifact captures. Shapes: uv (1, P, 2), intrinsics
    (1, 4, 4), pose (1, 4, 4), object_mask (1, P) -> rgb (1, P, 3)."""
    from ..rendering import render_forward

    model = dataclasses.replace(cfg.model, use_pallas_trace=False,
                                shard_map_trace=False)

    def render(params, uv, intrinsics, pose, object_mask):
        inputs = {"uv": uv, "intrinsics": intrinsics, "pose": pose,
                  "object_mask": object_mask}
        return render_forward(model, params, inputs,
                              training=False).rgb_values

    return render


def export_renderer(cfg, params, chunk: int = 10000,
                    platforms=("cpu", "tpu")) -> bytes:
    """Serialize the render function for a fixed ray-chunk size; the
    parameter pytree stays a call-time input (artifact is checkpoint-
    independent)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    render = make_render_fn(cfg)
    p_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        params)
    args = (p_spec,
            jax.ShapeDtypeStruct((1, chunk, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, chunk), jnp.bool_))
    exp = jexport.export(jax.jit(render), platforms=list(platforms))(*args)
    return exp.serialize()


def load_renderer(path_or_bytes):
    """Deserialize an exported renderer -> callable
    (params, uv, intrinsics, pose, object_mask) -> rgb."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jexport.deserialize(blob).call


def main(argv=None):
    ap = argparse.ArgumentParser(description="export renderer for serving")
    ap.add_argument("--out", required=True)
    ap.add_argument("--conf", default="",
                    help="HOCON config of the architecture (default: the "
                         "full-size DTU architecture)")
    ap.add_argument("--chunk", type=int, default=10000)
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--platform", default="",
                    help="jax platform to trace on (e.g. cpu)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config import MVSDFConfig
    from ..train.step import init_params

    if args.conf:
        from ..hocon import config_from_hocon
        cfg = config_from_hocon(args.conf)
    else:
        cfg = MVSDFConfig()
    params = init_params(cfg, seed=0)
    blob = export_renderer(cfg, params, chunk=args.chunk,
                           platforms=tuple(args.platforms.split(",")))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported renderer ({len(blob) / 1e6:.2f} MB, chunk "
          f"{args.chunk}, platforms {args.platforms}) -> {args.out}")


if __name__ == "__main__":
    main()
