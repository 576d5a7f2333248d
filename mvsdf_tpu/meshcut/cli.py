"""Mesh trimming CLI.

Usage parity with the reference (``code/mesh_cut/mesh_cut.py:8-13``):
    python -m mvsdf_tpu.meshcut.cli IN.obj OUT.obj [--thresh 15 --smooth 10]
"""
from __future__ import annotations

import argparse

from ..eval.mesh import load_obj, save_obj
from .cut import trim_mesh


def main(argv=None):
    ap = argparse.ArgumentParser(description="max-flow mesh trimming")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--thresh", default="15",
                    help="0-255 confidence threshold, or 'auto' for the "
                         "Otsu data-driven split between the mesh's own "
                         "surface and junk confidence modes (robust to "
                         "indicator calibration differing from the "
                         "reference's >0.94 presumption)")
    ap.add_argument("--smooth", type=int, default=10)
    args = ap.parse_args(argv)

    verts, faces, colors = load_obj(args.input)
    if colors is None:
        raise SystemExit("input OBJ has no vertex colors "
                         "(surface-indicator confidences required)")
    thresh = args.thresh if args.thresh == "auto" else float(args.thresh)
    if thresh == "auto":
        from .cut import auto_threshold, indicator_separation
        conf = colors[faces, 0].mean(axis=1)
        t = auto_threshold(conf)
        sep = indicator_separation(conf)
        print(f"auto threshold: {t:.1f}/255 (mode gap {sep:.3f})")
        if sep < 0.1:
            print("WARNING: indicator modes are not separated — the mesh's "
                  "surface indicator looks untrained; the cut will "
                  "partition noise (consider more training or an explicit "
                  "--thresh)")
        thresh = t
    v, f, c = trim_mesh(verts, faces, colors, thresh=thresh,
                        smooth=args.smooth)
    save_obj(args.output, v, f, c)
    print(f"trimmed {len(faces) - len(f)}/{len(faces)} faces -> "
          f"{args.output}")


if __name__ == "__main__":
    main()
