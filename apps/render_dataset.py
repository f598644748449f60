#!/usr/bin/env python
"""Render a training dataset (RENDER/MASK/PARAM) from GEO/OBJ meshes.

TPU-native replacement for the reference's offline OpenGL PRT rendering
step (reference README.md:27 "render the training data following PIFu";
lib/renderer/gl/*). Uses the JAX rasterizer — no GL/EGL context needed.

  python apps/render_dataset.py --dataroot ./data --loadSize 512 \
      --yaw_step 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True,
                    help="root containing GEO/OBJ/<subject>_HR.obj")
    ap.add_argument("--loadSize", type=int, default=512)
    ap.add_argument("--yaw_step", type=int, default=1)
    ap.add_argument("--patch", type=int, default=16,
                    help="rasterizer per-face patch (px)")
    ap.add_argument("--subjects", nargs="*", default=None)
    ap.add_argument("--prt", action="store_true",
                    help="shade with per-vertex precomputed radiance "
                         "transfer (the reference renderer's lighting "
                         "model) instead of analytic SH")
    ap.add_argument("--uv", action="store_true",
                    help="also render the UV-space color-supervision "
                         "layout (UV_RENDER/UV_MASK/UV_POS/UV_NORMAL, "
                         "the reference's prt_uv pass)")
    ap.add_argument("--uv_size", type=int, default=512)
    args = ap.parse_args()

    from surs_tpu.render import render_dataset, render_uv_dataset
    obj_dir = os.path.join(args.dataroot, "GEO", "OBJ")
    render_dataset(obj_dir, args.dataroot, load_size=args.loadSize,
                   yaw_step=args.yaw_step, patch=args.patch,
                   subjects=args.subjects, use_prt=args.prt)
    if args.uv:
        render_uv_dataset(obj_dir, args.dataroot, uv_size=args.uv_size,
                          yaw_step=args.yaw_step, subjects=args.subjects)


if __name__ == "__main__":
    main()
