#!/usr/bin/env python
"""Dataset sampling statistics.

Equivalent of the reference's standalone stat script
(lib/data/compute_points.py:20-134): runs the HR/LR containment sampling
for each subject and reports how many displacement labels flip (points
inside one mesh but not the other) — a sanity check that the HR/LR mesh
pair actually differ where expected.

  python apps/compute_points.py --dataroot ./data --num_sample_inout 6000
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--num_sample_inout", type=int, default=6000)
    ap.add_argument("--sigma", type=float, default=0.06)
    ap.add_argument("--b_min", nargs=3, type=float,
                    default=[-128.0, -28.0, -128.0])
    ap.add_argument("--b_max", nargs=3, type=float,
                    default=[128.0, 228.0, 128.0])
    ap.add_argument("--limit", type=int, default=0,
                    help="max subjects (0 = all)")
    ap.add_argument("--seed", type=int, default=1991)
    args = ap.parse_args()

    from surs_tpu.recon.mesh_io import load_obj
    from surs_tpu.data.sampling import MeshData, sample_points_and_labels

    obj_dir = os.path.join(args.dataroot, "GEO", "OBJ")
    subjects = sorted({f[:-7] for f in os.listdir(obj_dir)
                       if f.endswith("_HR.obj")})
    if args.limit:
        subjects = subjects[:args.limit]

    total_flips_in = total_flips_out = total = 0
    for subject in subjects:
        mesh_hr = MeshData(*load_obj(
            os.path.join(obj_dir, subject + "_HR.obj")))
        mesh_lr = MeshData(*load_obj(
            os.path.join(obj_dir, subject + "_LR.obj")))
        rng = np.random.default_rng(args.seed)
        out = sample_points_and_labels(
            mesh_hr, mesh_lr, args.num_sample_inout, args.sigma,
            np.asarray(args.b_min), np.asarray(args.b_max), rng)
        n = out["labels_disp"].shape[1]
        half = n // 2
        # first half of samples_LR are LR-inside; disp 0 there means the
        # point fell outside HR (erosion); disp 1 in the second half
        # means an LR-outside point is inside HR (dilation)
        flips_in = int((out["labels_disp"][0, :half] == 0).sum())
        flips_out = int((out["labels_disp"][0, half:] == 1).sum())
        total_flips_in += flips_in
        total_flips_out += flips_out
        total += n
        print(f"{subject}: LR-in/HR-out={flips_in}  "
              f"LR-out/HR-in={flips_out}  of {n}")
    if total:
        print(f"TOTAL: {total_flips_in + total_flips_out}/{total} "
              f"displaced ({100.0 * (total_flips_in + total_flips_out) / total:.2f}%)")


if __name__ == "__main__":
    main()
