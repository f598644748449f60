#!/usr/bin/env python
"""Precompute training point samples + occupancy labels to disk.

The reference computes surface sampling + double mesh containment +
displacement labels inside DataLoader workers per item — its training
hot spot (lib/data/TrainDataset_LR_v2.py:357-438, SURVEY.md §3.4). This
tool runs the same sampling offline on the accelerator (winding-number
containment) and caches ``K`` independent draws per subject as .npz;
TrainDataset picks a random cached draw per epoch via
``--sample_cache_dir``.

  python apps/precompute_samples.py --dataroot ./data --num_sample_inout \
      6000 --sigma 0.06 --draws 20 --out ./data/SAMPLE_CACHE
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
    ap.add_argument("--out", default=None,
                    help="default <dataroot>/SAMPLE_CACHE")
    ap.add_argument("--num_sample_inout", type=int, default=6000)
    ap.add_argument("--sigma", type=float, default=0.06)
    ap.add_argument("--draws", type=int, default=20,
                    help="independent sample draws cached per subject")
    ap.add_argument("--b_min", nargs=3, type=float,
                    default=[-128.0, -28.0, -128.0])
    ap.add_argument("--b_max", nargs=3, type=float,
                    default=[128.0, 228.0, 128.0])
    ap.add_argument("--seed", type=int, default=1991)
    args = ap.parse_args()

    from surs_tpu.recon.mesh_io import load_obj
    from surs_tpu.data.sampling import MeshData, sample_points_and_labels

    obj_dir = os.path.join(args.dataroot, "GEO", "OBJ")
    out_dir = args.out or os.path.join(args.dataroot, "SAMPLE_CACHE")
    os.makedirs(out_dir, exist_ok=True)

    subjects = sorted({f[:-7] for f in os.listdir(obj_dir)
                       if f.endswith("_HR.obj")})
    print(f"{len(subjects)} subjects -> {out_dir}")
    for si, subject in enumerate(subjects):
        mesh_hr = MeshData(*load_obj(os.path.join(obj_dir,
                                                  subject + "_HR.obj")))
        mesh_lr = MeshData(*load_obj(os.path.join(obj_dir,
                                                  subject + "_LR.obj")))
        for d in range(args.draws):
            path = os.path.join(out_dir, f"{subject}_{d:03d}.npz")
            if os.path.exists(path):
                continue
            rng = np.random.default_rng(args.seed + d * 100003 + si)
            out = sample_points_and_labels(
                mesh_hr, mesh_lr, args.num_sample_inout, args.sigma,
                np.asarray(args.b_min), np.asarray(args.b_max), rng)
            np.savez_compressed(path, **out)
        print(f"[{si + 1}/{len(subjects)}] {subject}")


if __name__ == "__main__":
    main()
