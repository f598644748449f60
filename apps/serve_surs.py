#!/usr/bin/env python
"""Serve SuRS-TPU: watch a directory, reconstruct every new image.

Loads the model once, pre-compiles, then polls ``--watch_dir`` for
``<name>.{jpg,png}`` + ``<name>_mask.png`` pairs and writes
``<name>_HR.obj`` / ``<name>_LR.obj`` into ``--results_path``.

  python apps/serve_surs.py --watch_dir ./incoming --name served \
      --load_netG_checkpoint_path ./checkpoints/exp/netG_latest \
      --resolution 512 --mask_prune

One-shot batch mode: ``--once`` processes the current directory contents
and exits.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def main():
    from surs_tpu.config import build_parser
    from surs_tpu.serve import SuRSService

    parser = build_parser()
    parser.add_argument("--watch_dir", required=True)
    parser.add_argument("--once", action="store_true")
    parser.add_argument("--poll_sec", type=float, default=1.0)
    args = parser.parse_args()
    watch_dir = args.watch_dir
    once = args.once
    poll = args.poll_sec
    from surs_tpu.config import SuRSConfig
    cfg_fields = {k: v for k, v in vars(args).items()
                  if k in SuRSConfig.__dataclass_fields__}
    cfg = SuRSConfig(**cfg_fields).validate()

    service = SuRSService(cfg)
    out_dir = os.path.join(cfg.results_path, cfg.name)
    done = set()
    print("service ready; watching", watch_dir)

    while True:
        names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(watch_dir)
            if f.lower().endswith((".jpg", ".png"))
            and not f.endswith("_mask.png"))
        fresh = [n for n in names if n not in done]

        def load(name):
            img_path = None
            for ext in ("jpg", "png"):
                p = os.path.join(watch_dir, f"{name}.{ext}")
                if os.path.isfile(p):
                    img_path = p
            mask_path = os.path.join(watch_dir, f"{name}_mask.png")
            mask = (np.asarray(Image.open(mask_path).convert("L"))
                    if os.path.isfile(mask_path) else None)
            return np.asarray(Image.open(img_path).convert("RGB")), mask

        if len(fresh) > 1:
            # batch: pipelined serving — subject i+1's device compute
            # overlaps subject i's mesh merge/OBJ writes
            t0 = time.time()
            paths = service.reconstruct_many(
                ((*load(n), n) for n in fresh), out_dir)
            dt = (time.time() - t0) / len(fresh)
            for name, pair in zip(fresh, paths):
                print(f"{name}: {dt:.2f}s/subject (pipelined) -> "
                      f"{pair[0]}", flush=True)
                done.add(name)
        else:
            for name in fresh:
                img, mask = load(name)
                t0 = time.time()
                paths = service.reconstruct(img, mask, name, out_dir)
                print(f"{name}: {time.time() - t0:.2f}s -> {paths[0]}",
                      flush=True)
                done.add(name)
        if once:
            break
        time.sleep(poll)


if __name__ == "__main__":
    main()
