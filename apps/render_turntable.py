#!/usr/bin/env python
"""Turntable GIF of a reconstructed OBJ (colab_util equivalent,
lib/colab_util.py:77).

  python apps/render_turntable.py result_HR.obj out.gif --frames 36
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("obj")
    ap.add_argument("gif")
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    from surs_tpu.render.turntable import turntable_gif
    turntable_gif(args.obj, args.gif, n_frames=args.frames, res=args.res)
    print("saved", args.gif)


if __name__ == "__main__":
    main()
