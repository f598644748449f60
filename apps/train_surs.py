#!/usr/bin/env python
"""Train SuRS-TPU.

CLI-compatible with the reference's ``apps/train_SuRS.py`` flag surface:

  python apps/train_surs.py --dataroot <data> --name exp --residual \
      --random_flip --random_scale --random_trans --num_sample_inout 6000 \
      --sigma 0.06 --batch_size 2
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from surs_tpu.config import parse_config, print_config  # noqa: E402
from surs_tpu.train.loop import train  # noqa: E402


def main():
    cfg = parse_config()
    print(print_config(cfg))
    train(cfg)


if __name__ == "__main__":
    main()
