"""Serving layer: service construction, warmup, reconstruction."""

import os

import numpy as np

from surs_tpu.config import SuRSConfig
from surs_tpu.serve import SuRSService, normalize_image


def test_normalize_image_uint8_and_mask():
    img = np.full((8, 8, 3), 255, np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 255
    out, m = normalize_image(img, mask)
    assert out.shape == (1, 8, 8, 3) and m.shape == (8, 8, 1)
    assert out[0, 0, 0, 0] == 0.0          # masked out
    assert out[0, 3, 3, 0] == 1.0          # white inside mask -> +1


def test_service_reconstruct(tmp_path, rng):
    cfg = SuRSConfig(loadSize=32, num_stack_lr=2, resolution=16,
                     num_samples=256, octree_init_resolution=8,
                     b_min=[-1.0] * 3, b_max=[1.0] * 3, use_pallas=False,
                     mask_prune=True)
    service = SuRSService(cfg, compilation_cache=False)
    wsec = service.warmup((16, 16))
    assert wsec > 0

    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:12, 4:12] = 255
    p_hr, p_lr = service.reconstruct(img, mask, "subj", str(tmp_path))
    assert os.path.exists(p_hr) and os.path.exists(p_lr)

    sdf_hr, sdf_lr = service.fields(img, mask)
    assert sdf_hr.shape == (16, 16, 16)
