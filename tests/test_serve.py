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


def test_service_reconstruct_many_matches_sequential(tmp_path, rng):
    """Pipelined batch serving produces byte-identical OBJs to
    sequential reconstruct calls (the pipeline only reorders work)."""
    cfg = SuRSConfig(loadSize=32, num_stack_lr=2, resolution=16,
                     num_samples=256, octree_init_resolution=8,
                     b_min=[-1.0] * 3, b_max=[1.0] * 3, use_pallas=False,
                     mask_prune=True)
    service = SuRSService(cfg, compilation_cache=False)
    items = []
    for i in range(3):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        mask = np.zeros((16, 16), np.uint8)
        mask[3:13, 3 + i:13] = 255
        items.append((img, mask, f"s{i}"))

    seq_dir = str(tmp_path / "seq")
    seq = [service.reconstruct(im, m, n, seq_dir) for im, m, n in items]
    # both pipeline modes (forced on — resolution 16 would auto-pick
    # the sequential path): writer-thread and inline finish
    for sub, thread in (("thr", True), ("pipe", False)):
        pipe_dir = str(tmp_path / sub)
        pipe = service.reconstruct_many(items, pipe_dir,
                                        pipeline=True,
                                        writer_thread=thread)
        assert len(pipe) == len(seq)
        for (sh, sl), (ph, pl) in zip(seq, pipe):
            assert os.path.basename(sh) == os.path.basename(ph)
            with open(sh, "rb") as a, open(ph, "rb") as b:
                assert a.read() == b.read()
            with open(sl, "rb") as a, open(pl, "rb") as b:
                assert a.read() == b.read()
