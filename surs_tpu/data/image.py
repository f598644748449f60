"""Host-side image loading / augmentation for the data pipeline.

Numpy/PIL re-statement of the reference's render processing
(lib/data/TrainDataset_LR_v2.py:258-342): pad by 0.1*loadSize, random
flip / scale / translate+crop (geometric params supplied by calib.py so
image and intrinsics stay consistent), ColorJitter, optional blur, LR
generation by 2x downscale (mask NEAREST, RGB BICUBIC), mask
multiplication and mean/std 0.5 normalization. Tensors come back NHWC
float32 (channels last — TPU layout), not the reference's NCHW.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageOps, ImageFilter, ImageEnhance

from .calib import AugParams


def load_render_mask(render_path: str, mask_path: str
                     ) -> Tuple[Image.Image, Image.Image]:
    return (Image.open(render_path).convert("RGB"),
            Image.open(mask_path).convert("L"))


def apply_color_jitter(img: Image.Image, rng: np.random.Generator,
                       brightness: float = 0.0, contrast: float = 0.0,
                       saturation: float = 0.0, hue: float = 0.0
                       ) -> Image.Image:
    """torchvision-style ColorJitter (factor ranges [max(0,1-x), 1+x])."""
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f))
    if hue > 0:
        shift = rng.uniform(-hue, hue)

        def _hue(im, shift=shift):
            hsv = np.asarray(im.convert("HSV")).copy()
            hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                           + int(shift * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")
        ops.append(_hue)
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def process_render(render: Image.Image, mask: Image.Image, load_size: int,
                   is_train: bool, aug: Optional[AugParams],
                   rng: Optional[np.random.Generator] = None,
                   aug_bri: float = 0.0, aug_con: float = 0.0,
                   aug_sat: float = 0.0, aug_hue: float = 0.0,
                   aug_blur: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Geometric + photometric processing of one HR render.

    Returns (img_HR [2S', 2S', 3]... precisely: img_HR [S, S, 3],
    img_LR [S/2, S/2, 3], mask_HR [S, S, 1], mask_LR [S/2, S/2, 1]) where
    S = load_size; all float32, images normalized to [-1, 1] and
    mask-multiplied.
    """
    aug = aug or AugParams()
    if is_train:
        pad_size = int(0.1 * load_size)
        render = ImageOps.expand(render, pad_size, fill=0)
        mask = ImageOps.expand(mask, pad_size, fill=0)

        w, h = render.size
        th = tw = load_size

        if aug.flip:
            render = ImageOps.mirror(render)
            mask = ImageOps.mirror(mask)
        if aug.scale != 1.0:
            w = int(aug.scale * w)
            h = int(aug.scale * h)
            render = render.resize((w, h), Image.BILINEAR)
            mask = mask.resize((w, h), Image.NEAREST)

        x1 = int(round((w - tw) / 2.0)) + aug.dx
        y1 = int(round((h - th) / 2.0)) + aug.dy
        render = render.crop((x1, y1, x1 + tw, y1 + th))
        mask = mask.crop((x1, y1, x1 + tw, y1 + th))

        if rng is not None and (aug_bri or aug_con or aug_sat or aug_hue):
            render = apply_color_jitter(render, rng, aug_bri, aug_con,
                                        aug_sat, aug_hue)
        if rng is not None and aug_blur > 1e-5:
            render = render.filter(
                ImageFilter.GaussianBlur(rng.uniform(0, aug_blur)))

    # LR pair: mask NEAREST, render BICUBIC (TrainDataset_LR_v2.py:323-325)
    mask_lr_img = mask.resize(tuple(x // 2 for x in mask.size),
                              Image.NEAREST)
    render_lr_img = render.resize(tuple(x // 2 for x in render.size),
                                  Image.BICUBIC)

    def to_np(img_rgb, img_mask):
        arr = np.asarray(img_rgb, dtype=np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        m = (np.asarray(img_mask, dtype=np.float32) / 255.0)[..., None]
        return arr * m, m

    img_hr, mask_hr = to_np(render, mask)
    img_lr, mask_lr = to_np(render_lr_img, mask_lr_img)
    return img_hr, img_lr, mask_hr, mask_lr
