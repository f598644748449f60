"""Datasets: THuman-style training set and real-image eval set.

Re-design of ``TrainDataset_LR_v2`` (lib/data/TrainDataset_LR_v2.py:129)
and ``EvalDataset_LR_v2`` (lib/data/EvalDataset_LR_v2.py:129). Same
directory contracts:

  train: dataroot/{RENDER,MASK,PARAM}/<subject>/<yaw>_<pitch>_00.{jpg,png,npy},
         dataroot/GEO/OBJ/<subject>_{HR,LR}.obj, dataroot/val.txt
  eval:  dataroot/{image_final,mask_final}/<name>.{jpg,png}

Items are numpy dicts with NHWC images. Each __getitem__ draws its own
np.random.Generator (seeded 1991 for eval determinism, matching
lib/data/TrainDataset_LR_v2.py:358-361). Meshes are loaded lazily and
LRU-cached instead of the reference's load-everything-into-RAM
(lib/data/TrainDataset_LR_v2.py:95-102,177).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np

from ..recon.mesh_io import load_obj
from .calib import calib_from_param, sample_aug_params, AugParams
from .image import load_render_mask, process_render
from .sampling import MeshData, sample_points_and_labels


class TrainDataset:
    def __init__(self, cfg, phase: str = "train", mesh_cache: int = 8,
                 contains_fn=None, sample_cache_dir: str = None,
                 yaw_list=None):
        self.cfg = cfg
        self.is_train = phase == "train"
        self.root = cfg.dataroot
        if sample_cache_dir is None:
            default_cache = os.path.join(cfg.dataroot, "SAMPLE_CACHE")
            sample_cache_dir = default_cache if os.path.isdir(
                default_cache) else None
        self.sample_cache_dir = sample_cache_dir
        self.RENDER = os.path.join(self.root, "RENDER")
        self.MASK = os.path.join(self.root, "MASK")
        self.PARAM = os.path.join(self.root, "PARAM")
        self.OBJ = os.path.join(self.root, "GEO", "OBJ")
        # optional UV-space renders for color supervision (the THuman
        # pipeline layout the reference consumes,
        # lib/data/TrainDataset_LR_v2.py:441-494)
        self.UV_RENDER = os.path.join(self.root, "UV_RENDER")
        self.UV_MASK = os.path.join(self.root, "UV_MASK")
        self.UV_POS = os.path.join(self.root, "UV_POS")
        self.UV_NORMAL = os.path.join(self.root, "UV_NORMAL")
        self.projection_mode = "orthogonal"
        self.B_MIN = np.asarray(cfg.b_min, dtype=float)
        self.B_MAX = np.asarray(cfg.b_max, dtype=float)
        self.yaw_list = list(yaw_list) if yaw_list is not None \
            else list(range(0, 360, 1))
        self.pitch_list = [0]
        self.subjects = self._get_subjects()
        self._mesh_cache: OrderedDict = OrderedDict()
        self._mesh_cache_size = mesh_cache
        self._contains_fn = contains_fn

    def get_color_sampling(self, subject: str, yid: int, pid: int = 0,
                           rng: np.random.Generator = None):
        """Color-supervision samples from UV-space renders.

        Reference get_color_sampling (lib/data/TrainDataset_LR_v2.py:
        441-494): pick ``num_sample_color`` texels inside the UV mask,
        take their 3-D surface position (UV_POS .exr, first-party
        reader — no OpenCV/OpenEXR dependency), jitter along the texel
        normal by N(0, sigma), and pair with the texel color in
        [-1, 1]. Returns {color_samples [3, N], rgbs [3, N]}.
        """
        from PIL import Image
        from ..utils.exr import read_exr

        rng = rng or np.random.default_rng()
        yaw = self.yaw_list[yid]
        pitch = self.pitch_list[pid]
        uv_render_path = os.path.join(
            self.UV_RENDER, subject, f"{yaw}_{pitch}_00.jpg")
        uv_mask_path = os.path.join(self.UV_MASK, subject, "00.png")
        uv_pos_path = os.path.join(self.UV_POS, subject, "00.exr")
        uv_normal_path = os.path.join(self.UV_NORMAL, subject, "00.png")

        uv_mask = np.asarray(Image.open(uv_mask_path))
        if uv_mask.ndim == 3:
            uv_mask = uv_mask[..., 0]
        uv_mask = uv_mask.reshape(-1) != 0
        uv_render = np.asarray(
            Image.open(uv_render_path).convert("RGB"),
            np.float32).reshape(-1, 3) / 255.0
        uv_normal = np.asarray(
            Image.open(uv_normal_path).convert("RGB"),
            np.float32).reshape(-1, 3) / 255.0 * 2.0 - 1.0
        uv_pos = read_exr(uv_pos_path).reshape(-1, 3)

        pts = uv_pos[uv_mask]
        cols = uv_render[uv_mask]
        nrm = uv_normal[uv_mask]
        n = self.cfg.num_sample_color
        if n:
            # without replacement like the reference's random.sample
            # (TrainDataset_LR_v2.py:478) — but degrade to replacement
            # when the UV mask covers fewer texels than requested
            # instead of raising (the reference would crash there)
            sel = rng.choice(pts.shape[0], size=n,
                             replace=pts.shape[0] < n)
            pts, cols, nrm = pts[sel], cols[sel], nrm[sel]
        offset = rng.normal(0.0, self.cfg.sigma, (pts.shape[0], 1))
        samples = (pts + offset * nrm).T.astype(np.float32)
        rgbs = (2.0 * cols - 1.0).T.astype(np.float32)
        return {"color_samples": samples, "rgbs": rgbs}

    def has_uv_renders(self) -> bool:
        return os.path.isdir(self.UV_RENDER)

    def _get_subjects(self):
        all_subjects = os.listdir(self.RENDER)
        val_path = os.path.join(self.root, "val.txt")
        # explicit size gate: np.loadtxt warns ("input contained no
        # data") on the empty val.txt that synthetic datasets ship
        var_subjects = (np.loadtxt(val_path, dtype=str).reshape(-1).tolist()
                        if os.path.exists(val_path)
                        and os.path.getsize(val_path) else [])
        if not var_subjects:
            return sorted(all_subjects)
        if self.is_train:
            return sorted(set(all_subjects) - set(var_subjects))
        return sorted(var_subjects)

    def __len__(self):
        return len(self.subjects) * len(self.yaw_list) * len(self.pitch_list)

    def _mesh(self, name: str) -> MeshData:
        if name not in self._mesh_cache:
            verts, faces = load_obj(os.path.join(self.OBJ, name))
            self._mesh_cache[name] = MeshData(verts, faces)
            while len(self._mesh_cache) > self._mesh_cache_size:
                self._mesh_cache.popitem(last=False)
        self._mesh_cache.move_to_end(name)
        return self._mesh_cache[name]

    def _find(self, folder: str, subject: str, vid: int, pitch: int,
              exts=("jpg", "png")) -> str:
        for ext in exts:
            p = os.path.join(folder, subject,
                             f"{vid}_{pitch}_00.{ext}")
            if os.path.isfile(p):
                return p
        raise FileNotFoundError(f"{folder}/{subject}/{vid}_{pitch}_00")

    def get_item(self, index: int,
                 rng: Optional[np.random.Generator] = None) -> Dict:
        if rng is None or not self.is_train:
            rng = np.random.default_rng(
                None if self.is_train else self.cfg.seed)
        sid = index % len(self.subjects)
        tmp = index // len(self.subjects)
        yid = tmp % len(self.yaw_list)
        pid = tmp // len(self.yaw_list)
        subject = os.path.splitext(self.subjects[sid])[0]
        pitch = self.pitch_list[pid]

        # multi-view: ids evenly distributed around yid (reference
        # lib/data/TrainDataset_LR_v2.py:210-213)
        V = self.cfg.num_views
        n_yaw = len(self.yaw_list)
        if self.cfg.random_multiview and self.is_train:
            vids = list(rng.choice(self.yaw_list, V, replace=False))
        else:
            vids = [self.yaw_list[(yid + n_yaw // V * off) % n_yaw]
                    for off in range(V)]

        views = {k: [] for k in ("img_HR", "img_LR", "mask_HR", "mask_LR",
                                 "calib", "extrinsic")}
        S = self.cfg.loadSize
        for vid in vids:
            param = np.load(os.path.join(self.PARAM, subject,
                                         f"{vid}_{pitch}_00.npy"),
                            allow_pickle=True).item()
            render, mask = load_render_mask(
                self._find(self.RENDER, subject, vid, pitch),
                self._find(self.MASK, subject, vid, pitch,
                           exts=("png", "jpg")))
            if self.is_train:
                pad = int(0.1 * S)
                aug = sample_aug_params(rng, render.size[0] + 2 * pad,
                                        render.size[1] + 2 * pad, S,
                                        self.cfg.random_flip,
                                        self.cfg.random_scale,
                                        self.cfg.random_trans)
            else:
                aug = AugParams()
            calib, extrinsic = calib_from_param(param, S, aug)
            img_hr, img_lr, mask_hr, mask_lr = process_render(
                render, mask, S, self.is_train, aug, rng,
                self.cfg.aug_bri, self.cfg.aug_con, self.cfg.aug_sat,
                self.cfg.aug_hue, self.cfg.aug_blur)
            for k, v in (("img_HR", img_hr), ("img_LR", img_lr),
                         ("mask_HR", mask_hr), ("mask_LR", mask_lr),
                         ("calib", calib), ("extrinsic", extrinsic)):
                views[k].append(v)

        def pack(key):
            arrs = views[key]
            return arrs[0] if V == 1 else np.stack(arrs, axis=0)

        item = {
            "name": subject,
            "sid": sid, "yid": yid, "pid": pid,
            "b_min": self.B_MIN, "b_max": self.B_MAX,
            "img_HR": pack("img_HR"), "img_LR": pack("img_LR"),
            "mask_HR": pack("mask_HR"), "mask_LR": pack("mask_LR"),
            "calib": pack("calib"), "extrinsic": pack("extrinsic"),
        }
        if self.cfg.num_sample_inout:
            cached = self._load_cached_samples(subject, rng)
            if cached is not None:
                item.update(cached)
            else:
                mesh_hr = self._mesh(subject + "_HR.obj")
                mesh_lr = self._mesh(subject + "_LR.obj")
                item.update(sample_points_and_labels(
                    mesh_hr, mesh_lr, self.cfg.num_sample_inout,
                    self.cfg.sigma, self.B_MIN, self.B_MAX, rng,
                    contains_fn=self._contains_fn))
        if self.cfg.num_sample_color and self.has_uv_renders():
            # reference hook: color supervision rides the same item
            # (lib/data/TrainDataset_LR_v2.py:527-529)
            item.update(self.get_color_sampling(subject, yid, pid,
                                                rng=rng))
        return item

    def _load_cached_samples(self, subject: str,
                             rng: np.random.Generator) -> Optional[Dict]:
        """Pick a random precomputed draw (apps/precompute_samples.py)."""
        if not self.sample_cache_dir:
            return None
        # the per-subject path list is static — memoize it so the data
        # hot path doesn't re-scan the cache directory on every item
        if not hasattr(self, "_sample_cache_paths"):
            self._sample_cache_paths = {}
        paths = self._sample_cache_paths.get(subject)
        if paths is None:
            import glob
            paths = sorted(glob.glob(os.path.join(
                self.sample_cache_dir, f"{subject}_*.npz")))
            self._sample_cache_paths[subject] = paths
        if not paths:
            return None
        pick = paths[0] if not self.is_train else \
            paths[int(rng.integers(len(paths)))]
        with np.load(pick) as z:
            return {k: z[k] for k in
                    ("samples_HR", "samples_LR", "labels_HR",
                     "labels_disp")}

    def __getitem__(self, index):
        return self.get_item(index)


class EvalDataset:
    """Real-image eval set: masked LR tensor only, fixed ortho calib
    (lib/data/EvalDataset_LR_v2.py:221-254).

    Also supports the reference's single-image mode: when cfg.img_path /
    cfg.mask_path are set (lib/options.py:164-165), the dataset contains
    exactly that one image.
    """

    def __init__(self, cfg, phase: str = "test"):
        self.cfg = cfg
        self.root = cfg.dataroot
        self.RENDER = os.path.join(self.root, "image_final")
        self.MASK = os.path.join(self.root, "mask_final")
        self.projection_mode = "orthogonal"
        self.B_MIN = np.asarray(cfg.b_min, dtype=float)
        self.B_MAX = np.asarray(cfg.b_max, dtype=float)
        self.single = bool(cfg.img_path)
        if self.single:
            self.subjects = [os.path.basename(cfg.img_path)]
        else:
            self.subjects = sorted(os.listdir(self.RENDER))

    def __len__(self):
        return len(self.subjects)

    def __getitem__(self, index: int) -> Dict:
        name = os.path.splitext(self.subjects[index])[0]

        def find(folder, exts):
            for ext in exts:
                p = os.path.join(folder, f"{name}.{ext}")
                if os.path.isfile(p):
                    return p
            raise FileNotFoundError(os.path.join(folder, name))

        if self.single:
            mask_path = self.cfg.mask_path or find(self.MASK,
                                                   ("png", "jpg"))
            render, mask = load_render_mask(self.cfg.img_path, mask_path)
        else:
            render, mask = load_render_mask(
                find(self.RENDER, ("jpg", "png")),
                find(self.MASK, ("png", "jpg")))
        arr = np.asarray(render, dtype=np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        m = (np.asarray(mask, dtype=np.float32) / 255.0)[..., None]
        img_lr = (arr * m)[None]                     # [1, H, W, 3]
        calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
        return {"name": name, "img_LR": img_lr, "mask_LR": m,
                "calib": calib, "b_min": self.B_MIN,
                "b_max": self.B_MAX}
