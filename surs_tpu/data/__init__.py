from .calib import (AugParams, calib_from_param, extrinsic_from_param,
                    intrinsic_from_param, sample_aug_params)
from .image import process_render, load_render_mask, apply_color_jitter
from .sampling import MeshData, sample_surface, sample_points_and_labels
from .datasets import TrainDataset, EvalDataset
from .loader import DataLoader, collate

__all__ = [
    "AugParams", "calib_from_param", "extrinsic_from_param",
    "intrinsic_from_param", "sample_aug_params", "process_render",
    "load_render_mask", "apply_color_jitter", "MeshData", "sample_surface",
    "sample_points_and_labels", "TrainDataset", "EvalDataset",
    "DataLoader", "collate",
]
