"""Isosurface extraction entry point (native C++ or numpy backend)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import native
from .tetra import marching_tetrahedra as _mt_numpy


def extract_isosurface(volume: np.ndarray, level: float = 0.5,
                       backend: str = "auto"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(verts [V,3] in grid coords, faces [F,3]) of ``volume == level``.

    Replaces the reference's skimage ``marching_cubes_lewiner(sdf, 0.5)``
    (lib/mesh_util.py:40,45) with the first-party marching-tetrahedra
    extractor; ``backend`` is 'native', 'numpy', or 'auto'.
    """
    if backend == "auto":
        backend = "native" if native.available() else "numpy"
    if backend == "native":
        out = native.marching_tetrahedra(np.asarray(volume), level)
        if out is not None:
            return out
    return _mt_numpy(np.asarray(volume), level)
