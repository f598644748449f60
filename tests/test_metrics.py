"""Chamfer / P2S metric tests."""

import numpy as np

from surs_tpu.utils.metrics import chamfer_distance, point_to_surface
from tests.test_data import cube_mesh


def test_chamfer_identical_mesh_is_small():
    mesh = cube_mesh(half=0.5)
    d, ab, ba = chamfer_distance(mesh, mesh, n_samples=2000)
    assert d < 0.03  # sampling noise only


def test_chamfer_scales_with_offset():
    a = cube_mesh(half=0.5)
    b = cube_mesh(half=0.5, center=(0.4, 0.0, 0.0))
    d_near, _, _ = chamfer_distance(a, b, n_samples=2000)
    c = cube_mesh(half=0.5, center=(1.5, 0.0, 0.0))
    d_far, _, _ = chamfer_distance(a, c, n_samples=2000)
    assert 0.05 < d_near < d_far


def test_point_to_surface_zero_on_surface():
    mesh = cube_mesh(half=1.0)
    pts = np.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.3]], np.float32)
    assert point_to_surface(pts, mesh, n_surface=20000) < 0.05
