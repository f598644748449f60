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


def test_normal_error_zero_for_identical_mesh():
    from surs_tpu.utils.metrics import projected_normal_error
    mesh = cube_mesh(half=0.4)
    l2, cos = projected_normal_error(mesh, mesh, res=64)
    assert l2 < 1e-5
    assert cos > 0.999


def test_normal_error_detects_rotation():
    """A rotated copy has matching silhouette coverage but rotated
    normals — l2 grows, cosine drops below the identical-mesh value."""
    from surs_tpu.utils.metrics import projected_normal_error
    a = cube_mesh(half=0.4)
    th = np.deg2rad(30.0)
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    b = cube_mesh(half=0.4)
    b.verts = b.verts @ R.T
    l2, cos = projected_normal_error(a, b, res=64)
    assert l2 > 0.2
    assert cos < 0.98  # identical meshes score > 0.999


def test_point_to_surface_zero_on_surface():
    mesh = cube_mesh(half=1.0)
    pts = np.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.3]], np.float32)
    assert point_to_surface(pts, mesh, n_surface=20000) < 0.05
