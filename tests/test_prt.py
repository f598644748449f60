"""PRT (precomputed radiance transfer) shading — render/prt.py.

Pins the three contracts the reference's PRT pipeline relies on
(lib/renderer/gl/data/prt.fs evaluateH / evaluateLightingModelPRT,
prt.vs SH rotation): the Monte-Carlo transfer of an unoccluded vertex
reproduces the analytic irradiance basis, occlusion darkens transfer,
and SH rotation is exact for band-limited functions.
"""

import numpy as np
import jax.numpy as jnp

from tests.test_data import cube_mesh


def icosphere(subdiv=2, r=0.5):
    """Geodesic sphere (subdivided icosahedron), outward faces."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        mid = {}
        nf = []
        v = list(map(np.asarray, v))

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                mid[key] = len(v)
                v.append((v[a] + v[b]) / 2.0)
            return mid[key]

        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        f = np.asarray(nf, np.int64)
        v = np.asarray(v)
    v = np.asarray(v, np.float64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * r
    return v.astype(np.float32), f


def test_unoccluded_prt_matches_analytic_irradiance():
    """Convex geometry has no self-occlusion in the front hemisphere, so
    compute_prt == evaluateH(n) up to Monte-Carlo + grid error."""
    from surs_tpu.render.prt import compute_prt, irradiance_basis
    from surs_tpu.render.shading import vertex_normals

    verts, faces = icosphere(subdiv=2, r=0.5)
    prt = compute_prt(verts, faces, n_dirs=400, grid=48, n_steps=24)
    n = np.asarray(vertex_normals(jnp.asarray(verts),
                                  jnp.asarray(faces, jnp.int32)))
    H = np.asarray(irradiance_basis(jnp.asarray(n)))
    # DC term (largest, ~0.886) within a few percent; full-vector error
    # bounded by the 400-sample MC noise
    np.testing.assert_allclose(prt[:, 0], H[:, 0], rtol=0.12)
    err = np.abs(prt - H).max(axis=1)
    assert np.median(err) < 0.12, np.median(err)


def test_occlusion_darkens_transfer():
    """A vertex facing a nearby occluder loses most of its transfer."""
    from surs_tpu.render.prt import compute_prt

    # two parallel square slabs; the inner faces see each other
    half, gap = 0.5, 0.08
    a = cube_mesh(half=half)                      # occluder above
    a.verts = a.verts * np.array([1, 0.05, 1], np.float32)
    b = cube_mesh(half=half)
    b.verts = b.verts * np.array([1, 0.05, 1], np.float32)
    a_verts = a.verts + np.array([0, gap + 0.05 * half * 2, 0],
                                 np.float32)
    verts = np.concatenate([a_verts, b.verts])
    faces = np.concatenate([a.faces, b.faces + a.verts.shape[0]])
    prt = compute_prt(verts, faces, n_dirs=300, grid=64, n_steps=48)
    # top CORNERS of the LOWER slab see the upper slab over ~half their
    # hemisphere (they are edge vertices with diagonal vertex normals);
    # the upper slab's top corners see open sky at the full analytic DC
    lower_top = np.where(
        (np.arange(verts.shape[0]) >= a_verts.shape[0])
        & (verts[:, 1] > b.verts[:, 1].mean()))[0]
    assert lower_top.size > 0
    upper_top = np.where(
        (np.arange(verts.shape[0]) < a_verts.shape[0])
        & (verts[:, 1] > a_verts[:, 1].mean()))[0]
    assert prt[lower_top, 0].mean() < 0.9 * prt[upper_top, 0].mean()
    assert prt[upper_top, 0].mean() > 0.8    # near the analytic 0.886

    # direct visibility probe: from under the upper slab's center, the
    # up ray is blocked, the down ray is clear
    from surs_tpu.render.prt import voxelize_occupancy, _visibility
    occ, b_min, cell = voxelize_occupancy(verts, faces, grid=64)
    probe = np.array([[0.0, gap / 2, 0.0]], np.float32)
    dirs = jnp.asarray(np.array([[0, 1, 0], [0, -1, 0]], np.float32))
    vis = np.asarray(_visibility(
        jnp.asarray(probe), jnp.asarray(probe * 0), dirs, occ,
        jnp.asarray(b_min), jnp.asarray(1.0 / cell, jnp.float32),
        0.005, 2.0, n_steps=64))
    assert not vis[0, 0]      # up: blocked by the upper slab
    assert not vis[0, 1]      # down: blocked by the lower slab
    side = np.asarray(_visibility(
        jnp.asarray(probe), jnp.asarray(probe * 0),
        jnp.asarray(np.array([[1, 0, 0]], np.float32)), occ,
        jnp.asarray(b_min), jnp.asarray(1.0 / cell, jnp.float32),
        0.005, 2.0, n_steps=64))
    assert side[0, 0]         # sideways through the gap: clear


def test_sh_rotation_exact_for_band_limited():
    from surs_tpu.render.prt import sh_rotation_matrix, fibonacci_sphere
    from surs_tpu.render.shading import sh9_basis

    rng = np.random.default_rng(0)
    th = np.deg2rad(37.0)
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    M = sh_rotation_matrix(R)
    d = fibonacci_sphere(64)
    Y = np.asarray(sh9_basis(jnp.asarray(d)))
    Yr = np.asarray(sh9_basis(jnp.asarray(d @ R)))
    np.testing.assert_allclose(Yr, Y @ M.T, atol=1e-5)
    # rotating coefficients == evaluating the function in the rotated
    # frame: f_rot(w) = f(w @ R) has coeffs M.T @ c
    c = rng.standard_normal(9).astype(np.float32)
    np.testing.assert_allclose(Yr @ c, Y @ (M.T @ c), atol=1e-5)


def test_render_views_prt_mode_runs():
    """render_views with transfer vectors produces shaded images that
    differ from the analytic path but share the mask."""
    from surs_tpu.render.dataset_gen import render_views
    from surs_tpu.render.prt import compute_prt

    verts, faces = icosphere(subdiv=1, r=0.5)
    prt = compute_prt(verts, faces, n_dirs=128, grid=32, n_steps=16)
    out_sh = list(render_views(verts, faces, 64, [0]))
    out_prt = list(render_views(verts, faces, 64, [0], prt=prt))
    (_, rgb_a, m_a, _), (_, rgb_b, m_b, _) = out_sh[0], out_prt[0]
    np.testing.assert_array_equal(m_a, m_b)
    assert m_b.sum() > 0
    assert rgb_b[m_b > 0].mean() > 10        # actually lit
