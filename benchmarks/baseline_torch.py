#!/usr/bin/env python
"""Reference-architecture PyTorch-CPU baseline measurement.

Times the reference's inference hot loop shape — per-chunk occupancy
query: F.grid_sample over the two feature maps + the two 5-layer Conv1d
MLPs with skip concats (lib/mesh_util.py:20-28, lib/model/
SurfaceClassifier.py:45-81) — implemented here independently as a plain
functional torch program. Records queries/sec on this host's CPU; the
number is the ``vs_baseline`` denominator in bench.py (see BASELINE.md).
"""

import json
import time

import torch
import torch.nn.functional as F

torch.manual_seed(0)


def make_mlp(dims, res_layers):
    ws = []
    d0 = dims[0]
    for i in range(len(dims) - 1):
        in_dim = dims[i] + (d0 if i in res_layers else 0)
        ws.append((torch.randn(dims[i + 1], in_dim, 1) * 0.02,
                   torch.zeros(dims[i + 1])))
    return ws


def run_mlp(ws, x, res_layers):
    y = x
    tmpy = x
    for i, (w, b) in enumerate(ws):
        inp = torch.cat([y, tmpy], 1) if i in res_layers else y
        y = F.conv1d(inp, w, b)
        if i != len(ws) - 1:
            y = F.leaky_relu(y)
    return torch.sigmoid(y)


def make_nets(w_scale: float = 1.0, blur: int = 0, subject: bool = False):
    """Feature maps + both MLPs at the reference config. ``w_scale``
    scales the random init so the occupancy fields have SPATIAL
    structure (at torch's tiny default scale both sigmoids flatline at
    0.5 and the octree prunes everything in one level — an unrealistic
    floor; at w_scale >= 1 the field is near-noise and the octree
    queries >75% of the lattice — an unrealistic ceiling). Our TPU
    bench's flax-init random fields query ~1.5% of a 512^3 grid;
    measured query fractions here: 8.6% / 40% / 77% / 97% of 128^3 at
    w_scale 0.3 / 0.6 / 1.0 / 2.0, and the fraction roughly halves per
    resolution doubling — so the default 0.3 lands 512^3 in the same
    ~2% regime, keeping the sec/mesh comparison workload-matched.

    ``blur`` (odd kernel size, 0 = off) average-pools the random
    feature maps first. Raw iid feature maps yield a field that is
    white noise in uv — its 0.5-isosurface is junk with 10-40M faces
    at 256^3, so MC + OBJ-write time dwarfs any real subject's
    (~1-2M faces) and would inflate the CPU baseline. Blurring makes
    the field spatially coherent, giving real-subject-like face
    counts while keeping the query-fraction regime.

    ``subject`` composites the MLP outputs onto a smooth synthetic
    occupancy (a soft ball per field, slightly different radii like
    the reference's HR/LR pair) so the 0.5-isosurface is a single
    closed noisy-sphere SUBJECT instead of volume-filling sigmoid
    noise. The per-query COST is unchanged — both grid_samples and
    both full MLPs still run on every chunk, which is the thing being
    timed — only the field handed to the octree/MC is reshaped, so
    query counts and face counts land in a real subject's regime
    (measured: ~2% of 512^3 queried, ~1-2M faces) rather than a
    noise field's."""
    torch.manual_seed(0)
    res_layers = (2, 3, 4)
    feat_lr = torch.randn(1, 256, 128, 128)
    feat_hr = torch.randn(1, 64, 512, 512)
    if blur:
        pad = blur // 2
        feat_lr = F.avg_pool2d(F.pad(feat_lr, (pad,) * 4, mode="reflect"),
                               blur, stride=1) * blur
        feat_hr = F.avg_pool2d(F.pad(feat_hr, (pad,) * 4, mode="reflect"),
                               blur, stride=1) * blur
    mlp_lr = [(w * w_scale, b)
              for w, b in make_mlp([321, 1024, 512, 256, 128, 1],
                                   res_layers)]
    mlp_hr = [(w * w_scale, b)
              for w, b in make_mlp([322, 1024, 512, 256, 128, 1],
                                   res_layers)]

    def query_world(pts):
        """pts [3, N] world points in [-0.5, 0.5]^3 -> (hr, lr) [N].
        Applies the fixed eval calibration diag(2, -2, 2, 1) like the
        reference's query path (lib/geometry.py:4-12 + DepthNormalizer)."""
        p = torch.as_tensor(pts, dtype=torch.float32).unsqueeze(0)
        uvz = p * torch.tensor([2.0, -2.0, 2.0]).view(1, 3, 1)
        uv = uvz[:, :2, :].transpose(1, 2).unsqueeze(2)
        f1 = F.grid_sample(feat_lr, uv, align_corners=True)[:, :, :, 0]
        f2 = F.grid_sample(feat_hr, uv, align_corners=True)[:, :, :, 0]
        z = uvz[:, 2:3, :] * 256 / 200.0
        x = torch.cat([f1, f2, z], 1)
        p_lr = run_mlp(mlp_lr, x, res_layers)
        p_hr = run_mlp(mlp_hr, torch.cat([x, p_lr], 1), res_layers)
        hr = p_hr[0, 0]
        lr = p_lr[0, 0]
        if subject:
            # Soft-ball occupancy per field (slightly different radii,
            # like the reference's HR/LR pair); the MLP sigmoid rides on
            # top as +-0.1 shell noise. Cost per query is unchanged.
            d = torch.linalg.norm(p[0], dim=0)
            hr = torch.sigmoid((0.30 - d) / 0.004) + 0.2 * (hr - 0.5)
            lr = torch.sigmoid((0.28 - d) / 0.004) + 0.2 * (lr - 0.5)
        return (hr.numpy().astype("float32"),
                lr.numpy().astype("float32"))

    return query_world


def octree_eval_reference(query_world, R, chunk=50000, init_res=64,
                          threshold=0.05, stats=None):
    """Reference eval_grid_octree semantics (lib/sdf.py:55-120) on the
    CPU: full-lattice arrays, strided level views, per-chunk query
    round trips. The per-cell pruning loop is VECTORIZED here (numpy)
    where the reference runs a Python triple loop — strictly generous
    to the baseline. Returns (sdf_hr, sdf_lr [R,R,R], n_queries)."""
    import numpy as np
    b_min, b_max = -0.5, 0.5
    step = (b_max - b_min) / R
    axis = (b_min + step * np.arange(R)).astype(np.float32)
    sdf_hr = np.zeros((R, R, R), np.float32)
    sdf_lr = np.zeros((R, R, R), np.float32)
    dirty = np.ones((R, R, R), bool)
    grid_mask = np.zeros((R, R, R), bool)
    n_queries = 0
    reso = R // init_res
    t_q = t_m = 0.0
    while reso > 0:
        grid_mask[0:R:reso, 0:R:reso, 0:R:reso] = True
        test = grid_mask & dirty
        idx = np.argwhere(test)
        pts = axis[idx.T]                                   # [3, M]
        n_queries += pts.shape[1]
        import os as _os
        if _os.environ.get("MESH_VERBOSE"):
            print(f"  [level reso={reso}] {pts.shape[1]} queries "
                  f"({pts.shape[1] / (R / reso) ** 3 * 100:.1f}% of "
                  f"level lattice)", flush=True)
        t0 = time.time()
        with torch.no_grad():
            hr = np.empty(pts.shape[1], np.float32)
            lr = np.empty(pts.shape[1], np.float32)
            for c in range(0, pts.shape[1], chunk):
                h, l = query_world(pts[:, c:c + chunk])
                hr[c:c + chunk] = h
                lr[c:c + chunk] = l
        t_q += time.time() - t0
        t0 = time.time()
        sdf_hr[test] = hr
        sdf_lr[test] = lr
        dirty[test] = False
        if reso <= 1:
            break
        # vectorized reference pruning (mirrors tests/test_recon.py's
        # oracle; shared dirty mask, per-field fills)
        L = R // reso
        n = L - 1
        s_hr = sdf_hr[0:R:reso, 0:R:reso, 0:R:reso]
        s_lr = sdf_lr[0:R:reso, 0:R:reso, 0:R:reso]
        center_dirty = dirty[reso // 2::reso, reso // 2::reso,
                             reso // 2::reso][:n, :n, :n]

        def spans(v):
            vmin = np.minimum.reduce([
                v[:-1, :-1, :-1], v[:-1, :-1, 1:], v[:-1, 1:, :-1],
                v[:-1, 1:, 1:], v[1:, :-1, :-1], v[1:, :-1, 1:],
                v[1:, 1:, :-1], v[1:, 1:, 1:]])
            vmax = np.maximum.reduce([
                v[:-1, :-1, :-1], v[:-1, :-1, 1:], v[:-1, 1:, :-1],
                v[:-1, 1:, 1:], v[1:, :-1, :-1], v[1:, :-1, 1:],
                v[1:, 1:, :-1], v[1:, 1:, 1:]])
            return vmin, vmax

        for sdf, (vmin, vmax) in ((sdf_hr, spans(s_hr)),
                                  (sdf_lr, spans(s_lr))):
            fill = center_dirty & ((vmax - vmin) < threshold)
            fv = np.repeat(np.repeat(np.repeat(
                ((vmax + vmin) * 0.5), reso, 0), reso, 1), reso, 2)
            fm = np.repeat(np.repeat(np.repeat(
                fill, reso, 0), reso, 1), reso, 2)
            np.copyto(sdf[:n * reso, :n * reso, :n * reso], fv, where=fm)
            dirty[:n * reso, :n * reso, :n * reso][fm] = False
        t_m += time.time() - t0
        reso //= 2
    if stats is not None:
        stats.update(query_sec=round(t_q, 2), machinery_sec=round(t_m, 2))
    return sdf_hr, sdf_lr, n_queries


def run_mesh_baseline(R, w_scale, out, blur=0, subject=True):
    """Reference-shaped sec/mesh on this CPU: octree field evaluation
    (both fields) + isosurface extraction x2 + OBJ write x2
    (lib/mesh_util.py:8-49 + lib/sdf.py:55-120). skimage (the
    reference's marching cubes) does not ship in this environment, so
    extraction uses this repo's HOST extractor (native C++ marching
    tetrahedra) — at least as fast as skimage's Python loop, i.e.
    generous to the baseline."""
    import os
    import tempfile
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces TPU
    from surs_tpu.recon.marching import extract_isosurface
    from surs_tpu.recon.mesh_io import save_obj_mesh

    query_world = make_nets(w_scale, blur=blur, subject=subject)
    stats = {}
    t0 = time.time()
    sdf_hr, sdf_lr, nq = octree_eval_reference(query_world, R,
                                               stats=stats)
    t_eval = time.time() - t0
    t0 = time.time()
    faces_n = []
    with tempfile.TemporaryDirectory() as td:
        for tag, sdf in (("HR", sdf_hr), ("LR", sdf_lr)):
            verts, faces = extract_isosurface(sdf, 0.5)
            verts = (verts / R - 0.5).astype(np.float32)
            save_obj_mesh(os.path.join(td, f"b_{tag}.obj"), verts, faces)
            faces_n.append(int(faces.shape[0]))
    t_mesh_io = time.time() - t0
    total = t_eval + t_mesh_io
    out[f"sec_per_mesh_cpu_{R}"] = round(total, 2)
    out[f"detail_{R}"] = {
        "octree_eval_sec": round(t_eval, 2), **stats,
        "mc_and_write_sec": round(t_mesh_io, 2),
        "queries": int(nq), "faces": faces_n, "w_scale": w_scale,
        "blur": blur, "subject": subject}
    print(f"[{R}^3] eval {t_eval:.1f}s ({nq} queries; query "
          f"{stats['query_sec']}s, machinery {stats['machinery_sec']}s) "
          f"+ MC/write {t_mesh_io:.1f}s ({faces_n} faces) = {total:.1f}s",
          flush=True)


def main():
    import sys
    if "--mesh" in sys.argv:
        # end-to-end reference-shaped sec/mesh (BASELINE.json north star
        # denominator). Env: MESH_RES (csv, default "256,512"),
        # MESH_WSCALE (default 0.3), MESH_BLUR (odd kernel, 0=off),
        # MESH_SUBJECT (default 1) — see make_nets.
        import os
        import subprocess
        sys.path.insert(0, os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..")))
        out = {"source": "benchmarks/baseline_torch.py --mesh",
               "host": "1-core CPU container"}
        try:
            out["git_commit"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).stdout.strip()
        except Exception:  # noqa: BLE001
            pass
        w_scale = float(os.environ.get("MESH_WSCALE", "0.3"))
        blur = int(os.environ.get("MESH_BLUR", "0"))
        subject = os.environ.get("MESH_SUBJECT", "1") != "0"
        for R in [int(r) for r in
                  os.environ.get("MESH_RES", "256,512").split(",")]:
            run_mesh_baseline(R, w_scale, out, blur=blur, subject=subject)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_cpu_baseline.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        print(f"wrote {path}", flush=True)
        return

    chunk = 50000
    res_layers = (2, 3, 4)
    feat_lr = torch.randn(1, 256, 128, 128)
    feat_hr = torch.randn(1, 64, 512, 512)
    mlp_lr = make_mlp([321, 1024, 512, 256, 128, 1], res_layers)
    mlp_hr = make_mlp([322, 1024, 512, 256, 128, 1], res_layers)

    pts = torch.rand(1, 3, chunk) * 2 - 1

    def query():
        uv = pts[:, :2, :].transpose(1, 2).unsqueeze(2)
        f1 = F.grid_sample(feat_lr, uv, align_corners=True)[:, :, :, 0]
        f2 = F.grid_sample(feat_hr, uv, align_corners=True)[:, :, :, 0]
        z = pts[:, 2:3, :] * 256 / 200.0
        x = torch.cat([f1, f2, z], 1)
        p_lr = run_mlp(mlp_lr, x, res_layers)
        p_hr = run_mlp(mlp_hr, torch.cat([x, p_lr], 1), res_layers)
        return p_hr, p_lr

    with torch.no_grad():
        query()  # warmup
        n = 5
        t0 = time.time()
        for _ in range(n):
            query()
        dt = (time.time() - t0) / n
    qps = chunk / dt
    print(json.dumps({"torch_cpu_queries_per_sec": round(qps, 1),
                      "sec_per_50k_chunk": round(dt, 4)}))


if __name__ == "__main__":
    main()
