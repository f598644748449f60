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


def main():
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
