"""Training loop driver.

Re-design of ``apps/train_SuRS.py:27-221``: dataset/loader construction,
optimizer selection, resume logic (including the reference's inverted
``continue_train==0`` convention, apps/train_SuRS.py:87-93), the
per-iteration loss/ETA log line, periodic checkpoint + PLY dumps, the
epoch-end LR step decay, and per-epoch test/train mesh generation.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SuRSConfig
from ..data import TrainDataset, DataLoader
from ..models import surs_net_from_config
from ..recon import gen_mesh, save_samples_truncted_prob
from .optim import make_optimizer, lr_for_epoch, set_learning_rate
from .step import create_train_state, make_train_step
from .checkpoint import CheckpointManager
from ..utils.profiling import Profiler


def batch_host_arrays(batch: Dict, quantize_images: bool = False
                      ) -> Dict[str, np.ndarray]:
    """Map dataset keys -> model kwargs as HOST numpy arrays, labels to
    [B, N, 1].

    Multi-view batches arrive as [B, V, ...]; images/calibs collapse to
    [B*V, ...] and sample points repeat per view, the equivalent of the
    reference's reshape_multiview_tensors / reshape_sample_tensor
    (lib/train_util.py:14-51).

    ``quantize_images``: ship images as uint8 — 4x less host->device
    traffic; the train steps normalize back on device. On a tunneled
    host link the f32 image upload otherwise dominates step time
    (25 MB/batch at loadSize 512). The mapping k = round(x*127) + 127
    is symmetric: EXACT at -1, 0 and +1 — masked-out background pixels
    (x = 0 after mask multiply, the majority of the image) round-trip
    with no bias, matching the eval path; everything else quantizes
    within 1/254 (a centered 127.5 scale would instead shift the whole
    background by +1/255, a systematic train/eval skew).
    """
    img_lr = np.asarray(batch["img_LR"])
    img_hr = np.asarray(batch["img_HR"])
    if quantize_images:
        img_lr = np.clip(np.rint(img_lr * 127.0) + 127.0, 0,
                         254).astype(np.uint8)
        img_hr = np.clip(np.rint(img_hr * 127.0) + 127.0, 0,
                         254).astype(np.uint8)
    calib = np.asarray(batch["calib"])
    pts_lr = np.asarray(batch["samples_LR"])
    pts_hr = np.asarray(batch["samples_HR"])
    if img_lr.ndim == 5:                     # [B, V, H, W, C]
        V = img_lr.shape[1]
        img_lr = img_lr.reshape((-1,) + img_lr.shape[2:])
        img_hr = img_hr.reshape((-1,) + img_hr.shape[2:])
        calib = calib.reshape((-1,) + calib.shape[2:])
        pts_lr = np.repeat(pts_lr, V, axis=0)
        pts_hr = np.repeat(pts_hr, V, axis=0)
    return {
        "images_lr": img_lr,
        "images_hr": img_hr,
        "points_lr": pts_lr,
        "points_hr": pts_hr,
        "calibs": calib,
        "labels_lr": np.swapaxes(batch["labels_disp"], 1, 2),
        "labels_hr": np.swapaxes(batch["labels_HR"], 1, 2),
    }


def batch_to_device(batch: Dict, quantize_images: bool = False
                    ) -> Dict[str, jnp.ndarray]:
    """batch_host_arrays shipped array-by-array (7 transfers). The train
    loop's default path instead packs the batch into one payload
    (train/pack.py, cfg.pack_h2d); this per-array form remains the API
    for callers that need device arrays directly (state init, demos,
    benches)."""
    return {k: jnp.asarray(v)
            for k, v in batch_host_arrays(batch, quantize_images).items()}


def train(cfg: SuRSConfig, max_iters: Optional[int] = None,
          yaw_list=None) -> Dict:
    """Returns a wall-time summary dict: total iterations, wall seconds,
    host data-wait seconds (loader stalls), step-enqueue seconds (NOT
    device time — the dispatch is async; wall is the honest end-to-end
    rate), and checkpoint-save seconds. Lets callers (benchmarks/
    datafed_train_bench.py) report data-fed throughput without parsing
    the log lines."""
    t_train0 = time.time()
    data_sec = net_sec = save_sec = log_sec = 0.0
    prep_sec = ply_sec = 0.0
    train_dataset = TrainDataset(cfg, phase="train", yaw_list=yaw_list)
    test_dataset = TrainDataset(cfg, phase="test", yaw_list=yaw_list)
    loader = DataLoader(train_dataset, batch_size=cfg.batch_size,
                        shuffle=not cfg.serial_batches,
                        num_threads=cfg.num_threads,
                        num_workers=cfg.num_workers, seed=cfg.seed)
    print("train data size:", len(loader))

    model = surs_net_from_config(cfg)
    optimizer = make_optimizer(cfg)

    from ..data.loader import collate
    init_batch = batch_to_device(collate([train_dataset[0]]))
    state = create_train_state(model, optimizer, jax.random.PRNGKey(cfg.seed),
                               init_batch)
    pack = bool(getattr(cfg, "pack_h2d", True))
    if (getattr(cfg, "fused_train", False) and cfg.norm != "batch"
            and cfg.num_views == 1
            and jax.default_backend() != "cpu"):
        # Opt-in (--fused_train): route the point-MLP stage through the
        # Pallas kernel (custom_vjp; gradient-parity pinned by
        # tests/test_fused_train). Default OFF — measured slower than
        # the plain XLA step at 6k/24k points (BENCH_train_scaling.json).
        # CPU and batch-norm configs always take the plain XLA step.
        from .fused_step import make_fused_train_step
        step_fn = make_fused_train_step(model, optimizer,
                                        use_pallas=cfg.use_pallas,
                                        jit=not pack)
    else:
        step_fn = make_train_step(model, optimizer, jit=not pack)
    if pack:
        # single-payload H2D: the unpack folds into the step program
        # (train/pack.py), so a data-fed step is 1 transfer + 1 enqueue
        from .pack import pack_arrays, make_packed_step
        packed_step = make_packed_step(step_fn)

    ckpt = CheckpointManager(cfg.checkpoints_path, cfg.name)
    start_epoch = 0
    if cfg.load_netG_checkpoint_path:
        mgr = CheckpointManager(*os.path.split(
            os.path.abspath(cfg.load_netG_checkpoint_path)))
        state = mgr.restore(state, None)
    if cfg.continue_train == 0:  # reference quirk: 0 means resume
        epoch = None if cfg.resume_epoch < 0 else cfg.resume_epoch
        state = ckpt.restore(state, epoch)
        start_epoch = max(cfg.resume_epoch, 0)

    os.makedirs(os.path.join(cfg.results_path, cfg.name), exist_ok=True)
    profiler = Profiler(cfg.profile_dir)
    profiler.start()

    lr = cfg.learning_rate
    iters_done = 0
    # Lagged loss logging: fetching the CURRENT step's loss would block
    # until every enqueued step drains (the host runs ahead of the
    # device by design); holding the device scalar one log period and
    # fetching the PREVIOUS log step's loss costs only the fetch-RPC
    # floor. The printed line is labelled with the step it belongs to.
    pending_log = None          # (epoch, idx, err_device, data_t, net_t)
    for epoch in range(start_epoch, cfg.num_epoch):
        epoch_start = time.time()
        new_lr = lr_for_epoch(cfg.learning_rate, epoch, cfg.schedule,
                              cfg.gamma)
        if new_lr != lr:
            lr = new_lr
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
        iter_data_t = time.time()
        for idx, raw in enumerate(loader):
            iter_start = time.time()
            data_sec += iter_start - iter_data_t
            host = batch_host_arrays(raw, quantize_images=True)
            t_prep = time.time()
            prep_sec += t_prep - iter_start
            if pack:
                payload, spec = pack_arrays(host)
                state, metrics = packed_step(state, jnp.asarray(payload),
                                             spec)
            else:
                state, metrics = step_fn(
                    state, {k: jnp.asarray(v) for k, v in host.items()})
            # only sync on the loss when logging — a per-step device
            # fetch would serialize the async dispatch pipeline
            iter_net = time.time()
            net_sec += iter_net - t_prep
            if idx % cfg.freq_plot == 0:
                t_l = time.time()
                if pending_log is not None:
                    p_epoch, p_idx, err_d, d_t, n_t = pending_log
                    err = float(err_d)          # finished long ago
                    eta = ((iter_net - epoch_start) / (idx + 1)) \
                        * len(loader) - (iter_net - epoch_start)
                    print(f"Name: {cfg.name} | Epoch: {p_epoch} | "
                          f"{p_idx}/{len(loader)} | Err: {err:.06f} | "
                          f"LR: {lr:.06f} | Sigma: {cfg.sigma:.02f} | "
                          f"dataT: {d_t:.05f} | netT: {n_t:.05f} | "
                          f"ETA: {int(eta // 60):02d}:"
                          f"{int(eta % 60):02d}")
                pending_log = (epoch, idx, metrics["total"],
                               iter_start - iter_data_t,
                               iter_net - iter_start)
                log_sec += time.time() - t_l
            if idx % cfg.freq_save == 0 and idx != 0:
                t_s = time.time()
                ckpt.save(state, epoch)
                save_sec += time.time() - t_s
            if cfg.freq_save_ply > 0 and idx % cfg.freq_save_ply == 0:
                # reference quirk preserved verbatim
                # (apps/train_SuRS.py:166-184): res_hr — the fine-MLP
                # predictions, which the model evaluates at points_LR —
                # is plotted onto the points_HR coordinates. Misleading
                # for visual QC, but it is exactly what the reference
                # dumps, and these PLYs exist for parity. Like the
                # reference, idx 0 of every epoch dumps (0 % f == 0);
                # freq_save_ply <= 0 disables the dumps entirely (the
                # pred_hr fetch below drains the dispatch pipeline, so
                # an unwanted dump costs far more than the file write).
                t_p = time.time()
                base = os.path.join(cfg.results_path, cfg.name)
                pts = np.asarray(host["points_hr"][0]).T
                save_samples_truncted_prob(
                    os.path.join(base, f"{epoch}pred.ply"), pts,
                    np.asarray(metrics["pred_hr"][0]))
                save_samples_truncted_prob(
                    os.path.join(base, f"{epoch}pred_gt.ply"), pts,
                    np.asarray(host["labels_hr"][0]))
                save_samples_truncted_prob(
                    os.path.join(base, f"{epoch}pred_lr.ply"),
                    np.asarray(host["points_lr"][0]).T,
                    np.asarray(host["labels_lr"][0]))
                ply_sec += time.time() - t_p
            iter_data_t = time.time()
            iters_done += 1
            if max_iters is not None and iters_done >= max_iters:
                t_s = time.time()
                ckpt.save(state, epoch)
                save_sec += time.time() - t_s
                profiler.stop()
                return {"iters": iters_done,
                        "wall_sec": time.time() - t_train0,
                        "data_sec": data_sec, "enqueue_sec": net_sec,
                        "save_sec": save_sec,
                        "log_sec": log_sec,
                        "prep_sec": prep_sec, "ply_sec": ply_sec}
        t_s = time.time()
        ckpt.save(state, epoch)
        save_sec += time.time() - t_s

        if not cfg.no_gen_mesh:
            # batch-norm models keep running stats outside 'params';
            # the eval-mode encode needs the full variables dict
            gen_params = (state.params if state.batch_stats is None else
                          {"params": state.params,
                           "batch_stats": state.batch_stats})
            print("generate mesh (test) ...")
            for gen_idx in range(cfg.num_gen_mesh_test):
                data = test_dataset[gen_idx]
                data = {**data, "img_LR": data["img_LR"][None]}
                save_path = os.path.join(
                    cfg.results_path, cfg.name,
                    f"test_eval_epoch{epoch}_{data['name']}.obj")
                gen_mesh(cfg, model, gen_params, data, save_path,
                         use_octree=cfg.use_octree)
            print("generate mesh (train) ...")
            train_dataset.is_train = False
            for gen_idx in range(cfg.num_gen_mesh_test):
                data = train_dataset[gen_idx]
                data = {**data, "img_LR": data["img_LR"][None]}
                save_path = os.path.join(
                    cfg.results_path, cfg.name,
                    f"train_eval_epoch{epoch}_{data['name']}.obj")
                gen_mesh(cfg, model, gen_params, data, save_path,
                         use_octree=cfg.use_octree)
            train_dataset.is_train = True
    profiler.stop()
    return {"iters": iters_done, "wall_sec": time.time() - t_train0,
            "data_sec": data_sec, "enqueue_sec": net_sec,
            "save_sec": save_sec, "log_sec": log_sec,
            "prep_sec": prep_sec, "ply_sec": ply_sec}
