"""Configuration for SuRS-TPU.

Replaces the reference's argparse ``BaseOptions`` (lib/options.py:5-214)
with a typed dataclass + CLI bridge. Flag names and defaults match the
reference's public surface so the README train/test command lines port
over unchanged; TPU-specific knobs live at the bottom.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


def _f(default) -> object:
    return field(default_factory=lambda: list(default))


@dataclass
class SuRSConfig:
    # ---- Data (lib/options.py:11-15) ----
    dataroot: str = "./data"
    loadSize: int = 512

    # ---- Experiment (lib/options.py:18-24) ----
    name: str = "example"
    debug: bool = False
    num_views: int = 1
    random_multiview: bool = False

    # ---- Training (lib/options.py:27-51) ----
    gpu_id: int = 0                 # accepted for CLI parity; unused on TPU
    gpu_ids: str = "0"              # accepted for CLI parity; unused on TPU
    num_threads: int = 1
    # worker PROCESSES for batch construction (the reference's DataLoader
    # num_workers analog, apps/train_SuRS.py:40-49); 0 = in-process
    num_workers: int = 0
    serial_batches: bool = False
    pin_memory: bool = False
    batch_size: int = 2
    learning_rate: float = 1e-3
    learning_rateC: float = 1e-3
    num_epoch: int = 100
    freq_plot: int = 10
    freq_save: int = 50
    freq_save_ply: int = 100
    scale: int = 2
    rgb_range: int = 255
    no_gen_mesh: bool = False
    no_num_eval: bool = False
    resume_epoch: int = -1
    continue_train: int = -1        # 0 means *do* resume (reference quirk,
                                    # apps/train_SuRS.py:87-93)

    # ---- Testing (lib/options.py:55-56) ----
    resolution: int = 512
    test_folder_path: Optional[str] = None

    # ---- Sampling (lib/options.py:60-65) ----
    sigma: float = 5.0
    num_sample_inout: int = 6000
    num_sample_color: int = 0
    z_size: float = 200.0

    # ---- Model (lib/options.py:70-101) ----
    norm: str = "group"
    norm_color: str = "instance"
    hg_depth: int = 2
    hg_dim: int = 256
    num_stack_lr: int = 3
    num_stack_hr: int = 1
    num_hourglass: int = 2
    skip_hourglass: bool = False
    hg_down: str = "ave_pool"
    hourglass_dim: int = 256
    mlp_norm: str = "group"
    mlp_dim_lr: List[int] = _f([321, 1024, 512, 256, 128, 1])
    mlp_dim_hr: List[int] = _f([322, 1024, 512, 256, 128, 1])
    mlp_dim_color: List[int] = _f([513, 1024, 512, 256, 128, 3])
    mlp_res_layers_lr: List[int] = _f([2, 3, 4])
    mlp_res_layers_hr: List[int] = _f([2, 3, 4])
    use_tanh: bool = False

    # ---- Train extras (lib/options.py:103-145) ----
    scale_pifu: float = 0.01
    random_flip: bool = False
    random_trans: bool = False
    random_scale: bool = False
    no_residual: bool = False
    schedule: List[int] = _f([60, 80])
    n_block: List[int] = _f([2, 2, 2])
    gamma: float = 0.1
    color_loss_type: str = "l1"
    losses: str = "l1"
    residual: bool = False
    mlp1: float = 1.0
    mlp2: float = 1.0
    srweight: float = 1.0
    dispweight: float = 1.0
    b_min: List[float] = _f([-128.0, -28.0, -128.0])
    b_max: List[float] = _f([128.0, 228.0, 128.0])
    disp_error: int = 1
    n_train: int = 300
    n_val: int = 60
    optimizer: str = "ADAM"         # SGD | ADAM | RMSprop | AMSgrad
    momentum: float = 0.9
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    ams: bool = False
    weight_decay: float = 0.0

    # ---- Eval (lib/options.py:147-173) ----
    val_test_error: bool = False
    val_train_error: bool = False
    gen_test_mesh: bool = False
    gen_train_mesh: bool = False
    all_mesh: bool = False
    num_gen_mesh_test: int = 1
    n_colors: int = 3
    checkpoints_path: str = "./checkpoints"
    load_netG_checkpoint_path: Optional[str] = None
    load_netC_checkpoint_path: Optional[str] = None
    results_path: str = "./results"
    load_checkpoint_path: Optional[str] = None
    single: str = ""
    mask_path: Optional[str] = None
    img_path: Optional[str] = None
    num_samples: int = 50000
    threshold: float = 0.05
    with_color: bool = False
    both_color: bool = False
    change_weights: bool = False

    # ---- Augmentation (lib/options.py:175-181) ----
    aug_alstd: float = 0.0
    aug_bri: float = 0.0
    aug_con: float = 0.0
    aug_sat: float = 0.0
    aug_hue: float = 0.0
    aug_blur: float = 0.0

    # ---- TPU-native knobs (new) ----
    # The performance knobs default to 'auto': resolved per backend at
    # CLI/service entry (resolve_backend_defaults) so a stock run takes
    # the fast paths on TPU and the simple host paths on CPU. Explicit
    # values always win (the flags are opt-OUTs).
    dtype: str = "auto"             # compute dtype for conv trunks
                                    # (params + point MLPs stay f32);
                                    # auto -> bfloat16 on TPU (MXU-rate
                                    # convs; the sampled features are
                                    # bf16-stored there anyway), float32
                                    # on CPU
    feature_dtype: str = "auto"     # storage dtype of pixel-aligned
                                    # feature maps at inference; auto ->
                                    # bfloat16 on TPU (halves gather
                                    # traffic), float32 on CPU
    mesh_axis_data: str = "data"    # device-mesh axis for batch sharding
    mesh_axis_points: str = "points"  # device-mesh axis for query sharding
    use_pallas: bool = True         # fused Pallas point-query MLP
    fused_train: bool = False       # train step queries via the Pallas
                                    # kernel (custom_vjp backward).
                                    # Default OFF: measured slower than
                                    # the plain XLA step at every point
                                    # count that compiles (BENCH_train_
                                    # scaling.json, TPU v5e: 6k 116.5 vs
                                    # 115.2 ms; 24k 248.4 vs 231.8 ms;
                                    # 96k fails remote compile in both
                                    # modes) — XLA already fuses the
                                    # MLP chain well and the custom-vjp
                                    # kernel adds bf16 re-pack traffic.
                                    # --fused_train opts in (e.g. to
                                    # re-measure on other TPU gens).
    remat: bool = False             # rematerialize the point-MLP
                                    # activations in the train step
                                    # (flax nn.remat over both
                                    # SurfaceClassifiers). The MLP hidden
                                    # activations dominate grad temps at
                                    # large num_sample_inout (~1.5 GB/
                                    # stack at 96k points batch 2); remat
                                    # trades one extra MLP forward in
                                    # backward for dropping them, which
                                    # is what lets the 96k-point step
                                    # compile on the remote TPU compiler
                                    # at all (BENCH_train_scaling.json:
                                    # plain XLA fails HTTP 500 there).
                                    # Inference is unaffected (checkpoint
                                    # is a no-op without grad).
    remat_encoder: bool = False     # additionally rematerialize the
                                    # conv trunk (SuRSSR + both
                                    # HGFilters) under grad. The encoder
                                    # activations at loadSize 512
                                    # dominate train-step HBM once the
                                    # batch grows (batch 16 is
                                    # RESOURCE_EXHAUSTED without this,
                                    # BENCH_train_scaling.json); costs
                                    # one extra encoder forward in the
                                    # backward pass. Off by default —
                                    # the reference operating point
                                    # (batch 2) doesn't need it.
    pack_h2d: bool = True           # ship each training batch as ONE
                                    # uint8 payload and unpack it inside
                                    # the jitted step (train/pack.py):
                                    # 1 transfer + 1 program enqueue per
                                    # step instead of 8. On a tunneled
                                    # TPU host the per-array enqueue
                                    # floor (~30-45 ms x 7 arrays) is
                                    # most of data-fed step overhead
                                    # (BASELINE.md round-4 anatomy); on
                                    # CPU the extra host memcpy is noise,
                                    # so the default holds everywhere and
                                    # tests exercise the shipping path.
    mask_prune: bool = True         # visual-hull octree pre-pruning.
                                    # Default ON: it only engages when
                                    # the subject ships a mask (the
                                    # EvalDataset always does), and for
                                    # a silhouette-consistent mask the
                                    # output mesh is IDENTICAL — pruned
                                    # voxels project outside the dilated
                                    # silhouette, so they are provably
                                    # outside the visual hull (pinned by
                                    # tests/test_recon.py::
                                    # test_mask_prune_mesh_parity);
                                    # measured 28% faster 512^3 eval on
                                    # the trained subject (BASELINE.md).
                                    # --no_mask_prune opts out (e.g. for
                                    # masks that may clip the subject).
    feature_pack: bool = True       # pack_bilinear'd single-gather
                                    # sampling (fused query path only;
                                    # inert off the Pallas/TPU path)
    mc_backend: str = "auto"        # isosurface extraction: 'host',
                                    # 'device' (TPU marching tets/cubes),
                                    # or 'auto' (device w/ host fallback
                                    # on TPU, host on CPU)
    mc_algorithm: str = "auto"      # device extractor tessellation:
                                    # tets (exact MT) | cubes (~3x fewer
                                    # tris, classic MC table); auto ->
                                    # cubes on TPU, tets on CPU
    octree_mode: str = "auto"       # eval CLI / gen_mesh evaluator:
                                    # hostloop | fused | mono | runs
                                    # (dirty-column-window evaluation;
                                    # falls back to mono off the
                                    # separable-calib fast path); auto
                                    # -> mono (one program) on TPU,
                                    # hostloop on CPU
    serve_octree_mode: str = "auto"  # SuRSService evaluator: same
                                    # choices/auto rule as octree_mode
    octree_init_resolution: int = 64
    use_octree: bool = True
    profile_dir: Optional[str] = None
    seed: int = 1991

    # ------------------------------------------------------------------
    @property
    def projection_mode(self) -> str:
        return "orthogonal"

    def validate(self) -> "SuRSConfig":
        assert self.optimizer in ("SGD", "ADAM", "RMSprop", "AMSgrad")
        assert self.norm in ("batch", "group")
        assert self.loadSize % 8 == 0, "loadSize must be divisible by 8"
        assert len(self.mlp_dim_lr) >= 2 and len(self.mlp_dim_hr) >= 2
        return self


_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(SuRSConfig) if f.type == "bool"
}

# backend-resolved values for the 'auto' performance knobs. On TPU,
# mc_backend stays 'auto' — extract_pair's device-with-host-fallback
# semantic (recon/pipeline.py) is the production-safe choice (noise-like
# fields can overflow the device extractor's capacity).
_AUTO_TPU = {"dtype": "bfloat16",
             "feature_dtype": "bfloat16", "octree_mode": "mono",
             "serve_octree_mode": "mono", "mc_backend": "auto",
             "mc_algorithm": "cubes"}
_AUTO_CPU = {"dtype": "float32",
             "feature_dtype": "float32", "octree_mode": "hostloop",
             "serve_octree_mode": "hostloop", "mc_backend": "host",
             "mc_algorithm": "tets"}


def resolve_auto(name: str, value: str, backend: Optional[str] = None
                 ) -> str:
    """Resolve one 'auto' knob for ``backend`` (default: the live JAX
    backend). Non-'auto' values pass through untouched."""
    if value != "auto" or name not in _AUTO_TPU:
        return value
    if backend is None:
        import jax
        backend = jax.default_backend()
    return (_AUTO_CPU if backend == "cpu" else _AUTO_TPU)[name]


def resolve_backend_defaults(cfg, backend: Optional[str] = None):
    """Return ``cfg`` with every 'auto' performance knob pinned for the
    active backend — a stock TPU run gets bf16 packed features, the mono
    octree evaluator and device marching cubes; CPU gets the host paths.
    Works on SuRSConfig (returns a new instance) or any duck-typed cfg
    (mutated in place)."""
    if backend is None:
        import jax
        backend = jax.default_backend()
    upd = {name: resolve_auto(name, getattr(cfg, name, "auto"), backend)
           for name in _AUTO_TPU}
    if dataclasses.is_dataclass(cfg):
        return dataclasses.replace(cfg, **upd)
    for name, val in upd.items():
        setattr(cfg, name, val)
    return cfg


def build_parser() -> argparse.ArgumentParser:
    """argparse parser exposing every config field as ``--name``.

    Booleans are store_true flags (argparse parity with the reference);
    list fields use nargs='+'.
    """
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    defaults = SuRSConfig()
    for f in dataclasses.fields(SuRSConfig):
        name = "--" + f.name
        default = getattr(defaults, f.name)
        if f.name in _BOOL_FIELDS:
            p.add_argument(name, action="store_true", default=default)
            if default:   # default-True bools get an opt-OUT flag
                p.add_argument("--no_" + f.name, dest=f.name,
                               action="store_false")
        elif isinstance(default, list):
            elem = type(default[0]) if default else str
            p.add_argument(name, nargs="+", type=elem, default=default)
        elif default is None:
            p.add_argument(name, type=str, default=None)
        else:
            p.add_argument(name, type=type(default), default=default)
    return p


def parse_config(argv: Optional[Sequence[str]] = None) -> SuRSConfig:
    args = build_parser().parse_args(argv)
    return SuRSConfig(**vars(args)).validate()


def print_config(cfg: SuRSConfig) -> str:
    """Human-readable dump, analogous to BaseOptions.print_options
    (lib/options.py:198-208)."""
    defaults = SuRSConfig()
    lines = ["----------------- Options ---------------"]
    for f in sorted(dataclasses.fields(SuRSConfig), key=lambda f: f.name):
        v = getattr(cfg, f.name)
        comment = ""
        if v != getattr(defaults, f.name):
            comment = f"\t[default: {getattr(defaults, f.name)}]"
        lines.append(f"{f.name:>25}: {str(v):<30}{comment}")
    lines.append("----------------- End -------------------")
    return "\n".join(lines)
