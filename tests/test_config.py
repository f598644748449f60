"""Config system: CLI round-trip, defaults, validation."""

import pytest

from surs_tpu.config import SuRSConfig, parse_config, print_config


def test_defaults_match_reference():
    cfg = SuRSConfig()
    # spot-check reference defaults (lib/options.py)
    assert cfg.loadSize == 512
    assert cfg.resolution == 512
    assert cfg.num_sample_inout == 6000
    assert cfg.mlp_dim_lr == [321, 1024, 512, 256, 128, 1]
    assert cfg.mlp_dim_hr == [322, 1024, 512, 256, 128, 1]
    assert cfg.schedule == [60, 80]
    assert cfg.gamma == 0.1
    assert cfg.b_min == [-128.0, -28.0, -128.0]
    assert cfg.num_samples == 50000
    assert cfg.threshold == 0.05
    assert cfg.optimizer == "ADAM"


def test_cli_round_trip():
    cfg = parse_config([
        "--dataroot", "/data", "--name", "exp", "--residual",
        "--random_flip", "--sigma", "0.06", "--num_sample_inout", "6000",
        "--batch_size", "4", "--mlp_dim_lr", "321", "512", "1",
        "--schedule", "10", "20", "--b_min", "-0.5", "-0.5", "-0.5",
    ])
    assert cfg.dataroot == "/data"
    assert cfg.residual and cfg.random_flip
    assert cfg.sigma == 0.06
    assert cfg.batch_size == 4
    assert cfg.mlp_dim_lr == [321, 512, 1]
    assert cfg.schedule == [10, 20]
    assert cfg.b_min == [-0.5, -0.5, -0.5]


def test_validation_rejects_bad_config():
    with pytest.raises(AssertionError):
        SuRSConfig(optimizer="ADAGRAD").validate()
    with pytest.raises(AssertionError):
        SuRSConfig(loadSize=100).validate()


def test_print_config_marks_non_defaults():
    cfg = SuRSConfig(batch_size=7)
    out = print_config(cfg)
    line = [ln for ln in out.splitlines() if "batch_size" in ln][0]
    assert "[default: 2]" in line
