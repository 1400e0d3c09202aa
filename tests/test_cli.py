"""CLI surface tests: flag defaults, YAML preset merge (reference:
main.py:146-219)."""
import os

import pytest

from lie_vae_tpu.cli.main import parse_args


def test_default_flags_match_reference():
    args = parse_args([])
    # reference defaults (main.py:146-210)
    assert args.decoder_mode == "action"
    assert args.latent_mode == "so3"
    assert args.mean_mode == "s2s2"
    assert args.batch_norm == 1
    assert args.beta == 1.0
    assert args.epochs == 100
    assert args.report_freq == 2500
    assert args.degrees == 6
    assert args.deconv_hidden == 200
    assert args.rep_copies == 10
    assert args.clip_grads == 1e-5
    assert args.elbo_samples == 1
    assert args.equivariance_end_it == 20000
    assert args.max_early_stop == 50
    assert args.normal_dims == 3
    assert args.mlp_hidden == 50
    assert args.mlp_layers == 3
    assert args.mlp_activation == "relu"
    assert args.control_p == 2
    assert args.weight_decay == 0.0
    assert args.lr == 1e-3


def test_config_preset_merge():
    # packaged preset: klx.yaml sets beta_schedule x + control 100
    args = parse_args(["--config", "klx"])
    assert args.beta_schedule == "x"
    assert args.control == 100
    # CLI still overrides merged defaults (main.py:212-219 semantics)
    args = parse_args(["--config", "klx", "--control", "7"])
    assert args.control == 7


def test_config_preset_stacking():
    args = parse_args(["--config", "normal", "reg"])
    assert args.latent_mode == "normal"
    assert args.decoder_mode == "mlp"
    assert args.equivariance == 100
    assert args.encoder_continuity == 3000


def test_config_missing_preset():
    with pytest.raises(FileNotFoundError):
        parse_args(["--config", "does-not-exist"])


def test_cwd_config_overrides_package(tmp_path, monkeypatch):
    # a config/<name>.yaml in the cwd wins over the packaged preset
    monkeypatch.chdir(tmp_path)
    os.makedirs("config")
    with open("config/klx.yaml", "w") as f:
        f.write("control: 55\n")
    args = parse_args(["--config", "klx"])
    assert args.control == 55
