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


def test_data_dir_override(tmp_path):
    """--data_dir reroutes the image datasets; default keeps the
    reference's data/spherecube path."""
    import numpy as np
    from PIL import Image
    from lie_vae_tpu.cli.main import build_dataset

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        name = "{:06d}_0_{:.4f}_{:.4f}_{:.4f}_{:.4f}.png".format(i, *q)
        Image.fromarray((rng.rand(8, 8, 3) * 255).astype("uint8")).save(
            str(d / name))
    args = parse_args(["--dataset", "spherecube", "--data_dir", str(d)])
    ds, batch_size, _ = build_dataset(args)
    assert len(ds) == 4
    assert batch_size == 64
    name, g, img = ds[0]
    assert g.shape == (3, 3) and img.shape == (8, 8, 3)
