"""Unit tests for the BENCHMARKS.md marker-section merge logic in the
sweep drivers (scripts/run_latent_matrix.py, scripts/run_paper_configs.py):
partial runs must preserve previously-written rows, keep canonical row
order, and leave the rest of the document untouched."""
import os
import sys
import types

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import run_latent_matrix as rlm
from scripts import run_paper_configs as rpc


def _args(out, **kw):
    defaults = dict(out=out, n_images=8192, epochs=240, max_early_stop=30,
                    compute_dtype="bfloat16", style="v1")
    defaults.update(kw)
    return types.SimpleNamespace(**defaults)


def test_latent_matrix_merge_preserves_rows(tmp_path):
    out = str(tmp_path / "B.md")
    with open(out, "w") as f:
        f.write("# Doc\n\npreamble\n")

    rlm.write_table(
        {"so3-s2s2-action": {"best_recon": 23.72, "ll": -90.87}},
        _args(out))
    doc1 = open(out).read()
    assert "| SO(3) latent, s2s2 mean, action decoder | 23.72 | -90.9 |" \
        in doc1
    assert doc1.startswith("# Doc\n\npreamble")

    # a later partial run with a different config keeps the old row and
    # orders rows canonically (normal3 before so3 in DESCRIPTIONS order)
    rlm.write_table(
        {"normal3-action": {"best_recon": 10.52, "ll": None}},
        _args(out))
    doc2 = open(out).read()
    assert "| SO(3) latent, s2s2 mean, action decoder | 23.72 | -90.9 |" \
        in doc2
    assert "| N(0,I) R^3 latent, action decoder | 10.52 | — |" in doc2
    rows = [l for l in doc2.splitlines() if l.startswith("| ")]
    assert rows.index("| N(0,I) R^3 latent, action decoder | 10.52 | — |") \
        < rows.index(
            "| SO(3) latent, s2s2 mean, action decoder | 23.72 | -90.9 |")
    # markers appear exactly once
    assert doc2.count(rlm.BEGIN) == 1 and doc2.count(rlm.END) == 1

    # re-running a config replaces its row rather than duplicating it
    rlm.write_table(
        {"so3-s2s2-action": {"best_recon": 22.00, "ll": -89.0}},
        _args(out))
    doc3 = open(out).read()
    assert "| SO(3) latent, s2s2 mean, action decoder | 22.00 | -89.0 |" \
        in doc3
    assert "23.72" not in doc3


def test_latent_matrix_v2_table_is_separate(tmp_path):
    """--style v2 writes its own marker section and must not clobber the
    v1 table (or vice versa)."""
    out = str(tmp_path / "B.md")
    rlm.write_table(
        {"so3-s2s2-action": {"best_recon": 23.72, "ll": -90.87}},
        _args(out))
    rlm.write_table(
        {"so3-s2s2-action": {"best_recon": 75.0, "ll": -80.1}},
        _args(out, style="v2"))
    doc = open(out).read()
    assert doc.count(rlm.BEGIN) == 1
    assert doc.count("<!-- latent-matrix-v2:begin -->") == 1
    assert "| SO(3) latent, s2s2 mean, action decoder | 23.72 | -90.9 |" \
        in doc
    assert "| SO(3) latent, s2s2 mean, action decoder | 75.00 | -80.1 |" \
        in doc
    assert "v2 high-pose-contrast style" in doc
    # updating the v1 table leaves the v2 section intact
    rlm.write_table(
        {"normal3-action": {"best_recon": 10.52, "ll": None}},
        _args(out))
    doc2 = open(out).read()
    assert "| SO(3) latent, s2s2 mean, action decoder | 75.00 | -80.1 |" \
        in doc2


def test_paper_configs_merge(tmp_path):
    out = str(tmp_path / "B.md")
    rpc.write_table(
        {"full-scpairs": {"best_recon": 30.0, "ll": -88.0, "kl": 2.5}},
        _args(out))
    rpc.write_table(
        {"klx-spherecube": {"best_recon": 25.0, "ll": None, "kl": 7.01}},
        _args(out))
    doc = open(out).read()
    assert "| 30.00 | 2.50 | -88.0 |" in doc
    assert "| 25.00 | 7.01 | — |" in doc
    assert doc.count(rpc.BEGIN) == 1 and doc.count(rpc.END) == 1


def test_seed_study_merge(tmp_path):
    from scripts import run_seed_study as rss

    out = str(tmp_path / "B.md")
    args = types.SimpleNamespace(out=out, data_dir="data/x", epochs=600,
                                 max_early_stop=50,
                                 compute_dtype="bfloat16")
    rss.write_table({0: {"best_recon": 75.0, "ll": -80.0},
                     1: {"best_recon": 76.0, "ll": -82.0}}, args)
    doc = open(out).read()
    assert "| seed 0 | 75.00 | -80.0 |" in doc
    assert "| seed 1 | 76.00 | -82.0 |" in doc
    assert "75.50 ± 0.71" in doc and "-81.0 ± 1.4" in doc
    # partial rerun preserves rows and keeps one summary
    rss.write_table({1: {"best_recon": 76.0, "ll": -82.0}}, args)
    doc2 = open(out).read()
    assert doc2.count(rss.BEGIN) == 1
    assert "| seed 1 | 76.00 | -82.0 |" in doc2


def test_r2_driver_scripts_import_and_parse():
    """The r2 chip/CPU drivers only execute on real hardware; at least pin
    that they import and their arg surfaces parse (rot guard).

    main(['--help']) runs argparse fully (a broken flag table raises
    before the SystemExit(0)) without touching jax or the chip;
    bench_sol.main takes no argv, so it is import-checked only."""
    import importlib

    for mod, has_argv in [
        ("scripts.bench_batch_sweep", True),
        ("scripts.run_pixel_parity", True),
        ("scripts.analyze_spherecube", True),
        ("scripts.profile_step", True),
        ("scripts.bench_sol", False),
        ("scripts.bench_reference_torch", True),
        ("scripts.run_degree_sweep", True),
        ("scripts.run_seed_study", True),
        ("scripts.run_beta_sweep", True),
        ("scripts.run_beta_seed_confirm", True),
        ("scripts.eval_checkpoint", True),
        ("bench", True),
    ]:
        m = importlib.import_module(mod)
        assert hasattr(m, "main")
        if has_argv:
            with pytest.raises(SystemExit) as exc:
                m.main(["--help"])
            assert exc.value.code == 0, f"{mod} --help exited {exc.value}"

    # categorizer sanity for the profile parser
    from scripts.profile_step import categorize
    assert "deconv" in categorize(
        "%fusion.1 = bf16[64,16,16,200] fusion(f32[4,4,200,200] %p)")
    assert "conv encoder" in categorize(
        "%fusion.2 = bf16[x] fusion(bf16[4,4,3,50] %w)")
    assert categorize("%while.6 = (s32[]) while(...)") == "loop / control"


def test_beta_seed_confirm_merge(tmp_path):
    from scripts import run_beta_seed_confirm as rbc

    out = str(tmp_path / "B.md")
    args = types.SimpleNamespace(out=out, data_dir="data/x", epochs=400,
                                 max_early_stop=50,
                                 compute_dtype="bfloat16",
                                 density_k=[10, 30])
    res = {
        ("beta05", 0): {"best_recon": 64.5, "final_ll": -71.5,
                        "best_ll": {10: -71.67, 30: -71.67},
                        "sigma_max": 0.021},
        ("beta05", 1): {"best_recon": 66.0, "final_ll": -73.0,
                        "best_ll": {10: -72.5, 30: -72.6},
                        "sigma_max": 0.030},
        ("beta1", 0): {"best_recon": 75.0, "final_ll": -80.1,
                       "best_ll": {10: -77.93, 30: -77.93},
                       "sigma_max": 0.027},
    }
    rbc.write_table(res, args)
    doc = open(out).read()
    assert "| β=0.5, seed 0 | 64.50 | -71.5 | -71.67 | -71.67 | 0.021 |" \
        in doc
    assert "**-72.09 ± 0.59**" in doc          # beta05 k=10 mean ± std
    assert "| β=1, seed 0 | 75.00 | -80.1 | -77.93 | -77.93 | 0.027 |" in doc
    # single beta1 seed -> no beta1 summary row
    assert "β=1 mean" not in doc
    # partial rerun preserves previously-written rows
    rbc.write_table({("beta1", 1): {"best_recon": 74.0, "final_ll": None,
                                    "best_ll": {10: -78.5, 30: -78.5},
                                    "sigma_max": None}}, args)
    doc2 = open(out).read()
    assert "| β=0.5, seed 0 | 64.50 | -71.5 | -71.67 | -71.67 | 0.021 |" \
        in doc2
    assert "| β=1, seed 1 | 74.00 | — | -78.50 | -78.50 | — |" in doc2
    assert doc2.count(rbc.BEGIN) == 1


def test_beta_sweep_merge(tmp_path):
    from scripts import run_beta_sweep as rbs

    out = str(tmp_path / "B.md")
    args = types.SimpleNamespace(out=out, data_dir="data/x", epochs=400,
                                 max_early_stop=50,
                                 compute_dtype="bfloat16")
    rbs.write_table({"beta05": {"best_recon": 65.2, "ll": -71.5},
                     "ctrl14": {"best_recon": 85.0, "ll": -86.7}}, args)
    doc = open(out).read()
    assert "| beta = 0.5 | 65.20 | -71.5 |" in doc
    assert "| KL controller, target 14 (the natural KL) | 85.00 | -86.7 |" \
        in doc
    # partial rerun preserves old rows
    rbs.write_table({"beta1": {"best_recon": 75.0, "ll": None}}, args)
    doc2 = open(out).read()
    assert "| beta = 0.5 | 65.20 | -71.5 |" in doc2
    assert "| beta = 1 (reference default) | 75.00 | — |" in doc2
    assert doc2.count(rbs.BEGIN) == 1


def test_shear_ab_partial_rerun_preserves_rows(tmp_path):
    """A recipe-only rerun (--impls recipe) must preserve the gather/shear
    A/B rows verbatim from the existing table (the r5 recipe arm lands in
    the same marker block)."""
    from scripts import run_shear_ab as rsa

    out = str(tmp_path / "B.md")
    args = types.SimpleNamespace(out=out, data_dir="data/x", epochs=400,
                                 max_early_stop=50,
                                 compute_dtype="bfloat16",
                                 density_k=[10, 30])
    res = {"best_recon": 8.97, "final_recon": 9.38, "final_kl": 12.699,
           "final_ll": -19.5, "best_ll": {10: -18.8, 30: -18.8},
           "sigma_max": 0.032}
    rsa.write_table({("shear", 0): res, ("gather", 0): dict(res)}, args)
    doc1 = open(out).read()
    assert "three-shear MXU rotation (training default) | 8.97" in doc1

    recipe = dict(res, best_recon=12.61, best_ll={10: -20.11, 30: -20.11})
    rsa.write_table({("recipe", 0): recipe}, args)
    doc2 = open(out).read()
    assert "three-shear MXU rotation (training default) | 8.97" in doc2
    assert "bilinear gather (reference semantics) | 8.97" in doc2
    assert "production recipe" in doc2 and "| 12.61 |" in doc2
    assert doc2.count(rsa.BEGIN) == 1


def test_converged_compare_merge(tmp_path):
    """--merge mode: bf16 + f32 framework JSONs + the torch converged
    JSONL land as three rows (reference first), without training."""
    import json

    from scripts import run_converged_compare as rcc

    def result(config, dtype=None, **kw):
        r = {"config": config, "epochs": 120, "steps": 2280,
             "best_valid_recon": 31.2, "best_epoch": 70,
             "final_valid_recon": 31.5, "iw_ll_best_ckpt": -85.1,
             "iw_ll_final": -85.8, "train_wall_s": 726.0}
        if dtype:
            r["compute_dtype"] = dtype
        r.update(kw)
        return r

    bf16 = str(tmp_path / "bf16.json")
    f32 = str(tmp_path / "f32.json")
    torch_out = str(tmp_path / "torch.jsonl")
    with open(bf16, "w") as f:
        json.dump(result("4 (lie_vae_tpu, converged)", "bfloat16"), f)
    with open(f32, "w") as f:
        json.dump(result("4 (lie_vae_tpu, converged)", "float32",
                         best_valid_recon=26.4, iw_ll_best_ckpt=-80.0), f)
    with open(torch_out, "w") as f:
        f.write(json.dumps({"config": "warmup, ignored"}) + "\n")
        f.write(json.dumps(result(
            "4 (torch reference, converged)",
            best_valid_recon=30.9, train_wall_s=9000.0)) + "\n")

    out = str(tmp_path / "B.md")
    with open(out, "w") as f:
        f.write("# Doc\n\npreamble\n")
    rcc.main(["--merge", bf16, f32, "--torch_json", torch_out,
              "--out", out])

    doc = open(out).read()
    rows = [l for l in doc.splitlines() if l.startswith("| ")]
    assert rows[0].split("|")[1].strip() == "implementation"
    assert "PyTorch reference (CPU, fp32)" in rows[1] and "30.9" in rows[1]
    assert "bf16 compute" in rows[2]
    assert "float32 compute" in rows[3] and "26.4 (ep 70)" in rows[3]
    assert doc.count(rcc.BEGIN) == 1
    # idempotent re-merge replaces the block in place
    rcc.main(["--merge", bf16, f32, "--torch_json", torch_out,
              "--out", out])
    assert open(out).read().count(rcc.BEGIN) == 1


def test_torch_converged_resume_round_trip(tmp_path):
    """bench_reference_torch's crash-safe state: _save_resume_state /
    _load_resume_state restore weights, Adam moments, and the torch RNG
    stream exactly (resume-aware format), and fall back to the best-only
    seam for pre-resume state dirs."""
    import json

    import torch

    from scripts import bench_reference_torch as brt

    sd = str(tmp_path / "state")
    os.makedirs(sd)
    torch.manual_seed(7)
    model = torch.nn.Linear(4, 3)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    for _ in range(3):            # give Adam non-trivial moments
        opt.zero_grad()
        model(torch.randn(8, 4)).pow(2).mean().backward()
        opt.step()
    brt._save_resume_state(torch, sd, model, opt)
    torch.save(model.state_dict(), os.path.join(sd, "best.pt"))
    with open(os.path.join(sd, "progress.json"), "w") as f:
        json.dump({"curve": [{"epoch": 4, "step": 95, "valid_recon": 31.0}],
                   "stale": 2, "best_recon": 31.0, "best_epoch": 4,
                   "steps_per_epoch": 19, "wall_s": 120.0,
                   "seam": None}, f)
    expect_next = torch.get_rng_state()     # stream position at save time

    torch.manual_seed(0)                    # perturb the global stream
    model2 = torch.nn.Linear(4, 3)
    opt2 = torch.optim.Adam(model2.parameters(), lr=1e-3)
    args = types.SimpleNamespace(resume_from=sd)
    best = {"recon": float("inf"), "epoch": -1, "state": None}
    curve, stale, step, start_epoch, wall_prev, seam, best_only = \
        brt._load_resume_state(torch, args, model2, opt2, best)
    assert (start_epoch, step, stale, wall_prev) == (5, 95, 2, 120.0)
    assert seam is None and best_only is False
    for a, b in zip(model.parameters(), model2.parameters()):
        assert torch.equal(a, b)
    s1, s2 = opt.state_dict()["state"], opt2.state_dict()["state"]
    assert all(torch.equal(s1[k]["exp_avg"], s2[k]["exp_avg"])
               for k in s1)
    assert torch.equal(torch.get_rng_state(), expect_next)

    # pre-resume format: only best.pt -> best-state seam, fresh optimizer
    for f in ("last.pt", "optim.pt", "rng.pt"):
        os.remove(os.path.join(sd, f))
    model3 = torch.nn.Linear(4, 3)
    opt3 = torch.optim.Adam(model3.parameters(), lr=1e-3)
    best3 = {"recon": float("inf"), "epoch": -1, "state": None}
    *_, seam3, best_only3 = brt._load_resume_state(torch, args, model3,
                                                   opt3, best3)
    assert "best-only" in seam3 and best_only3 is True
    for a, b in zip(model.parameters(), model3.parameters()):
        assert torch.equal(a, b)
