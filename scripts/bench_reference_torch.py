"""MEASURE the PyTorch reference implementation on this host (CPU).

VERDICT r1 weak #7 / next-step #5: bench.py's vs_baseline compares against
an ESTIMATED 30 steps/s for the reference's original 2018 GPU. The
reference itself runs here (the parity suite already imports it), so this
script measures it directly — the BASELINE configs' steps/s on this
host's CPU (the only hardware both implementations share), giving the
comparison table one *measured* reference column next to the estimate.

It also closes VERDICT next-step #4 (Blender-parity at the pixel level):
with --train_steps N it trains the reference flagship config on THIS
repo's ray-cast spherecube renders — the reference model learning
normally from our renders (matching recon trajectory at matched step
counts, final small-scale IW-LL) demonstrates the datasets are
interchangeable at the pixels, not just the loader/label level.

External deps are stubbed exactly as in tests/test_torch_parity.py:
lie_learn's Jd tables come from this repo's generated ops/jd_tables.npz,
lie_learn's quaternion->matrix change_coordinates from the repo's own
loader math (pinned against the reference convention by
tests/test_data.py), and hyperspherical_vae with an inert import stub.

Round 3 adds a CONVERGED mode (VERDICT r2 next-step #3): `--converged`
trains config 4 with the reference's actual epoch loop — per-epoch valid
recon, best-checkpoint tracking, early stop after --early_stop stale
epochs (reference main.py:117-131 semantics) — then computes the final
n=500 importance-weighted LL (main.py:134-143; restricted to --ll_items
valid items in split order because this host is a single CPU core).
This closes BASELINE.md's "ELBO + recon MSE parity vs the PyTorch
reference" row at convergence rather than 600-step smoke scale.

Usage:
  python scripts/bench_reference_torch.py                    # 5-config steps/s
  python scripts/bench_reference_torch.py --configs 4 --train_steps 600
  python scripts/bench_reference_torch.py --configs 4 --converged \
      --epochs 300 --early_stop 50 --ll_samples 500
"""
import argparse
import json
import math
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install_stubs():
    from lie_vae_tpu.data._np_ops import quaternions_to_group_matrix_np

    dense_name = ("lie_learn.representations.SO3.pinchon_hoggan."
                  "pinchon_hoggan_dense")
    if dense_name not in sys.modules:
        tables = np.load(os.path.join(_REPO, "lie_vae_tpu", "ops",
                                      "jd_tables.npz"))
        Jd = [tables[f"J{l}"].astype(np.float64)
              for l in range(int(tables["lmax"]) + 1)]
        for name in ("lie_learn", "lie_learn.representations",
                     "lie_learn.representations.SO3",
                     "lie_learn.representations.SO3.pinchon_hoggan",
                     dense_name, "lie_learn.groups",
                     "lie_learn.groups.SO3"):
            sys.modules.setdefault(name, types.ModuleType(name))
        sys.modules[dense_name].Jd = Jd

        def change_coordinates(q, p_from, p_to):
            assert (p_from, p_to) == ("Q", "MAT"), (p_from, p_to)
            return quaternions_to_group_matrix_np(np.asarray(q))

        sys.modules["lie_learn.groups.SO3"].change_coordinates = \
            change_coordinates

    if "hyperspherical_vae_pytorch.distributions" not in sys.modules:
        hs = types.ModuleType("hyperspherical_vae_pytorch")
        hs_d = types.ModuleType("hyperspherical_vae_pytorch.distributions")

        class _Unused:
            def __init__(self, *a, **k):
                raise NotImplementedError("vmf stub")

        hs_d.VonMisesFisher = _Unused
        hs_d.HypersphericalUniform = _Unused
        sys.modules["hyperspherical_vae_pytorch"] = hs
        sys.modules["hyperspherical_vae_pytorch.distributions"] = hs_d


def build(config_name, torch):
    """Reference model + datasets for a BASELINE config (same shapes as
    scripts/run_baseline_configs.py; reference defaults from
    lie_vae/experiments/main.py:30-35,166-171)."""
    from lie_vae.experiments import datasets as ref_data
    from lie_vae.experiments.utils import random_split
    from lie_vae.experiments.vae import VAE

    common_img = dict(encode_mode="conv", deconv_mode="deconv", rgb=True,
                      degrees=6, rep_copies=10, deconv_hidden=200,
                      batch_norm=True)
    batch_size = 64

    if config_name == "1-toy-so3-ae":
        tensors = ref_data.ToyDataset.generate(n=4096, degrees=6,
                                               rep_copies=10)
        ds = ref_data.ToyDataset(tensors=tensors.tensors)
        nv = 512
        valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
        harmonics = tensors.tensors[1][0]
        model = VAE(latent_mode="so3", decoder_mode="action",
                    mean_mode="alg", encode_mode="toy", deconv_mode="toy",
                    degrees=6, rep_copies=10, deterministic=True,
                    item_rep=harmonics)
        return model, train, valid, batch_size, 0.0
    if config_name == "5-full-regularized":
        ds = ref_data.ScPairsDataset()
        nv = max(8, len(ds) // 5)
        valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
        model = VAE(latent_mode="so3", decoder_mode="action",
                    mean_mode="s2s2", **common_img)
        return model, train, valid, 32, 1.0

    ds = ref_data.SphereCubeDataset()
    nv = max(16, len(ds) // 5)
    valid, _, train = random_split(ds, [nv, nv, len(ds) - 2 * nv])
    if config_name == "2-spherecube-normal-mlp":
        model = VAE(latent_mode="normal", decoder_mode="mlp",
                    normal_dims=30, **common_img)
    elif config_name == "3-spherecube-so3-mlp":
        model = VAE(latent_mode="so3", decoder_mode="mlp",
                    mean_mode="s2s2", **common_img)
    elif config_name == "4-spherecube-so3-action":
        model = VAE(latent_mode="so3", decoder_mode="action",
                    mean_mode="s2s2", **common_img)
    else:
        raise ValueError(config_name)
    return model, train, valid, batch_size, 1.0


def loader(torch, dataset, batch_size, shuffle):
    return torch.utils.data.DataLoader(
        dataset, batch_size=batch_size, shuffle=shuffle, drop_last=shuffle,
        num_workers=0)       # single-core host: workers only add overhead


def train_step(torch, model, optimizer, batch, beta, prep, losses=None,
               it=0):
    """One reference optimizer step (unsupervised.py:72-117 semantics)."""
    batch = prep(batch)
    _, _, img = batch[0], batch[1], batch[2]
    if beta == 0.0:
        # reference beta==0 path (unsupervised.py:80-83)
        recon = model.recon_loss(model(img), img)
        loss = recon.mean()
        kl_sum = torch.zeros(())
    else:
        recon, kl_sum, kls = model.elbo(img)
        loss = (recon + beta * kl_sum).mean()
    if losses:
        # (unsupervised.py:100-106) equivariance takes (img, enc, it),
        # continuity takes (enc, it)
        encoding = model.z[0][0]
        eq_loss, cont_loss = losses
        loss = loss + eq_loss(img, encoding, it) \
                    + cont_loss(encoding, it)
    optimizer.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 1e-5)
    optimizer.step()
    return float(recon.mean()), float(kl_sum.mean())


def eval_recon(torch, model, valid, batch_size, prep):
    model.eval()
    tot, n = 0.0, 0
    with torch.no_grad():
        for batch in loader(torch, valid, batch_size, False):
            batch = prep(batch)
            img = batch[2]
            recon, _, _ = model.elbo(img)     # (n_samples, B)
            tot += float(recon.sum()) / recon.shape[0]
            n += recon.shape[1]               # items, not sample rows
    model.train()
    return tot / max(n, 1)


def iw_ll(torch, model, valid, n_items, n_samples):
    model.eval()
    vals = []
    with torch.no_grad():
        for i in range(min(n_items, len(valid))):
            _, _, img = valid[i]
            vals.append(float(model.log_likelihood(img[None], n_samples)))
    model.train()
    return float(np.mean(vals))


def _atomic_save(torch, obj, path):
    """torch.save to a temp file in the same dir, then os.replace into
    place — a kill mid-save (the host-rotation scenario this state exists
    for) can never leave a truncated .pt behind."""
    tmp = path + ".tmp"
    torch.save(obj, tmp)
    os.replace(tmp, path)


def _save_resume_state(torch, state_dir, model, optimizer):
    """Persist the LIVE training state (not just the best checkpoint) so a
    killed epoch loop continues exactly on a later host: model weights,
    Adam moments, and the torch RNG stream that drives both the DataLoader
    shuffle and the reparameterization sampling. Each file is written
    atomically; progress.json is written last (by the caller) so it only
    ever points at a complete, consistent state set."""
    _atomic_save(torch, model.state_dict(), os.path.join(state_dir, "last.pt"))
    _atomic_save(torch, optimizer.state_dict(),
                 os.path.join(state_dir, "optim.pt"))
    _atomic_save(torch, {"torch_rng": torch.get_rng_state()},
                 os.path.join(state_dir, "rng.pt"))


def _load_resume_state(torch, args, model, optimizer, best):
    """Restore a converged run left by a previous session. Returns
    (curve, stale, step, start_epoch, wall_prev, seam). Two formats:
    - resume-aware state (last.pt/optim.pt/rng.pt present): exact
      continuation — live weights, Adam moments, RNG stream.
    - best-only state (pre-resume sessions saved just best.pt): continue
      from the best weights with a fresh Adam; 'seam' records the
      discontinuity so the published table can disclose it."""
    sd = args.resume_from
    with open(os.path.join(sd, "progress.json")) as f:
        prog = json.load(f)
    curve, stale = prog["curve"], prog["stale"]
    step, start_epoch = curve[-1]["step"], curve[-1]["epoch"] + 1
    best["recon"], best["epoch"] = prog["best_recon"], prog["best_epoch"]
    best["state"] = torch.load(os.path.join(sd, "best.pt"),
                               weights_only=True)
    if os.path.exists(os.path.join(sd, "last.pt")):
        model.load_state_dict(torch.load(os.path.join(sd, "last.pt"),
                                         weights_only=True))
        optimizer.load_state_dict(torch.load(os.path.join(sd, "optim.pt"),
                                             weights_only=True))
        torch.set_rng_state(
            torch.load(os.path.join(sd, "rng.pt"),
                       weights_only=True)["torch_rng"])
        seam = prog.get("seam")    # keep any seam from an earlier resume
        best_only = False
    else:
        model.load_state_dict(best["state"])
        seam = (f"optimizer+RNG reset at epoch {start_epoch} (resumed "
                f"from a best-only state_dict)")
        best_only = True
    print(f"resuming converged run at epoch {start_epoch} "
          f"(best {best['recon']:.2f} @ {best['epoch']}, stale {stale}"
          + (f"; SEAM: {seam}" if seam else ", exact state") + ")",
          flush=True)
    return (curve, stale, step, start_epoch, prog.get("wall_s", 0.0), seam,
            best_only)


def converged_run(torch, model, train, valid, batch_size, beta, prep,
                  args):
    """Reference epoch loop to early stop (main.py:117-131): eval once per
    epoch, keep the best-valid-recon state_dict, stop after --early_stop
    epochs without improvement, then the final n=500 IW-LL
    (main.py:134-143) on both the FINAL model (reference protocol) and the
    BEST checkpoint (what our framework's eval_checkpoint.py re-evaluates),
    on the first --ll_items valid items in split order."""
    import copy

    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.r_callback = None
    dl = loader(torch, train, batch_size, True)
    steps_per_epoch = len(dl)
    best = {"recon": float("inf"), "epoch": -1, "state": None}
    curve, stale, step = [], 0, 0
    start_epoch, wall_prev, seam, best_only = 0, 0.0, None, False
    if getattr(args, "resume_from", None):
        curve, stale, step, start_epoch, wall_prev, seam, best_only = \
            _load_resume_state(torch, args, model, optimizer, best)
        with open(os.path.join(args.resume_from, "progress.json")) as f:
            want_spe = json.load(f)["steps_per_epoch"]
        if want_spe != steps_per_epoch:
            # guards against silently continuing on the wrong dataset
            # (e.g. bench.py's 256-image bootstrap render instead of the
            # run's 2048-image set after a host rotation)
            raise SystemExit(
                f"resume dataset mismatch: state has {want_spe} "
                f"steps/epoch but the current dataset yields "
                f"{steps_per_epoch} — render the run's dataset first")
        if stale > args.early_stop:
            start_epoch = args.epochs    # already early-stopped: LLs only
    # best-only state + no training to run → the "final" model would just
    # be a copy of the best checkpoint (the true final weights don't
    # exist); report its LL as None instead of a silent duplicate
    final_is_best_copy = best_only and start_epoch >= args.epochs
    t0 = time.perf_counter()
    for epoch in range(start_epoch, args.epochs):
        for batch in dl:
            train_step(torch, model, optimizer, batch, beta, prep, it=step)
            step += 1
        v = eval_recon(torch, model, valid, batch_size, prep)
        curve.append({"epoch": epoch, "step": step,
                      "valid_recon": round(v, 2)})
        if v < best["recon"]:
            best.update(recon=v, epoch=epoch,
                        state=copy.deepcopy(model.state_dict()))
            stale = 0
            if args.state_dir:
                # persist the best state + progress so a killed run (host
                # rotation, session budget) still yields the best-ckpt IW-LL
                os.makedirs(args.state_dir, exist_ok=True)
                _atomic_save(torch, best["state"],
                             os.path.join(args.state_dir, "best.pt"))
        else:
            stale += 1
        if args.state_dir:
            os.makedirs(args.state_dir, exist_ok=True)
            _save_resume_state(torch, args.state_dir, model, optimizer)
            # progress.json last + atomically: it is the resume manifest,
            # so it must only ever describe fully-written .pt files
            prog_tmp = os.path.join(args.state_dir, "progress.json.tmp")
            with open(prog_tmp, "w") as f:
                json.dump({"curve": curve, "stale": stale,
                           "best_recon": best["recon"],
                           "best_epoch": best["epoch"],
                           "steps_per_epoch": steps_per_epoch,
                           "wall_s": round(
                               wall_prev + time.perf_counter() - t0, 1),
                           "seam": seam}, f)
            os.replace(prog_tmp,
                       os.path.join(args.state_dir, "progress.json"))
        print(json.dumps({**curve[-1], "stale": stale,
                          "wall_s": round(
                              wall_prev + time.perf_counter() - t0, 1)}),
              flush=True)
        if stale > args.early_stop:
            break
    wall = wall_prev + time.perf_counter() - t0
    if final_is_best_copy:
        ll_final = None
    else:
        ll_final = round(iw_ll(torch, model, valid, args.ll_items,
                               args.ll_samples), 2)
    model.load_state_dict(best["state"])
    ll_best = iw_ll(torch, model, valid, args.ll_items, args.ll_samples)
    return {"config": "4-spherecube-so3-action (torch reference, converged)",
            "steps": step, "epochs": len(curve),
            "steps_per_epoch": steps_per_epoch,
            "best_valid_recon": round(best["recon"], 2),
            "best_epoch": best["epoch"],
            "final_valid_recon": curve[-1]["valid_recon"],
            "stale_at_stop": stale,
            "iw_ll_final": ll_final,
            "iw_ll_best_ckpt": round(ll_best, 2),
            "epoch_cap": args.epochs, "early_stop": args.early_stop,
            "ll_items": args.ll_items, "ll_samples": args.ll_samples,
            "train_wall_s": round(wall, 1), "seam": seam, "curve": curve}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*",
                   default=["1", "2", "3", "4", "5"])
    p.add_argument("--measure_steps", type=int, default=15)
    p.add_argument("--warmup_steps", type=int, default=3)
    p.add_argument("--train_steps", type=int, default=0,
                   help="extended training for pixel-parity evidence")
    p.add_argument("--converged", action="store_true",
                   help="config-4 epoch loop to early stop + n=500 IW-LL")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--early_stop", type=int, default=50)
    p.add_argument("--eval_every", type=int, default=100)
    # defaults match the published converged-compare protocol
    # (run_converged_compare.py: n=500 IW samples on the first 50 valid
    # items) so a default-flag finalize/converged run cannot publish a
    # protocol-mismatched LL under the parity caption
    p.add_argument("--ll_items", type=int, default=50)
    p.add_argument("--ll_samples", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--state_dir", default=None,
                   help="converged mode: persist best state_dict + per-"
                        "epoch progress here (crash/rotation-safe)")
    p.add_argument("--finalize_from", default=None,
                   help="compute the best-ckpt IW-LL from a --state_dir "
                        "left by a killed converged run (no training)")
    p.add_argument("--resume_from", default=None,
                   help="converged mode: continue the epoch loop from a "
                        "--state_dir left by a killed run (exact when the "
                        "state is resume-aware; best-state seam with a "
                        "fresh optimizer for pre-resume state dirs)")
    p.add_argument("--out", default=None, help="append JSON lines here")
    args = p.parse_args(argv)

    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    # Reference bug (also shimmed by tests/test_torch_parity.py:300-308):
    # VAE.decode always passes z_content (vae.py:190) but ActionNet.forward
    # only accepts angles (decoders.py:47) -> TypeError. Shim the intent.
    import lie_vae.decoders as ref_decoders
    _orig_action_fwd = ref_decoders.ActionNet.forward
    ref_decoders.ActionNet.forward = \
        lambda self, angles, content=None: _orig_action_fwd(self, angles)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    names = {c.split("-")[0]: c for c in (
        "1-toy-so3-ae", "2-spherecube-normal-mlp", "3-spherecube-so3-mlp",
        "4-spherecube-so3-action", "5-full-regularized")}

    if args.finalize_from:
        # a converged run was killed mid-training (host rotation / session
        # budget): rebuild config 4, load the persisted best state, and
        # compute the best-ckpt IW-LL from where the run left off.
        model, train, valid, batch_size, beta = build(
            "4-spherecube-so3-action", torch)
        model.r_callback = None
        with open(os.path.join(args.finalize_from, "progress.json")) as f:
            prog = json.load(f)
        model.load_state_dict(torch.load(
            os.path.join(args.finalize_from, "best.pt"),
            weights_only=True))
        ll_best = iw_ll(torch, model, valid, args.ll_items,
                        args.ll_samples)
        curve = prog["curve"]
        res = {"config": "4-spherecube-so3-action (torch reference, "
                         "converged, finalized from persisted best)",
               "steps": curve[-1]["step"], "epochs": len(curve),
               "steps_per_epoch": prog["steps_per_epoch"],
               "best_valid_recon": round(prog["best_recon"], 2),
               "best_epoch": prog["best_epoch"],
               "final_valid_recon": curve[-1]["valid_recon"],
               "iw_ll_final": None, "iw_ll_best_ckpt": round(ll_best, 2),
               "stale_at_stop": prog["stale"],
               "ll_items": args.ll_items, "ll_samples": args.ll_samples,
               "train_wall_s": prog["wall_s"], "curve": curve}
        print(json.dumps(res), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(res) + "\n")
        return

    results = {}
    for key in args.configs:
        name = names[key]
        model, train, valid, batch_size, beta = build(name, torch)
        if args.converged:
            assert key == "4", "--converged is the config-4 protocol"
            prep = getattr(train, "prep_batch",
                           getattr(train.dataset, "prep_batch",
                                   lambda b: b)) \
                if hasattr(train, "dataset") else train.prep_batch
            res = converged_run(torch, model, train, valid, batch_size,
                                beta, prep, args)
            print(json.dumps(res), flush=True)
            results[name] = res
            continue
        prep = getattr(train, "prep_batch",
                       getattr(train.dataset, "prep_batch", lambda b: b)) \
            if hasattr(train, "dataset") else train.prep_batch
        optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)
        model.r_callback = None    # reference bug: never assigned (vae.py:137)

        losses = None
        if name == "5-full-regularized":
            from lie_vae.losses.equivariance_loss import EquivarianceLoss
            from lie_vae.losses.encoder_continuity_loss import \
                EncoderContinuityLoss
            from lie_vae.experiments.utils import LinearSchedule
            losses = [EquivarianceLoss(
                          model, lamb=LinearSchedule(0, 100, 10, 1000)),
                      EncoderContinuityLoss(
                          model, lamb=LinearSchedule(0, 3000, 10, 1000))]

        dl = loader(torch, train, batch_size, True)
        it = iter(dl)

        def next_batch():
            nonlocal it
            try:
                return next(it)
            except StopIteration:
                it = iter(dl)
                return next(it)

        for _ in range(args.warmup_steps):
            train_step(torch, model, optimizer, next_batch(), beta, prep,
                       losses)
        t0 = time.perf_counter()
        for step in range(args.measure_steps):
            train_step(torch, model, optimizer, next_batch(), beta, prep,
                       losses, it=step)
        dt = time.perf_counter() - t0
        sps = args.measure_steps / dt
        res = {"config": name, "torch_cpu_steps_per_sec": round(sps, 2),
               "batch_size": batch_size, "host_cores": os.cpu_count()}
        print(json.dumps(res), flush=True)
        results[name] = res

        if args.train_steps and key == "4":
            curve = []
            t0 = time.perf_counter()
            for step in range(args.train_steps):
                recon, kl = train_step(torch, model, optimizer,
                                       next_batch(), beta, prep, losses,
                                       it=step)
                if (step + 1) % args.eval_every == 0 or \
                        step + 1 == args.train_steps:
                    v = eval_recon(torch, model, valid, batch_size, prep)
                    curve.append({"step": step + 1 + args.warmup_steps
                                  + args.measure_steps,
                                  "valid_recon": round(v, 2)})
                    print(json.dumps(curve[-1]), flush=True)
            ll = iw_ll(torch, model, valid, args.ll_items, args.ll_samples)
            res.update(train_wall_s=round(time.perf_counter() - t0, 1),
                       curve=curve,
                       iw_ll={"items": args.ll_items,
                              "samples": args.ll_samples,
                              "value": round(ll, 2)})
            print(json.dumps(res), flush=True)

    if args.out:
        with open(args.out, "a") as f:
            for r in results.values():
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
