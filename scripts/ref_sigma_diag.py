"""Posterior-sigma + density-shell diagnostics for the CONVERGED torch
reference checkpoint (the LL side of the bf16-vs-f32 study).

The converged-compare table shows the torch reference's n=500 IW-LL far
above every framework run's. The IW-LL of an SO(3)-latent VAE is dominated
by the converged posterior sigma (log q at the samples scales like
-3 log sigma), not by the reconstruction: a run whose sigma equilibrates
smaller pays tens of nats of log q. This script measures, on the
reference's persisted best checkpoint (scripts/bench_reference_torch.py
--converged --state_dir):

1. the posterior algebra-noise sigma stats over valid items
   (reference: N0reparameterize sigma head, reparameterize.py:117-121);
2. the n=500 IW-LL at wrapping shell counts k=10 (the reference's
   hardcoded default, reparameterize.py:208) and k=30 — a k-dependence
   means the wrapped density truncates at the checkpoint's sigma and the
   k=10 LL is biased.

Usage: python scripts/ref_sigma_diag.py --state_dir converged_state/torch \
           [--ll_items 50 --ll_samples 500 --k 10 30]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_reference_torch import REFERENCE, build, install_stubs, iw_ll


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state_dir", default="converged_state/torch")
    p.add_argument("--ll_items", type=int, default=50)
    p.add_argument("--ll_samples", type=int, default=500)
    p.add_argument("--k", type=int, nargs="+", default=[10, 30])
    p.add_argument("--out", default=None, help="append one JSON line here")
    args = p.parse_args(argv)

    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    import lie_vae.decoders as ref_decoders
    _orig = ref_decoders.ActionNet.forward
    ref_decoders.ActionNet.forward = \
        lambda self, angles, content=None: _orig(self, angles)
    torch.manual_seed(0)
    np.random.seed(0)

    model, train, valid, batch_size, beta = build("4-spherecube-so3-action",
                                                  torch)
    model.r_callback = None
    model.load_state_dict(torch.load(
        os.path.join(args.state_dir, "best.pt"), weights_only=True))
    model.eval()

    # sigma stats: run encode on valid items; the SO3 head stashes the
    # inner N0 sigma on itself (reference stateful protocol,
    # reparameterize.py:117-123)
    sigs = []
    with torch.no_grad():
        for i in range(min(256, len(valid))):
            _, _, img = valid[i]
            model.encode(img[None], n=1)
            sigs.append(model.reparameterize[0].reparameterize.sigma
                        .detach().numpy().ravel())
    sigs = np.concatenate(sigs)
    sigma = {"mean": round(float(sigs.mean()), 4),
             "median": round(float(np.median(sigs)), 4),
             "max": round(float(sigs.max()), 4)}
    qs = [5, 25, 50, 75, 95]
    sigma["log10_quantiles"] = {
        f"p{q:02d}": round(float(v), 3)
        for q, v in zip(qs, np.percentile(
            np.log10(sigs.astype(np.float64) + 1e-30), qs))}
    print(f"torch best-ckpt posterior sigma over {len(sigs)//3} items: "
          f"{sigma}", flush=True)

    lls = {}
    for k in args.k:
        model.reparameterize[0].k = k
        ll = iw_ll(torch, model, valid, args.ll_items, args.ll_samples)
        lls[str(k)] = round(ll, 2)
        print(f"torch best-ckpt IW-LL (n={args.ll_samples}, "
              f"items={args.ll_items}, density k={k}): {ll:.2f}",
              flush=True)

    # per-item LLs (k = reference default) + importance-weight
    # decomposition: E[recon], E[log q], E[log p] over the sample dim —
    # locates an LL gap (reconstruction vs posterior-density nats)
    model.reparameterize[0].k = 10
    item_lls, e_recon, e_log_q, e_log_p = [], [], [], []
    with torch.no_grad():
        for i in range(min(args.ll_items, len(valid))):
            _, _, img = valid[i]
            x = img[None]
            item_lls.append(float(model.log_likelihood(x, args.ll_samples)))
            x_rec = model.forward(x, 100)
            e_recon.append(float(model.recon_loss(x_rec, x).mean()))
            e_log_q.append(float(sum(r.log_posterior()
                                     for r in model.reparameterize).mean()))
            e_log_p.append(float(sum(r.log_prior()
                                     for r in model.reparameterize).mean()))
    item_lls = np.asarray(item_lls)
    items = {"min": round(float(item_lls.min()), 2),
             "p10": round(float(np.percentile(item_lls, 10)), 2),
             "median": round(float(np.median(item_lls)), 2),
             "p90": round(float(np.percentile(item_lls, 90)), 2),
             "max": round(float(item_lls.max()), 2)}
    decomp = {"E_recon": round(float(np.mean(e_recon)), 2),
              "E_log_q": round(float(np.mean(e_log_q)), 2),
              "E_log_p": round(float(np.mean(e_log_p)), 2)}
    print(f"torch per-item LLs: {items}", flush=True)
    print(f"torch IW decomposition: {decomp}", flush=True)

    res = {"config": "4-spherecube-so3-action (torch reference, "
                     "best-ckpt sigma/shell diagnostics)",
           "sigma_best_ckpt": sigma, "iw_ll_by_k": lls,
           "iw_ll_best_ckpt_items": items, "iw_decomp_best_ckpt": decomp,
           "ll_items": args.ll_items, "ll_samples": args.ll_samples}
    print(json.dumps(res))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
