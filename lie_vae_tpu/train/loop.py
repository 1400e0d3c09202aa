"""Training harness: jit-compiled train/eval steps with device-side metrics.

Reference: UnsupervisedExperiment, lie_vae/experiments/unsupervised.py:11-156.

TPU-first re-design:
- ONE jitted, state-donating train step containing the full computation
  (forward, KL, regularizer losses incl. the second encoder pass, clip,
  Adam) — no per-step host sync; metric scalars stay device-side async and
  are only pulled at report boundaries (the reference .item()s every step);
- schedule values (beta, regularizer lambdas) enter the step as scalar
  arguments, so schedules never recompile;
- the beta == 0 pure-reconstruction branch (unsupervised.py:80-83) is a
  where() on the traced scalar, not a Python branch;
- the NaN-KL guard (unsupervised.py:97-98) runs at report boundaries
  (RuntimeError, same message) instead of every step;
- data-parallel over a jax Mesh: batches sharded on the 'data' axis, state
  replicated; XLA inserts the gradient all-reduce over ICI.
"""
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from lie_vae_tpu.data.loader import BatchLoader
from lie_vae_tpu.losses import encoder_continuity_loss, equivariance_loss
from lie_vae_tpu.train.logging import MetricWriter
from lie_vae_tpu.train.state import TrainState, make_optimizer


class UnsupervisedExperiment:
    """Reference ctor surface: unsupervised.py:18-56 (same keyword names
    where they exist; optimizer config is passed directly instead of a
    pre-built torch optimizer)."""

    def __init__(self, *, model, train_dataset, test_dataset, beta_schedule,
                 lr=1e-3, weight_decay=0.0, elbo_samples=1, report_freq=1250,
                 clip_grads=1e-5, selective_clip=False, batch_size=64,
                 equivariance_lamb=None, encoder_continuity_lamb=None,
                 control=None, control_p=1, log=None, seed=0, mesh=None,
                 log_histograms=False, init_state=None):
        self.model = model
        self.control = control
        self.control_p = control_p
        self.beta_schedule = beta_schedule
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.elbo_samples = elbo_samples
        self.report_freq = report_freq
        self.equivariance_lamb = equivariance_lamb
        self.encoder_continuity_lamb = encoder_continuity_lamb
        self.log = log if isinstance(log, MetricWriter) else MetricWriter(log)
        self.log_histograms = log_histograms
        self.mesh = mesh
        self.best_value = np.inf

        self.train_loader = BatchLoader(
            train_dataset, batch_size, shuffle=True, drop_last=True,
            seed=seed)
        self.test_loader = BatchLoader(
            test_dataset, batch_size, shuffle=False, drop_last=False)

        self._rng = jax.random.PRNGKey(seed)

        # ---- init params from one example batch
        example = train_dataset.prep_batch(
            train_dataset.gather(np.arange(min(2, len(train_dataset)))))
        x_example = jnp.asarray(example[-1])
        if init_state is not None:
            self.state = init_state
        else:
            k_p, k_s = jax.random.split(jax.random.PRNGKey(seed + 1))
            variables = self.model.init({"params": k_p, "sample": k_s},
                                        x_example, n=1, train=True)
            tx = make_optimizer(lr=lr, weight_decay=weight_decay,
                                clip_grads=clip_grads,
                                selective_clip=selective_clip,
                                params=variables["params"])
            self.state = TrainState.create(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                tx=tx)
        self._has_bn = bool(
            jax.tree_util.tree_leaves(self.state.batch_stats))

        if mesh is not None:
            # params/state placed per the parallel rules (replicated, or
            # feature-sharded over a 'model' axis); batches shard on 'data'
            from lie_vae_tpu.parallel import shard_state
            self.state = shard_state(self.state, mesh)

        self._train_step = jax.jit(self._build_train_step(),
                                   donate_argnums=0)
        self._eval_step = jax.jit(self._build_eval_step())

    # ------------------------------------------------------------- steps

    def _variables(self, params, batch_stats):
        v = {"params": params}
        if self._has_bn:
            v["batch_stats"] = batch_stats
        return v

    def _build_train_step(self):
        model = self.model
        n = self.elbo_samples
        control, control_p = self.control, self.control_p
        use_eq = self.equivariance_lamb is not None
        use_cont = self.encoder_continuity_lamb is not None
        has_bn = self._has_bn

        def step(state, x, beta, lamb_eq, lamb_cont, rng):
            k_sample, k_eq, k_eq_enc = jax.random.split(rng, 3)

            def loss_fn(params):
                variables = self._variables(params, state.batch_stats)
                mutable = ["batch_stats"] if has_bn else []
                (recon, kl_sum, kls, stats), mut = model.apply(
                    variables, x, n=n, train=True, method="elbo",
                    rngs={"sample": k_sample}, mutable=mutable)
                mean_recon = jnp.mean(recon)
                mean_kl = jnp.mean(kl_sum)

                if control is None:
                    # loss = mean(recon + beta * kl); guard the beta == 0
                    # pure-recon path against NaN KLs (unsupervised.py:80-95)
                    loss = mean_recon + jnp.where(
                        beta != 0.0, beta * mean_kl, 0.0)
                elif control_p == 1:
                    loss = mean_recon + control * jnp.mean(
                        jnp.abs(beta - kl_sum))
                elif control_p == 2:
                    loss = mean_recon + control * jnp.mean(
                        (beta - kl_sum) ** 2)
                else:
                    raise ValueError("Wrong control p")

                metrics = {"recon": mean_recon, "kl": mean_kl,
                           "kls": tuple(jnp.mean(k) for k in kls)}
                encoding = stats[0].z[0]

                if use_eq:
                    def encode_fn(img):
                        out = model.apply(
                            variables, img, n=1, train=True,
                            method="encode", rngs={"sample": k_eq_enc},
                            mutable=mutable)
                        enc_stats = out[0] if has_bn else out
                        return enc_stats[0].z[0]

                    eq, _ = equivariance_loss(encode_fn, x, encoding, k_eq)
                    loss = loss + lamb_eq * eq
                    metrics["equivariance"] = eq
                if use_cont:
                    cont, _ = encoder_continuity_loss(encoding)
                    loss = loss + lamb_cont * cont
                    metrics["encoder_continuity"] = cont

                new_bs = mut.get("batch_stats") if has_bn else None
                return loss, (new_bs, metrics)

            (loss, (new_bs, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
            metrics["loss"] = loss
            return new_state, metrics

        return step

    def _build_eval_step(self):
        model = self.model
        n = self.elbo_samples

        def step(params, batch_stats, x, rng):
            variables = self._variables(params, batch_stats)
            recon, kl_sum, kls, _ = model.apply(
                variables, x, n=n, train=False, method="elbo",
                rngs={"sample": rng})
            return (jnp.mean(recon), jnp.mean(kl_sum),
                    tuple(jnp.mean(k) for k in kls))

        return step

    # --------------------------------------------------------------- data

    def _put(self, x):
        x = jnp.asarray(x)
        if self.mesh is not None:
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return x

    # --------------------------------------------------------------- eval

    def test(self):
        """Full pass over the validation loader; returns
        (recon, kl, *kls) means. Reference: unsupervised.py:58-67."""
        results = []
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(self.test_loader):
            x = self._put(batch[-1])
            r, k, ks = self._eval_step(self.state.params,
                                       self.state.batch_stats, x,
                                       jax.random.fold_in(rng, i))
            results.append((r, k, *ks))
        return np.mean([[float(v) for v in row] for row in results], axis=0)

    # -------------------------------------------------------------- train

    def train(self, epoch):
        """One epoch. Reference: unsupervised.py:69-156 (same reporting
        cadence, tags, and printed line)."""
        num_batches = len(self.train_loader)
        window = []      # async device scalars; synced at report time
        start = time.time()
        for it, batch in enumerate(self.train_loader):
            x = self._put(self.train_dataset.prep_batch(batch)[-1])
            global_it = epoch * num_batches + it + 1
            beta = self.beta_schedule(global_it)
            lamb_eq = (self.equivariance_lamb(global_it)
                       if self.equivariance_lamb else 0.0)
            lamb_cont = (self.encoder_continuity_lamb(global_it)
                         if self.encoder_continuity_lamb else 0.0)
            rng = jax.random.fold_in(self._rng, global_it)

            self.state, metrics = self._train_step(
                self.state, x, float(beta), float(lamb_eq),
                float(lamb_cont), rng)
            window.append(metrics)

            if (it + 1) % self.report_freq == 0 or it + 1 == num_batches:
                self._report(window, epoch, it, global_it, beta,
                             lamb_eq, lamb_cont, start)
                window = []
                start = time.time()

    def _report(self, window, epoch, it, global_it, beta, lamb_eq,
                lamb_cont, start):
        n_steps = len(window)
        train_recon = float(np.mean([float(m["recon"]) for m in window]))
        train_kl = float(np.mean([float(m["kl"]) for m in window]))

        if np.isnan(train_kl):
            raise RuntimeError("NaN KL")

        self.log.add_scalar("train_loss", train_recon + beta * train_kl,
                            global_it)
        self.log.add_scalar("train_recon", train_recon, global_it)
        self.log.add_scalar("train_kl", train_kl, global_it)
        if "equivariance" in window[-1]:
            eq = float(np.mean([float(m["equivariance"]) for m in window]))
            self.log.add_scalar("equivariance", eq, global_it)
            self.log.add_scalar("equivariance_lamb", lamb_eq, global_it)
        if "encoder_continuity" in window[-1]:
            ct = float(np.mean([float(m["encoder_continuity"])
                                for m in window]))
            self.log.add_scalar("encoder_continuity", ct, global_it)
            self.log.add_scalar("encoder_continuity_lamb", lamb_cont,
                                global_it)

        test_vals = self.test()
        test_recon, test_kl = float(test_vals[0]), float(test_vals[1])
        self.best_value = min(self.best_value, test_recon)
        self.log.add_scalar("test_loss", test_recon + beta * test_kl,
                            global_it)
        self.log.add_scalar("test_recon", test_recon, global_it)
        self.log.add_scalar("test_kl", test_kl, global_it)
        self.log.add_scalar("beta", beta, global_it)

        if self.log_histograms:
            flat = jax.tree_util.tree_leaves_with_path(self.state.params)
            for path, p in flat:
                name = "/".join(getattr(k, "key", str(k)) for k in path)
                self.log.add_histogram(name, np.asarray(p), global_it)
        self.log.flush()

        dt = (time.time() - start) / max(n_steps, 1)
        print(("Epoch {} it {} train recon {:.4f} kl {:.4f}"
               " test recon {:.4f} kl {:.4f} ({:.3f}s)")
              .format(epoch, it + 1, train_recon, train_kl,
                      test_recon, test_kl, dt))

    # ----------------------------------------------------- log-likelihood

    def log_likelihood(self, dataset, n=500, max_items=None):
        """Importance-sampled LL over a dataset, batch size 1.

        Reference: main.py:134-143 (n=500, batch 1, eval mode).
        """
        ll_fn = jax.jit(lambda params, bs, x, rng: self.model.apply(
            self._variables(params, bs), x, n=n, method="log_likelihood",
            rngs={"sample": rng}))
        loader = BatchLoader(dataset, 1, shuffle=True, drop_last=False)
        vals = []
        rng = jax.random.PRNGKey(0)
        for i, batch in enumerate(loader):
            if max_items is not None and i >= max_items:
                break
            x = self._put(dataset.prep_batch(batch)[-1])
            vals.append(ll_fn(self.state.params, self.state.batch_stats, x,
                              jax.random.fold_in(rng, i)))
        return float(np.mean([float(v) for v in vals]))
