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
  lax.cond on the traced scalar (skips the KL graph, so NaN KLs cannot leak
  gradients into shared parameters), not a Python branch;
- the NaN-KL guard (unsupervised.py:97-98) runs at report boundaries
  (RuntimeError, same message) instead of every step;
- data-parallel over a jax Mesh: batches sharded on the 'data' axis, state
  replicated; XLA inserts the gradient all-reduce over ICI.
"""
import itertools
import math
import time

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
                 log_histograms=False, init_state=None, steps_per_call=1,
                 device_data=False, equivariance_rotate="shear"):
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
        # 'shear' (default): Paeth three-matmul rotation — MXU work; the
        # map_coordinates 'gather' path bit-matches the reference's
        # grid_sample but lowers to per-element gathers (~35 ms/step on
        # the regularized BASELINE config, 23x the rest of the step)
        self.equivariance_rotate = equivariance_rotate
        self.log = log if isinstance(log, MetricWriter) else MetricWriter(log)
        self.log_histograms = log_histograms
        self.mesh = mesh
        self.best_value = np.inf
        # TPU host-overhead amortization: lax.scan K optimizer steps inside
        # one jitted call (per-call dispatch to the chip costs ~10ms through
        # a tunneled runtime; K=16 makes it negligible). Schedules still
        # advance per *step* — beta/lambda enter as (K,) arrays.
        self.steps_per_call = max(1, int(steps_per_call))

        # multi-host: each process loads its contiguous slice of the
        # global batch (same seeded permutation everywhere)
        n_proc, pid = jax.process_count(), jax.process_index()
        self.train_loader = BatchLoader(
            train_dataset, batch_size, shuffle=True, drop_last=True,
            seed=seed, num_shards=n_proc, shard_index=pid)
        self.test_loader = BatchLoader(
            test_dataset, batch_size, shuffle=False, drop_last=False,
            num_shards=n_proc, shard_index=pid)

        self._rng = jax.random.PRNGKey(seed)
        # eval and IW-LL both fold small batch/chunk integers into their
        # base key, so each stream gets its own fold tag — a shared
        # PRNGKey(0) base made fold_in(base, i) bitwise-identical across
        # the two estimators (correlated MC noise). test() additionally
        # advances per call (_eval_seq) so report noise is redrawn like
        # the reference's test() (unsupervised.py:58-67) while staying
        # run-deterministic.
        self._eval_rng = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        self._ll_rng = jax.random.fold_in(jax.random.PRNGKey(seed), 2)
        self._eval_seq = 0
        # report-window metrics accumulate DEVICE-side into fixed-shape
        # (sums, count) state, updated once per dispatch group — the r1
        # design reduced the whole window in one jitted call keyed on the
        # window's pytree structure, which retraced (a remote compile,
        # seconds on this runtime) for every distinct report-window
        # composition (group count x group lengths, e.g. epoch tails).
        # The accumulator compiles once per GROUP length only — the same
        # compile classes the multi-step dispatch already has.
        self._metric_names = ["recon", "kl"]
        if equivariance_lamb is not None:
            self._metric_names.append("equivariance")
        if encoder_continuity_lamb is not None:
            self._metric_names.append("encoder_continuity")
        # SO(3) posterior-drift monitor: the k-shell wrapped density is only
        # valid while the algebra Gaussian's mass fits inside the wrapping
        # window |v| <= 2*pi*k; once sigma grows past ~pi*k/2 (4 sigma to
        # the window edge) log q is systematically underestimated, the
        # reported MC KL can go NEGATIVE and IW-LL inflates (measured on
        # the 32k flagship run — BENCHMARKS '32k renders' section). Track
        # the window-mean of the per-step max sigma and warn at reports.
        self._monitor_sigma = getattr(model, "latent_mode", None) == "so3"
        if self._monitor_sigma:
            self._metric_names.append("sigma_max")
            self._sigma_valid_bound = (
                math.pi * getattr(model, "density_k", 10) / 2.0)
        names = tuple(self._metric_names)
        self._win_acc_update = jax.jit(
            lambda sums, count, metrics: (
                sums + jnp.stack([jnp.sum(metrics[n]) for n in names]),
                count + jnp.shape(metrics[names[0]])[0]))
        self._reset_window()
        self._ll_jit_cache = {}   # (n_chunk, chunks, n_eff) -> jitted ll

        # ---- init params from one example batch
        example = train_dataset.prep_batch(
            train_dataset.gather(np.arange(min(2, len(train_dataset)))))
        x_example = self._normalize(jnp.asarray(example[-1]))
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

        self._multi_step = jax.jit(self._build_multi_step(),
                                   donate_argnums=0)
        self._eval_pass = jax.jit(
            self._build_eval_pass(n_proc=jax.process_count()))

        # device-resident dataset cache: for datasets that fit on chip
        # (uint8 images; e.g. 2048 spherecube images = 25 MB), batches are
        # gathered on-device from index arrays — zero per-step host->chip
        # image traffic. Supports identity and pair-flattening prep_batch.
        # Multi-host: every process decodes the dataset and replicates it
        # on its local devices; index batches are then GLOBAL (identical
        # on every process — same seeded permutation), and the on-device
        # gather + the 'data' sharding constraint split each batch over
        # the global mesh with no cross-host image traffic at all.
        self._device_train = self._device_test = None
        if device_data:
            if n_proc > 1:
                self._train_idx_loader = BatchLoader(
                    train_dataset, batch_size, shuffle=True, drop_last=True,
                    seed=seed)
                self._test_idx_loader = BatchLoader(
                    test_dataset, batch_size, shuffle=False, drop_last=False)
            else:
                self._train_idx_loader = self.train_loader
                self._test_idx_loader = self.test_loader
            self._device_train = self._cache_device(train_dataset)
            self._device_test = (self._device_train
                                 if test_dataset is train_dataset
                                 else self._cache_device(test_dataset))
            self._multi_step_idx = jax.jit(
                self._build_multi_step(indexed=True), donate_argnums=0)
            self._eval_pass_idx = jax.jit(
                self._build_eval_pass(indexed=True))

    def _cache_device(self, dataset):
        """Returns (device_images, rows_per_item). Multi-host: every
        process decodes the full dataset (the persistent disk cache makes
        repeat startups one bulk read) and replicates it on its local
        devices — HBM cost is the uint8 dataset per device (32k 64x64 RGB
        ≈ 400 MB), in exchange for zero per-step host->chip image traffic
        on every host."""
        warm = getattr(dataset, "warm_cache", None)
        if warm is not None:
            warm()   # bulk-load / create the persistent decode cache
        batch = dataset.gather(np.arange(len(dataset)))
        imgs = np.asarray(dataset.prep_batch(batch)[-1])
        assert imgs.shape[0] % len(dataset) == 0, \
            "device_data needs prep_batch to keep an integer rows-per-item"
        factor = imgs.shape[0] // len(dataset)
        data = self._put(jnp.asarray(imgs), replicate=True)
        return data, factor

    def _expand_item_indices(self, idx, factor):
        if factor == 1:
            return np.asarray(idx, np.int32)
        return (np.asarray(idx, np.int64)[:, None] * factor
                + np.arange(factor)).reshape(-1).astype(np.int32)

    def _constrain_batch(self, x):
        if self.mesh is not None:
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))
        return x

    # ------------------------------------------------------------- steps

    @staticmethod
    def _normalize(x):
        # image datasets ship uint8 batches (4x less host->device traffic);
        # normalize on device
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x

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
            x = self._normalize(x)
            k_sample, k_eq, k_eq_enc = jax.random.split(rng, 3)

            def loss_fn(params):
                variables = self._variables(params, state.batch_stats)
                mutable = ["batch_stats"] if has_bn else []
                (x_recon, stats), mut = model.apply(
                    variables, x, n=n, train=True,
                    rngs={"sample": k_sample}, mutable=mutable)
                recon = model.recon_loss(x_recon, x)
                mean_recon = jnp.mean(recon)

                # beta == 0 -> pure-recon path with the KL graph genuinely
                # skipped (lax.cond), mirroring the reference's Python branch
                # (unsupervised.py:80-95): a where() on the loss value alone
                # would still leak NaN KL *gradients* into shared params.
                def with_kl(_):
                    kls = tuple(s.kl() for s in stats)
                    kl_sum = sum(kls)
                    if control is None:
                        loss = mean_recon + beta * jnp.mean(kl_sum)
                    elif control_p == 1:
                        loss = mean_recon + control * jnp.mean(
                            jnp.abs(beta - kl_sum))
                    elif control_p == 2:
                        loss = mean_recon + control * jnp.mean(
                            (beta - kl_sum) ** 2)
                    else:
                        raise ValueError("Wrong control p")
                    return (loss, jnp.mean(kl_sum),
                            tuple(jnp.mean(k) for k in kls))

                def without_kl(_):
                    zero = jnp.zeros((), mean_recon.dtype)
                    return (mean_recon, zero,
                            tuple(zero for _ in stats))

                loss, mean_kl, kls_mean = jax.lax.cond(
                    beta != 0.0, with_kl, without_kl, None)

                metrics = {"recon": mean_recon, "kl": mean_kl,
                           "kls": kls_mean}
                if self._monitor_sigma:
                    metrics["sigma_max"] = jnp.max(stats[0].inner.sigma)
                encoding = stats[0].z[0]

                if use_eq:
                    # the reference's second encoder pass
                    # (model.encode(img_rot), equivariance_loss.py:34) runs
                    # in train mode, so it also advances BN running stats —
                    # sequentially after the main forward. Chain the main
                    # pass's mutated stats in and keep the second mutation
                    # as the step's output.
                    eq_vars = self._variables(
                        params, mut.get("batch_stats") if has_bn else None)
                    eq_mut_cell = {}

                    def encode_fn(img):
                        # apply() with a mutable list (even empty) returns
                        # (out, mutated_vars)
                        out, eq_mut = model.apply(
                            eq_vars, img, n=1, train=True,
                            method="encode", rngs={"sample": k_eq_enc},
                            mutable=mutable)
                        eq_mut_cell.update(eq_mut)
                        return out[0].z[0]

                    eq, _ = equivariance_loss(
                        encode_fn, x, encoding, k_eq,
                        rotate_impl=self.equivariance_rotate)
                    loss = loss + lamb_eq * eq
                    metrics["equivariance"] = eq
                    if has_bn:
                        mut = eq_mut_cell
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

    def _build_multi_step(self, indexed=False):
        """scan-of-K train steps: one dispatch, K optimizer updates.

        xs: (K, B, ...) batches — or, when indexed=True, the device-resident
        dataset plus (K, B) row indices gathered on-device;
        betas/lamb_eqs/lamb_conts/its: (K,); rng: one base key, folded with
        each step's global iteration number in-scan.
        Returns (state, metrics with a leading K axis).
        """
        step = self._build_train_step()
        # per-step keys are folded in-scan from the base key and the global
        # iteration numbers: a host-side jax.random.fold_in per step would
        # cost one remote dispatch each through the tunneled runtime (~10ms+
        # of host time), which dominates small-epoch wall clock

        if indexed:
            def multi(state, data, idxs, betas, lamb_eqs, lamb_conts,
                      rng, its):
                def body(s, inp):
                    idx, beta, le, lc, it = inp
                    x = self._constrain_batch(jnp.take(data, idx, axis=0))
                    return step(s, x, beta, le, lc,
                                jax.random.fold_in(rng, it))

                return jax.lax.scan(
                    body, state, (idxs, betas, lamb_eqs, lamb_conts, its))

            return multi

        def multi(state, xs, betas, lamb_eqs, lamb_conts, rng, its):
            def body(s, inp):
                x, beta, le, lc, it = inp
                s2, m = step(s, x, beta, le, lc,
                             jax.random.fold_in(rng, it))
                return s2, m

            return jax.lax.scan(
                body, state, (xs, betas, lamb_eqs, lamb_conts, its))

        return multi

    def _build_eval_step(self, indexed=False, n_proc=1):
        model = self.model
        n = self.elbo_samples

        if indexed:
            # indexed eval is single-host only (_cache_device asserts), and
            # its index arrays are global, so padding sits at the global
            # tail: keep the default n_proc=1 mask semantics
            inner = self._build_eval_step()

            def step_idx(params, batch_stats, data, idx, n_valid, rng):
                x = self._constrain_batch(jnp.take(data, idx, axis=0))
                return inner(params, batch_stats, x, n_valid, rng)

            return step_idx

        def step(params, batch_stats, x, n_valid, rng):
            # n_valid: true (global) batch size — ragged eval tails are
            # padded to the sharding granularity; padding rows are masked
            # out of the means
            x = self._normalize(x)
            variables = self._variables(params, batch_stats)
            recon, kl_sum, kls, _ = model.apply(
                variables, x, n=n, train=False, method="elbo",
                rngs={"sample": rng})
            if n_proc > 1:
                # multi-host streaming eval: the global batch is assembled
                # from per-process blocks (local rows + local padding), so
                # validity is per-block, not a global tail. Every process
                # contributes the same row count (sharded loaders drop
                # ragged tails), so local valid = n_valid // n_proc.
                block = x.shape[0] // n_proc
                mask = (jnp.arange(x.shape[0]) % block) < (n_valid // n_proc)
            else:
                mask = jnp.arange(x.shape[0]) < n_valid
            denom = n_valid.astype(recon.dtype)

            def masked_mean(v):           # v: (B,)
                return jnp.sum(v * mask) / denom

            return (masked_mean(jnp.mean(recon, axis=0)),
                    masked_mean(kl_sum),
                    tuple(masked_mean(k) for k in kls))

        return step

    def _build_eval_pass(self, indexed=False, n_proc=1):
        """lax.scan of the eval step over a chunk of stacked batches — one
        dispatch evaluates steps_per_call validation batches (the same
        host-latency amortization as the train path; a single dispatch
        through this image's tunneled runtime costs ~10ms+ of host time,
        which dominates smoke-scale epochs). Padding batches (n_valid=0)
        produce NaN rows that the caller drops before averaging."""
        step = self._build_eval_step(indexed, n_proc=n_proc)

        def stacked(*args):
            r, k, ks = step(*args)
            return jnp.stack((r, k) + tuple(ks))

        if indexed:
            def run(params, batch_stats, data, idxs, n_valids, rng, offs):
                def body(carry, inp):
                    idx, nv, off = inp
                    return carry, stacked(params, batch_stats, data, idx,
                                          nv, jax.random.fold_in(rng, off))

                _, out = jax.lax.scan(body, (), (idxs, n_valids, offs))
                return out                       # (chunk, 2 + len(kls))

            return run

        def run(params, batch_stats, xs, n_valids, rng, offs):
            def body(carry, inp):
                x, nv, off = inp
                return carry, stacked(params, batch_stats, x, nv,
                                      jax.random.fold_in(rng, off))

            _, out = jax.lax.scan(body, (), (xs, n_valids, offs))
            return out

        return run

    # --------------------------------------------------------------- data

    def _put(self, x, batch_axis=0, replicate=False):
        x = jnp.asarray(x) if jax.process_count() == 1 else np.asarray(x)
        if self.mesh is not None:
            if replicate:
                if jax.process_count() > 1:
                    # every process holds the same host value; build the
                    # fully-replicated global array from local callbacks
                    return jax.make_array_from_callback(
                        x.shape, NamedSharding(self.mesh, P()),
                        lambda idx: x[idx])
                return jax.device_put(x, NamedSharding(self.mesh, P()))
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            sharding = NamedSharding(self.mesh, P(*spec))
            if jax.process_count() > 1:
                # assemble the global batch from per-process local slices
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)
        return x

    # --------------------------------------------------------------- eval

    @staticmethod
    def _pad_stack(arrs, width):
        """Stack 1D-leading arrays, padding each to `width` leading rows by
        repeating the last row (padding is masked out in-step)."""
        out = []
        for a in arrs:
            assert a.shape[0] <= width, (
                f"eval batch of {a.shape[0]} rows exceeds the chunk width "
                f"{width} inferred from the first batch — BatchLoader must "
                "yield full batches first (only the final batch may be short)")
            if a.shape[0] < width:
                a = np.concatenate(
                    [a, np.repeat(a[-1:], width - a.shape[0], 0)], 0)
            out.append(a)
        return np.stack(out)

    def _eval_chunks(self, pairs, width, run_chunk):
        """Stream (item, global_n_valid) pairs through fixed-shape eval
        dispatches of steps_per_call items each; returns the stacked
        per-item metric means, or None if there were no items.

        Items are padded to `width` leading rows; a short final chunk is
        padded with n_valid=0 dummies. Chunk results stay async device
        values until one np.asarray transfer each at the end — the dummy
        rows are sliced off host-side, so no extra device op is dispatched.
        Streaming (rather than materializing all items first) keeps host
        memory bounded and overlaps loader prefetch with device eval.
        """
        K = self.steps_per_call
        results = []
        buf, nvs = [], []
        c0 = 0

        def flush():
            nonlocal c0
            n_chunk = len(buf)
            items = self._pad_stack(buf, width)
            nv = np.asarray(nvs, np.int32)
            if n_chunk < K:   # pad to the compiled chunk shape
                items = np.concatenate(
                    [items, np.repeat(items[-1:], K - n_chunk, 0)], 0)
                nv = np.concatenate([nv, np.zeros(K - n_chunk, np.int32)], 0)
            out = run_chunk(items, nv, np.arange(c0, c0 + K, dtype=np.int32))
            results.append((out, n_chunk))
            c0 += n_chunk
            buf.clear()
            nvs.clear()

        for item, n_valid in pairs:
            buf.append(item)
            nvs.append(n_valid)
            if len(buf) == K:
                flush()
        if buf:
            flush()
        if not results:
            return None
        # one device->host transfer per chunk; no per-batch scalar reads
        return np.mean(np.concatenate(
            [np.asarray(o)[:n] for o, n in results]), axis=0)

    @staticmethod
    def _first_eval_batch(it):
        """First eval batch, or a loud error for an empty loader (whose
        NaN means would otherwise flow silently into best_value/TB)."""
        first = next(it, None)
        if first is None:   # e.g. multi-host test set < one global batch
            raise RuntimeError(
                "test(): evaluation loader produced no batches — test "
                "metrics and best_value would silently become NaN. "
                "Check the validation split size (multi-host: each "
                "process needs at least one full shard of a batch).")
        return first

    def test(self):
        """Full pass over the validation loader; returns
        (recon, kl, *kls) means — uniform over batches, the reference's
        semantics (unsupervised.py:58-67).

        The whole pass is scanned in chunks of steps_per_call batches per
        dispatch; chunks are padded to a fixed shape with dummy batches
        (n_valid=0) whose output rows are dropped host-side, so every chunk
        reuses one compiled program.
        """
        rng = jax.random.fold_in(self._eval_rng, self._eval_seq)
        self._eval_seq += 1
        dsize = self.mesh.shape["data"] if self.mesh is not None else 1
        # multi-host: the loader yields the process-LOCAL shard but _put()
        # assembles the GLOBAL batch, so the in-step valid count is the
        # global one; per-process padding (if local rows don't divide the
        # per-process device count) is handled by the block-aware eval mask
        n_proc = jax.process_count()

        if self._device_test is not None:
            data, factor = self._device_test
            rows = (self._expand_item_indices(idx, factor)
                    for idx in self._test_idx_loader._index_batches())
            first = self._first_eval_batch(rows)
            # full batches come first, so the first row count is the max
            width = first.shape[0] + (-first.shape[0]) % dsize
            out = self._eval_chunks(
                ((r, r.shape[0]) for r in itertools.chain([first], rows)),
                width,
                lambda idxs, nvs, offs: self._eval_pass_idx(
                    self.state.params, self.state.batch_stats, data,
                    self._put(jnp.asarray(idxs), replicate=True),
                    jnp.asarray(nvs), rng, offs))
        else:
            batches = (np.asarray(b[-1]) for b in self.test_loader)
            first = self._first_eval_batch(batches)
            # local rows only need the PER-PROCESS share of the data axis;
            # rounding to the global size would pad inside each block
            per = max(1, dsize // n_proc)
            width = first.shape[0] + (-first.shape[0]) % per
            out = self._eval_chunks(
                ((b, b.shape[0] * n_proc)
                 for b in itertools.chain([first], batches)),
                width,
                lambda xs, nvs, offs: self._eval_pass(
                    self.state.params, self.state.batch_stats,
                    self._put(xs, batch_axis=1),
                    jnp.asarray(nvs), rng, offs))
        assert out is not None
        return out

    # -------------------------------------------------------------- train

    def _schedule_values(self, global_it):
        beta = self.beta_schedule(global_it)
        lamb_eq = (self.equivariance_lamb(global_it)
                   if self.equivariance_lamb else 0.0)
        lamb_cont = (self.encoder_continuity_lamb(global_it)
                     if self.encoder_continuity_lamb else 0.0)
        return beta, lamb_eq, lamb_cont

    def _reset_window(self):
        self._win_sums = jnp.zeros((len(self._metric_names),), jnp.float32)
        self._win_count = jnp.zeros((), jnp.int32)

    def train(self, epoch):
        """One epoch. Reference: unsupervised.py:69-156 (same reporting
        cadence, tags, and printed line). With steps_per_call > 1, batches
        are grouped and scanned in one dispatch; reporting lands on the
        first group boundary at/after report_freq."""
        num_batches = len(self.train_loader)
        K = self.steps_per_call
        steps_since_report = 0
        start = time.time()

        def flush(group, it):
            nonlocal steps_since_report, start
            if not group:
                return
            its, xs = zip(*group)
            scheds = [self._schedule_values(g) for g in its]
            its_arr = np.asarray(its, np.int32)
            betas, eqs, conts = (jnp.asarray([s[i] for s in scheds],
                                             dtype=jnp.float32)
                                 for i in range(3))
            if self._device_train is not None:
                data, _ = self._device_train
                idxs = self._put(jnp.asarray(np.stack(xs)), replicate=True)
                self.state, metrics = self._multi_step_idx(
                    self.state, data, idxs, betas, eqs, conts,
                    self._rng, its_arr)
            else:
                xb = self._put(np.stack(xs), batch_axis=1)
                self.state, metrics = self._multi_step(
                    self.state, xb, betas, eqs, conts, self._rng, its_arr)
            # device-side async accumulation — no host sync, no retraces
            self._win_sums, self._win_count = self._win_acc_update(
                self._win_sums, self._win_count, metrics)
            steps_since_report += len(group)
            if (steps_since_report >= self.report_freq
                    or it + 1 == num_batches):
                beta, lamb_eq, lamb_cont = scheds[-1]
                self._report(epoch, it, its[-1], beta,
                             lamb_eq, lamb_cont, start,
                             n_steps=steps_since_report)
                steps_since_report = 0
                start = time.time()

        if self._device_train is not None:
            # index-only epoch: batches are gathered on device; indices
            # are GLOBAL (multi-host: the same on every process)
            _, factor = self._device_train
            batches = self._train_idx_loader._index_batches()
            self._train_idx_loader.epoch += 1
            group = []
            for it, idx in enumerate(batches):
                global_it = epoch * num_batches + it + 1
                group.append((global_it,
                              self._expand_item_indices(idx, factor)))
                if len(group) == K or it + 1 == num_batches:
                    flush(group, it)
                    group = []
            return

        group = []
        for it, batch in enumerate(self.train_loader):
            # NB: BatchLoader already applied the dataset's prep_batch
            x = batch[-1]
            global_it = epoch * num_batches + it + 1
            group.append((global_it, np.asarray(x)))
            if len(group) == K or it + 1 == num_batches:
                flush(group, it)
                group = []

    def _report(self, epoch, it, global_it, beta, lamb_eq,
                lamb_cont, start, n_steps=None):
        # one device->host transfer pulls the accumulated window sums;
        # every step in the window is weighted equally
        sums = np.asarray(self._win_sums)
        count = max(int(self._win_count), 1)
        self._reset_window()
        n_steps = n_steps or count
        means = dict(zip(self._metric_names, sums / count))
        has_eq = "equivariance" in means
        has_cont = "encoder_continuity" in means
        train_recon = float(means["recon"])
        train_kl = float(means["kl"])

        if np.isnan(train_kl):
            raise RuntimeError("NaN KL")

        self.log.add_scalar("train_loss", train_recon + beta * train_kl,
                            global_it)
        self.log.add_scalar("train_recon", train_recon, global_it)
        self.log.add_scalar("train_kl", train_kl, global_it)
        if has_eq:
            self.log.add_scalar("equivariance",
                                float(means["equivariance"]), global_it)
            self.log.add_scalar("equivariance_lamb", lamb_eq, global_it)
        if has_cont:
            self.log.add_scalar("encoder_continuity",
                                float(means["encoder_continuity"]),
                                global_it)
            self.log.add_scalar("encoder_continuity_lamb", lamb_cont,
                                global_it)

        if self._monitor_sigma:
            sigma_max = float(means["sigma_max"])
            self.log.add_scalar("sigma_max", sigma_max, global_it)
            if sigma_max > self._sigma_valid_bound:
                print(f"WARNING: posterior sigma_max {sigma_max:.1f} exceeds "
                      f"the wrapped-density validity bound "
                      f"~{self._sigma_valid_bound:.1f} for its shell count: "
                      "reported KL (and a final IW-LL) are truncation-biased"
                      " — re-evaluate the checkpoint with "
                      "scripts/eval_checkpoint.py --density_k 30 100")

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

    # ----------------------------------------------------------- profiling

    def profile(self, log_dir, n_calls=3):
        """Capture a device trace of a few training dispatches
        (view with TensorBoard / xprof). The reference's only profiling is
        a wall-clock seconds-per-iteration print (unsupervised.py:151-155);
        this gives per-op device timelines."""
        batches = [b[-1] for _, b in zip(range(self.steps_per_call),
                                         self.train_loader)]
        xs = self._put(np.stack([np.asarray(b) for b in batches]),
                       batch_axis=1)
        k = len(batches)
        betas = jnp.zeros((k,), jnp.float32) + float(self.beta_schedule(1))
        zeros = jnp.zeros((k,), jnp.float32)
        its = np.arange(k, dtype=np.int32)
        # warmup/compile outside the trace
        self.state, m = self._multi_step(self.state, xs, betas, zeros,
                                         zeros, self._rng, its)
        _ = float(np.asarray(m["recon"])[-1])
        with jax.profiler.trace(log_dir):
            for _ in range(n_calls):
                self.state, m = self._multi_step(self.state, xs, betas,
                                                 zeros, zeros, self._rng,
                                                 its)
            _ = float(np.asarray(m["recon"])[-1])   # drain
        print(f"profiler trace written to {log_dir}")

    # ----------------------------------------------------- log-likelihood

    def log_likelihood(self, dataset, n=500, max_items=None, batch_size=1,
                       n_chunk=None, return_items=False):
        """Importance-sampled LL over a dataset.

        Reference: main.py:134-143 (n=500, batch 1, eval mode). The
        estimator is unchanged; ``batch_size`` and ``n_chunk`` are
        evaluation-throughput features: items are evaluated B at a time
        (the IWAE estimate is per-item, so batching is exact) and the n
        samples are drawn in host-looped jitted chunks merged with a
        host-side logaddexp, so the (n, B, ...) decoder intermediates
        never materialize at once. The tail batch is padded and masked
        out.
        """
        if n_chunk is None:
            n_chunk = n if batch_size == 1 else max(1, min(n, 50))
        chunks = max(1, -(-n // n_chunk))
        n_chunk = -(-n // chunks)    # shrink the chunk so n_eff == n when
        n_eff = chunks * n_chunk     # chunks divides n (e.g. 500/300->250x2)
        if n_eff != n:
            print(f"log_likelihood: n={n} not divisible into {chunks} "
                  f"chunks; using n={n_eff} importance samples")

        # One compiled program per CHUNK of n_chunk samples, with every
        # operand (weights, images, key indices) passed as a jit ARGUMENT
        # and the chunk loop on the host. The previous in-jit
        # lax.scan-over-chunks formulation — weights and images captured
        # as scan constants — MISCOMPILES on the axon TPU runtime: on the
        # same converged checkpoint it reported IW-LL 25-80 nats BELOW
        # both the CPU value and the run's own E[w] Jensen lower bound
        # (impossible for a correct logsumexp; see
        # scripts/debug_ll_gap.py and BENCHMARKS 'honest LL' notes).
        # Same class as the known axon closed-over-constants bug
        # (CLAUDE.md): argument-passed single-apply programs are verified
        # correct against CPU. Cost: `chunks` dispatches per batch
        # instead of one (~10 ms each) — negligible for evaluation.
        def ll_chunk_fn(params, bs, x, rng, i, j):
            # the per-(batch, chunk) key folds in-jit: an eager host-side
            # fold_in/split on the axon platform would pay a remote
            # dispatch (seconds) per call
            variables = self._variables(params, bs)
            xn = self._normalize(x)
            key = jax.random.fold_in(jax.random.fold_in(rng, i), j)
            w = self.model.apply(variables, xn, n=n_chunk,
                                 method="log_weights",
                                 rngs={"sample": key})       # (n_chunk, B)
            return jax.nn.logsumexp(w, axis=0)               # (B,)

        cache_key = (n_chunk,)
        ll_jit = self._ll_jit_cache.get(cache_key)
        if ll_jit is None:
            ll_jit = self._ll_jit_cache[cache_key] = jax.jit(ll_chunk_fn)
        loader = BatchLoader(dataset, batch_size, shuffle=True,
                             drop_last=False)
        vals, seen = [], 0
        rng = self._ll_rng
        for i, batch in enumerate(loader):
            if max_items is not None and seen >= max_items:
                break
            x = np.asarray(batch[-1])
            real = x.shape[0]
            if max_items is not None:
                real = min(real, max_items - seen)
            if x.shape[0] < batch_size:   # pad tail to the compiled shape
                pad = np.broadcast_to(x[:1],
                                      (batch_size - x.shape[0],) + x.shape[1:])
                x = np.concatenate([x, pad], axis=0)
            # small eval batches cannot shard over the data axis: replicate
            # (every host evaluates the same items; values are averaged)
            xd = self._put(x, replicate=True)
            lses = [ll_jit(self.state.params, self.state.batch_stats, xd,
                           rng, np.int32(i), np.int32(j))
                    for j in range(chunks)]
            # merge the chunk logsumexps host-side (float64), then the
            # - log n normalization
            lse = np.logaddexp.reduce(
                np.stack([np.asarray(l, np.float64) for l in lses]), axis=0)
            vals.append((lse - np.log(float(n_eff)), real))
            seen += real
        if not vals:                  # empty dataset / max_items=0
            return float("nan")
        items = np.concatenate([np.asarray(v)[:r] for v, r in vals])
        if return_items:              # per-item LLs (diagnostics)
            return float(np.mean(items)), items
        return float(np.mean(items))
