"""VAE assembly: config-string-driven model mirroring the reference surface
(lie_vae/experiments/vae.py) as a single Flax module.

Config strings (same names/semantics as the reference):
- latent_mode:  'so3' | 'normal' | 'vmf' | 'vmfq'   (vae.py:73-97)
- decoder_mode: 'action' | 'mlp'                    (vae.py:113-132)
- encode_mode:  'conv' | 'toy'                      (vae.py:56-70)
- deconv_mode:  'deconv' | 'toy'                    (vae.py:105-111)
- mean_mode:    'alg' | 'q' | 's2s1' | 's2s2'       (vae.py:77-86)

Differences from the reference (deliberate, TPU-first):
- images are NHWC (64, 64, C) instead of NCHW;
- everything is functional: ``encode`` returns latent stats structs, and
  ``elbo``/``log_likelihood`` are pure of module state;
- the reference's unset ``self.r_callback`` bug (vae.py:137, AttributeError
  at runtime) becomes an optional feature-transform hook defaulting to None.
"""
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lie_vae_tpu import ops
from lie_vae_tpu.models.decoders import ActionDecoder, MLPDecoder
from lie_vae_tpu.models.nets import ACTIVATIONS, ConvEncoder, DeconvNet, MLP
from lie_vae_tpu.models.reparameterize import (
    N0Reparameterize, NormalReparameterize, SO3Reparameterize,
    VmfReparameterize)


class LieVAE(nn.Module):
    """Homeomorphic VAE with a Lie-group (or baseline) latent.

    Reference: VAE, lie_vae/experiments/vae.py:16-204.
    """
    latent_mode: str = "so3"
    decoder_mode: str = "action"
    degrees: int = 6
    deconv_hidden: int = 50
    # conv-encoder base width (reference hardcodes 50, nets.py:8); exposed
    # as a capacity knob — BENCHMARKS shows decoder width is the binding
    # constraint at the paper's scales, encoder width is the next lever
    conv_hidden: int = 50
    encode_mode: str = "conv"
    deconv_mode: str = "deconv"
    rep_copies: int = 10
    batch_norm: bool = True
    rgb: bool = False
    mean_mode: str = "alg"
    group_reparam_in_dims: int = 10
    normal_dims: int = 3
    deterministic: bool = False
    fixed_item_rep: Optional[Any] = None
    wigner_transpose: bool = False
    mlp_layers: int = 3
    mlp_hidden: int = 50
    mlp_activation: str = "relu"
    fixed_sigma: Optional[float] = None
    # opt-in upper clamp on the SO(3) posterior's learned algebra sigma —
    # keeps the k-shell wrapped density in its validity regime
    # (sigma <= ~pi*density_k/2) and prevents the runaway-sigma divergence
    # observed at scaled capacity (see SO3Reparameterize.sigma_clamp)
    sigma_clamp: Optional[float] = None
    # TPU mixed precision: compute dtype for the conv/deconv/MLP stacks
    # ('bfloat16' for the MXU fast path); params, Lie-group math, densities
    # and losses stay float32. None = full float32.
    compute_dtype: Optional[str] = None
    # per-stack overrides for mixed recipes (attribution of the bf16
    # convergence penalty and the production mixed mode). Each is a dtype
    # name ('bfloat16' | 'float32') or the sentinel 'unset' meaning
    # "follow compute_dtype". deconv_head_dtype controls only the final
    # image-channel transpose conv (pixels rendered at this precision
    # while the hidden stack stays on the bf16 MXU path).
    encoder_dtype: Optional[str] = "unset"
    decoder_dtype: Optional[str] = "unset"
    deconv_head_dtype: Optional[str] = "unset"
    # 'xla' | 'pallas' | 'auto': implementation of the fused Lie-group hot
    # ops (block-Wigner apply + wrapped log-density); both impls are
    # differentiable (the Pallas kernels carry custom-VJP backward kernels)
    kernel_impl: str = "xla"
    # wrapping-shell truncation for the SO(3) posterior density. The
    # reference hardcodes 10 (reparameterize.py:233-263); raising it is a
    # diagnostic for density-truncation bias at large sigma (a truncated
    # log q inflates the IW-LL estimate while pushing the MC KL negative).
    density_k: int = 10
    # optional per-reparameterizer feature hook (the reference's r_callback,
    # vae.py:137, which is never assigned there — fixed here as opt-in)
    r_callback: Optional[Tuple[Callable, ...]] = None

    @property
    def out_shape(self):
        # reference: vae.py:45-48 (NHWC here)
        if self.deconv_mode == "toy":
            return ((self.degrees + 1) ** 2, self.rep_copies)
        return (64, 64, 3 if self.rgb else 1)

    @property
    def group_dims(self):
        return {"so3": 9, "normal": self.normal_dims,
                "vmf": 4, "vmfq": 4}[self.latent_mode]

    def _in_dims(self):
        # reference: vae.py:50-54 (avoid a bottleneck for normal latents)
        in_dims = self.group_reparam_in_dims
        if self.latent_mode == "normal":
            if self.decoder_mode != "mlp" and self.normal_dims != 3:
                raise ValueError("Normal Action must be 3 dim")
            in_dims = max(in_dims, self.normal_dims)
        if self.latent_mode == "vmf" and self.decoder_mode == "action":
            # inherited from the reference but made loud: decode would
            # route the 4-dim S^3 latent through vector_to_eazyz, whose
            # (pi, pi/2, pi) scaling only broadcasts against 3 dims
            # (vae.py:183-184 crashes identically). 'vmfq' is the
            # quaternion chart meant for the action decoder.
            raise ValueError(
                "latent_mode='vmf' has no Euler chart for the action "
                "decoder; use decoder_mode='mlp' or latent_mode='vmfq'")
        return in_dims

    def setup(self):
        in_dims = self._in_dims()
        act = ACTIVATIONS[self.mlp_activation]

        def _dt(override):
            name = self.compute_dtype if override == "unset" else override
            if name is None or name == "none":
                return None
            return jnp.dtype(name)

        cdt_enc = _dt(self.encoder_dtype)
        cdt_dec = _dt(self.decoder_dtype)
        # head default: follow the decoder stack's dtype
        hdt = (cdt_dec if self.deconv_head_dtype == "unset"
               else _dt(self.deconv_head_dtype))

        # encoder (vae.py:56-70)
        if self.encode_mode == "conv":
            self.encoder = ConvEncoder(in_dims, hidden_dims=self.conv_hidden,
                                       rgb=self.rgb,
                                       batch_norm=self.batch_norm,
                                       dtype=cdt_enc)
        elif self.encode_mode == "toy":
            self.encoder = MLP(in_dims, 100, 2, act, dtype=cdt_enc)
        else:
            raise ValueError("Wrong encode mode")

        # latent (vae.py:73-97)
        if self.latent_mode == "so3":
            self.rep_group = SO3Reparameterize(
                mean_mode=self.mean_mode, k=self.density_k,
                fixed_sigma=self.fixed_sigma,
                deterministic=self.deterministic,
                density_impl=self.kernel_impl,
                sigma_clamp=self.sigma_clamp)
        elif self.latent_mode == "normal":
            self.rep_group = NormalReparameterize(
                self.normal_dims, deterministic=self.deterministic)
        elif self.latent_mode in ("vmf", "vmfq"):
            self.rep_group = VmfReparameterize(
                4, deterministic=self.deterministic)
        else:
            raise ValueError("Wrong latent mode")
        self.reparameterize = (self.rep_group,)

        # decoder (vae.py:105-132)
        matrix_dims = (self.degrees + 1) ** 2
        if self.deconv_mode == "deconv":
            deconv = DeconvNet(matrix_dims * self.rep_copies,
                               self.deconv_hidden, rgb=self.rgb,
                               dtype=cdt_dec, head_dtype=hdt)
        elif self.deconv_mode == "toy":
            deconv = None
        else:
            raise ValueError("Wrong deconv mode")

        if self.decoder_mode == "action":
            self.decoder = ActionDecoder(
                degrees=self.degrees, deconv=deconv,
                rep_copies=self.rep_copies,
                fixed_item_rep=self.fixed_item_rep,
                transpose=self.wigner_transpose,
                wigner_impl=self.kernel_impl)
        elif self.decoder_mode == "mlp":
            self.decoder = MLPDecoder(
                degrees=self.degrees, deconv=deconv,
                in_dims=self.group_dims, rep_copies=self.rep_copies,
                layers=self.mlp_layers, hidden_dims=self.mlp_hidden,
                activation=act, dtype=cdt_dec)
        else:
            raise ValueError("Wrong decoder mode")

    # ------------------------------------------------------------- methods

    def encode(self, x, n=1, train=True):
        """Returns a list of latent stats structs (one per reparameterizer).

        Reference: VAE.encode, vae.py:134-142.
        """
        if self.encode_mode == "toy":
            h = self.encoder(x.reshape(x.shape[0], -1))
        else:
            h = self.encoder(x, train=train)
        if self.r_callback is not None:
            return [r(f(h), n) for r, f in zip(self.reparameterize,
                                               self.r_callback)]
        return [r(h, n) for r in self.reparameterize]

    def decode(self, z_pose, z_content=None):
        """Decode (n, B, ...) latent samples to (n, B, *out_shape).

        Reference: VAE.decode, vae.py:173-197 (same latent->Euler routing).
        """
        n, b = z_pose.shape[:2]
        z_pose = z_pose.reshape((-1,) + z_pose.shape[2:])
        if z_content is not None:
            z_content = z_content.reshape((-1,) + z_content.shape[2:])

        if self.decoder_mode in ("action", "proj"):
            # 'proj' and 'so3f' are accepted here for parity with the
            # reference's decode routing (vae.py:180-181) even though they
            # are unbuildable config strings there too (dead modes).
            if self.latent_mode in ("so3", "so3f"):
                angles = ops.group_matrix_to_eazyz(z_pose)
            elif self.latent_mode in ("normal", "vmf"):
                angles = ops.vector_to_eazyz(z_pose)
            elif self.latent_mode == "vmfq":
                angles = ops.quaternions_to_eazyz(z_pose)
            else:
                raise ValueError("Wrong latent mode for action decoder")
            x_recon = self.decoder(angles, z_content)
        elif self.decoder_mode == "mlp":
            x_recon = self.decoder(z_pose, z_content)
        else:
            raise ValueError("Wrong decoder mode")

        return x_recon.reshape((n, b) + self.out_shape)

    def __call__(self, x, n=1, train=True):
        """Full forward: encode, sample, decode. Returns (x_recon, stats).

        Reference: VAE.forward, vae.py:148-151 (which stashes self.z; here
        the stats are returned explicitly).
        """
        stats = self.encode(x, n=n, train=train)
        x_recon = self.decode(*[s.z for s in stats])
        return x_recon, stats

    def recon_loss(self, x_recon, x):
        """Sum-of-squares reconstruction error over out_shape dims, (n, B).

        Reference: VAE.recon_loss, vae.py:199-204.
        """
        x = jnp.broadcast_to(x, x_recon.shape)
        sq = (x_recon - x) ** 2
        return jnp.sum(sq, axis=tuple(range(2, sq.ndim)))

    def kl(self, stats):
        """Per-reparameterizer KLs. Reference: VAE.kl, vae.py:144-146."""
        return [s.kl() for s in stats]

    def elbo(self, x, n=1, train=True):
        """Returns (recon_loss (n,B), kl_summed (B,), kls, stats).

        Reference: VAE.elbo, vae.py:156-162.
        """
        x_recon, stats = self(x, n=n, train=train)
        kls = self.kl(stats)
        kl_summed = sum(kls)
        recon = self.recon_loss(x_recon, x)
        return recon, kl_summed, kls, stats

    def log_weights(self, x, n=1):
        """Per-sample importance log-weights log p(x|z) + log p(z) - log q,
        shape (n, B) — the inner term of the IWAE estimator.

        Reference: the terms of VAE.log_likelihood, vae.py:164-170.
        """
        x_recon, stats = self(x, n=n, train=False)
        log_p_z = sum(s.log_prior() for s in stats)          # (n, B)
        log_q_z_x = sum(s.log_posterior() for s in stats)    # (n, B)
        log_p_x_z = -self.recon_loss(x_recon, x)             # (n, B)
        return log_p_x_z + log_p_z - log_q_z_x

    def log_likelihood(self, x, n=1):
        """IWAE-style importance-sampled log-likelihood estimate, scalar.

        Reference: VAE.log_likelihood, vae.py:164-171.
        """
        return jnp.mean(
            jax.nn.logsumexp(self.log_weights(x, n=n), axis=0)
            - jnp.log(float(n)))
