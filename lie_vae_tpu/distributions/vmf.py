"""von Mises-Fisher latent distribution and the hyperspherical uniform — a
native JAX implementation.

The reference outsources this to the external ``hyperspherical_vae_pytorch``
package (imported at lie_vae/reparameterize.py:13 and used by
``Sreparameterize``, reparameterize.py:58-97). Here we implement the same
capabilities from scratch:

- reparameterized sampling via the Wood/Ulrich rejection scheme with the
  rejection-sampling reparameterization trick (the accept/reject decisions
  use a gradient-stopped kappa; the accepted Beta draw is then pushed through
  the differentiable map w(eps, kappa)), plus a Householder reflection onto
  the mean direction;
- log-density, entropy, and KL to the hyperspherical uniform.

Bessel functions: jax.scipy.special provides i0e / i1e; higher integer
orders come from the stable-enough upward recurrence
I_{v+1}(z) = I_{v-1}(z) - (2 v / z) I_v(z), and half-integer orders from the
closed forms for I_{1/2}, I_{3/2}, ... — differentiable for free since they
compose i0e/i1e/sinh/cosh. This covers every z_dim the reference supports
(the reference only ever builds S^3, z_dim = 4; reparameterize.py:93-95).
"""
import math

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import i0e, i1e


def _ive_series(v, z, terms=10):
    """I_v(z) e^{-z} via the ascending series — exact as z -> 0, where the
    upward recurrence catastrophically cancels in float32.

    I_v(z) = (z/2)^v sum_k (z^2/4)^k / (k! Gamma(v+k+1)); with 10 terms the
    truncation error at z=1 is below float32 resolution.
    """
    vf = float(v)
    zz = 0.25 * z * z
    coef = 1.0 / math.gamma(vf + 1.0)
    acc = jnp.full_like(z, coef)
    pow_zz = jnp.ones_like(z)
    for k in range(1, terms):
        coef /= k * (vf + k)
        pow_zz = pow_zz * zz
        acc = acc + coef * pow_zz
    return jnp.exp(-z) * (0.5 * z) ** vf * acc


def ive(v, z):
    """Exponentially scaled modified Bessel I_v(z) * exp(-z) for z >= 0.

    v must be a static non-negative integer or half-integer. For z < 1 the
    ascending series is used (the upward recurrence I_{v+1} = I_{v-1} -
    (2v/z) I_v cancels catastrophically there — it returned wrong-sign
    values for v >= 2 at z <~ 1e-3 in float32).
    """
    z = jnp.asarray(z)
    small = z < 1.0
    zs = jnp.where(small, 1.0, z)   # keep the unused branch finite (1/z)
    # the series must also see a guarded argument: at z >~ 300 its powers
    # overflow float32 in the UNTAKEN branch, and jnp.where's VJP then
    # multiplies the overflowed residuals by the zero cotangent -> NaN
    # gradients for every kappa past the threshold (observed as NaN grads
    # in vMF training once the concentration head grew past ~300)
    zq = jnp.where(small, z, 0.5)

    if float(v) == int(v):
        orders = int(v)
        prev, cur = i0e(zs), i1e(zs)   # I_0 e^-z, I_1 e^-z
        rec = prev if orders == 0 else None
        for n in range(1, orders):
            prev, cur = cur, prev - (2.0 * n / zs) * cur
        if rec is None:
            rec = cur
        return jnp.where(small, _ive_series(v, zq), rec)
    # half-integer: I_{1/2} = sqrt(2/(pi z)) sinh z;
    # I_{3/2} = sqrt(2/(pi z)) (cosh z - sinh z / z); then upward recurrence.
    if (float(v) * 2) != int(float(v) * 2):
        raise ValueError("ive supports integer and half-integer orders only")
    # scaled: sinh(z) e^-z = (1 - e^-2z)/2 ; cosh(z) e^-z = (1 + e^-2z)/2
    pref = jnp.sqrt(2.0 / (math.pi * zs))
    sinh_s = 0.5 * (1.0 - jnp.exp(-2.0 * zs))
    cosh_s = 0.5 * (1.0 + jnp.exp(-2.0 * zs))
    prev = pref * sinh_s                       # order 1/2
    if float(v) == 0.5:
        return jnp.where(small, _ive_series(v, zq), prev)
    cur = pref * (cosh_s - sinh_s / zs)        # order 3/2
    order = 1.5
    while order < float(v):
        prev, cur = cur, prev - (2.0 * order / zs) * cur
        order += 1.0
    return jnp.where(small, _ive_series(v, zq), cur)


def log_ive(v, z):
    return jnp.log(jnp.maximum(ive(v, z), 1e-30))


def _log_vmf_normalizer(kappa, p):
    """log C_p(kappa) with q(x) = C_p(kappa) exp(kappa mu^T x) on S^{p-1}."""
    v = p / 2.0 - 1.0
    # log I_v(k) = log ive(v, k) + k
    return (v * jnp.log(kappa) - (p / 2.0) * math.log(2.0 * math.pi)
            - (log_ive(v, kappa) + kappa))


def hyperspherical_uniform_entropy(dim, dtype=jnp.float32):
    """Entropy of the uniform distribution on S^dim (in R^{dim+1}).

    = log surface area = log(2 pi^{(dim+1)/2} / Gamma((dim+1)/2)).
    Matches hyperspherical_vae's HypersphericalUniform.entropy used at
    lie_vae/reparameterize.py:79-88.
    """
    half = (dim + 1) / 2.0
    area = math.log(2.0) + half * math.log(math.pi) - math.lgamma(half)
    return jnp.asarray(area, dtype=dtype)


def hyperspherical_uniform_log_prob(z, dim=None):
    """log density of the uniform on S^dim, broadcast over z's batch dims."""
    if dim is None:
        dim = z.shape[-1] - 1
    return jnp.broadcast_to(-hyperspherical_uniform_entropy(dim, z.dtype),
                            z.shape[:-1])


@struct.dataclass
class VonMisesFisherStats:
    """Posterior stats of a vMF latent on S^{p-1}.

    mu: (B, p) unit mean direction; kappa: (B, 1) concentration;
    z: (n, B, p) unit samples.
    """
    mu: jnp.ndarray
    kappa: jnp.ndarray
    z: jnp.ndarray

    @property
    def p(self):
        return self.mu.shape[-1]

    def log_posterior(self, z=None):
        """log q(z | x) = log C_p(kappa) + kappa mu^T z, (n, B)."""
        z = self.z if z is None else z
        k = self.kappa[..., 0]
        return (_log_vmf_normalizer(k, self.p)
                + self.kappa[..., 0] * jnp.sum(self.mu * z, axis=-1))

    def log_prior(self):
        return hyperspherical_uniform_log_prob(self.z)

    def entropy(self):
        """H[q] = -log C_p(k) - k * A_p(k), A_p = I_{p/2} / I_{p/2-1}, (B,)."""
        k = self.kappa[..., 0]
        v = self.p / 2.0 - 1.0
        a = ive(v + 1.0, k) / ive(v, k)
        return -_log_vmf_normalizer(k, self.p) - k * a

    def kl(self):
        """KL(q || uniform) = -H[q] + H[uniform], (B,).

        Reference semantics: Sreparameterize.kl, lie_vae/reparameterize.py:79-82.
        """
        return -self.entropy() + hyperspherical_uniform_entropy(
            self.p - 1, self.mu.dtype)


def _sample_w(key, kappa, p, n, num_iters=32):
    """Wood (1994) rejection sampler for the mu-axis component w, (n, B).

    The accept/reject decisions use stop_gradient(kappa); the returned w is
    recomputed differentiably from the accepted Beta draw (rejection-sampling
    reparameterization, Naesseth et al. 2017) so d w / d kappa flows.
    """
    b_shape = kappa.shape[:-1]
    kd = jax.lax.stop_gradient(kappa[..., 0])          # (B,)

    def wood_consts(k):
        # b in the cancellation-free form: the textbook
        # (-2k + sqrt(4k^2 + (p-1)^2))/(p-1) rounds to exactly 0 in float32
        # for k >~ 1e4 (sqrt(4k^2 + c) == 2k), collapsing every draw to
        # w == 1 and blowing up downstream gradients
        b = (p - 1.0) / (2.0 * k + jnp.sqrt(4.0 * k ** 2 + (p - 1.0) ** 2))
        a = (p - 1.0 + 2.0 * k + jnp.sqrt(4.0 * k ** 2 + (p - 1.0) ** 2)) / 4.0
        d = 4.0 * a * b / (1.0 + b) - (p - 1.0) * math.log(p - 1.0)
        return a, b, d

    a_d, b_d, d_d = wood_consts(kd)                    # detached consts

    def body(state):
        key, eps_acc, done, _, it = state
        key, k_eps, k_u = jax.random.split(key, 3)
        eps = jax.random.beta(k_eps, (p - 1.0) / 2.0, (p - 1.0) / 2.0,
                              (n,) + b_shape, dtype=kappa.dtype)
        u = jax.random.uniform(k_u, (n,) + b_shape, dtype=kappa.dtype)
        w = (1.0 - (1.0 + b_d) * eps) / (1.0 - (1.0 - b_d) * eps)
        t = 2.0 * a_d * b_d / (1.0 - (1.0 - b_d) * eps)
        accept = ((p - 1.0) * jnp.log(t) - t + d_d) >= jnp.log(u)
        eps_acc = jnp.where(done, eps_acc, jnp.where(accept, eps, eps_acc))
        done = jnp.logical_or(done, accept)
        return key, eps_acc, done, jnp.all(done), it + 1

    def cond(state):
        # cap at num_iters so a pathological kappa can't spin forever;
        # acceptance rate is >~66% per round, so 32 rounds is astronomically
        # safe for healthy inputs
        return jnp.logical_and(jnp.logical_not(state[3]),
                               state[4] < num_iters)

    init = (key, jnp.full((n,) + b_shape, 0.5, dtype=kappa.dtype),
            jnp.zeros((n,) + b_shape, dtype=bool), jnp.asarray(False),
            jnp.asarray(0))
    _, eps_acc, _, _, _ = jax.lax.while_loop(cond, body, init)
    eps_acc = jax.lax.stop_gradient(eps_acc)

    # differentiable pushforward of the accepted draw (same stable b form)
    k_attached = kappa[..., 0]
    b = (p - 1.0) / (2.0 * k_attached
                     + jnp.sqrt(4.0 * k_attached ** 2 + (p - 1.0) ** 2))
    w = (1.0 - (1.0 + b) * eps_acc) / (1.0 - (1.0 - b) * eps_acc)
    return w


def sample_vmf(key, mu, kappa, n=1, deterministic=False):
    """Draw n reparameterized vMF samples; returns VonMisesFisherStats.

    Reference semantics: Sreparameterize.nsample via VonMisesFisher.rsample,
    lie_vae/reparameterize.py:90-93.
    """
    p = mu.shape[-1]
    if deterministic:
        z = jnp.broadcast_to(mu, (n,) + mu.shape)
        return VonMisesFisherStats(mu=mu, kappa=kappa, z=z)

    k_w, k_v = jax.random.split(key)
    w = _sample_w(k_w, kappa, p, n)                     # (n, B)

    # tangent direction: uniform on the sphere orthogonal to e1
    v = jax.random.normal(k_v, (n,) + mu.shape, dtype=mu.dtype)
    v = v.at[..., 0].set(0.0)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    # floor keeps sqrt's gradient finite when a draw lands on w = +/-1
    # (sqrt'(0) is infinite; at extreme kappa w rounds to exactly 1)
    z_e1 = jnp.concatenate(
        [w[..., None], jnp.sqrt(jnp.clip(1.0 - w[..., None] ** 2, 1e-12)) *
         v[..., 1:]], axis=-1)

    # Householder reflection mapping e1 -> mu
    e1 = jnp.zeros_like(mu).at[..., 0].set(1.0)
    u = e1 - mu
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    z = z_e1 - 2.0 * jnp.sum(z_e1 * u, axis=-1, keepdims=True) * u
    return VonMisesFisherStats(mu=mu, kappa=kappa, z=z)
