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


def _series_scaled(v, z, terms=32):
    """S_v(z) = sum_k (z^2/4)^k / (k! Gamma(v+k+1)), so I_v = (z/2)^v S_v.

    Cancellation-free and O(1/Gamma(v+1))-scaled: no (z/2)^v underflow, and
    the running-term form (t *= zz / (k (v+k))) never overflows for the
    guarded arguments it sees. 32 terms cover z up to ~16 below float32
    resolution (term_32 < 1e-12 relative at z=16).
    """
    vf = float(v)
    zz = 0.25 * z * z
    t = jnp.full_like(z, 1.0 / math.gamma(vf + 1.0))
    acc = t
    for k in range(1, terms):
        t = t * (zz / (k * (vf + k)))
        acc = acc + t
    return acc


def _small_threshold(v):
    # the upward recurrence I_{v+1} = I_{v-1} - (2v/z) I_v is only stable
    # for z >~ v (below that it cancels catastrophically: wrong-sign values
    # for v >= 2 at z <~ 1e-3 in float32, ~1e-4 relative error at z ~ 1 for
    # v ~ 7 even in float64); the ascending series covers z < max(1, v)
    return max(1.0, float(v))


def _recurrence(v, zs):
    """ive via i0e/i1e (or the half-integer closed forms) + upward
    recurrence; only valid for z >~ v."""
    if float(v) == int(v):
        orders = int(v)
        prev, cur = i0e(zs), i1e(zs)   # I_0 e^-z, I_1 e^-z
        if orders == 0:
            return prev
        for n in range(1, orders):
            prev, cur = cur, prev - (2.0 * n / zs) * cur
        return cur
    if (float(v) * 2) != int(float(v) * 2):
        raise ValueError("ive supports integer and half-integer orders only")
    # half-integer: I_{1/2} = sqrt(2/(pi z)) sinh z;
    # I_{3/2} = sqrt(2/(pi z)) (cosh z - sinh z / z); then upward recurrence.
    # scaled: sinh(z) e^-z = (1 - e^-2z)/2 ; cosh(z) e^-z = (1 + e^-2z)/2
    pref = jnp.sqrt(2.0 / (math.pi * zs))
    sinh_s = 0.5 * (1.0 - jnp.exp(-2.0 * zs))
    cosh_s = 0.5 * (1.0 + jnp.exp(-2.0 * zs))
    prev = pref * sinh_s                       # order 1/2
    if float(v) == 0.5:
        return prev
    cur = pref * (cosh_s - sinh_s / zs)        # order 3/2
    order = 1.5
    while order < float(v):
        prev, cur = cur, prev - (2.0 * order / zs) * cur
        order += 1.0
    return cur


def _branch_args(v, z):
    """(small, zs, zq): guarded arguments for the two branches. Both
    branches must see finite, non-overflowing inputs — jnp.where's VJP
    multiplies the UNTAKEN branch's residuals by a zero cotangent, which
    still NaNs on inf/NaN residuals (observed as NaN grads in vMF training
    once the concentration head grew past ~300)."""
    thr = _small_threshold(v)
    small = z < thr
    zs = jnp.where(small, thr, z)   # recurrence arg: keep 1/z finite
    zq = jnp.where(small, z, 0.5)   # series arg: keep powers bounded
    return small, zs, zq


def ive(v, z):
    """Exponentially scaled modified Bessel I_v(z) * exp(-z) for z >= 0.

    v must be a static non-negative integer or half-integer. For
    z < max(1, v) the ascending series is used (the upward recurrence is
    unstable there); above, i0e/i1e (or the half-integer closed forms) +
    upward recurrence.
    """
    z = jnp.asarray(z)
    small, zs, zq = _branch_args(v, z)
    series = jnp.exp(-zq) * (0.5 * zq) ** float(v) * _series_scaled(v, zq)
    return jnp.where(small, series, _recurrence(v, zs))


def log_ive(v, z):
    """log(I_v(z)) - z, cancellation-free for small z: the series branch
    returns v log(z/2) + log S_v - z directly, so it neither underflows
    ((z/2)^v for v >= 3 underflows float32 below z ~ 1e-4) nor loses the
    v log z singularity that must cancel against the v log kappa term of
    the vMF normalizer."""
    z = jnp.asarray(z)
    small, zs, zq = _branch_args(v, z)
    tiny = jnp.asarray(jnp.finfo(z.dtype).tiny, z.dtype)
    series = (float(v) * jnp.log(0.5 * jnp.maximum(zq, tiny))
              + jnp.log(_series_scaled(v, zq)) - zq)
    rec = jnp.log(jnp.maximum(_recurrence(v, zs), 1e-30))
    return jnp.where(small, series, rec)


def bessel_ratio(v, z):
    """A(z) = I_{v+1}(z) / I_v(z), stable at both ends.

    The naive ive/ive ratio is 0/0 once (z/2)^{v+1} underflows (float32:
    z <~ 1e-4 already for v = 3, i.e. any vMF head with p >= 8 and a small
    concentration output) — the series branch computes the ratio of the
    SCALED series instead: A = (z/2) S_{v+1}(z) / S_v(z).
    """
    z = jnp.asarray(z)
    small, zs, zq = _branch_args(float(v) + 1.0, z)
    series = 0.5 * zq * (_series_scaled(float(v) + 1.0, zq)
                         / _series_scaled(v, zq))
    rec = (_recurrence(float(v) + 1.0, zs)
           / jnp.maximum(_recurrence(v, zs), 1e-30))
    return jnp.where(small, series, rec)


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
        a = bessel_ratio(v, k)
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
