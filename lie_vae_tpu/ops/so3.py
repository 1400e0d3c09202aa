"""SO(3) group and algebra operations — pure jnp, batched, total.

TPU-first re-design of the reference ``lie_vae/lie_tools.py``:

- every function is fully batched over arbitrary leading dims (the reference's
  ``log_map`` at lie_tools.py:100-109 is single-matrix only);
- the exponential map is *total*: Taylor-guarded at ``theta -> 0`` (the
  reference ``rodrigues`` at lie_tools.py:56-64 NaNs at the identity);
- guards use the double-``where`` pattern so ``jax.grad`` is NaN-free;
- no data-dependent Python control flow, everything jit/vmap/grad-safe.

Numerical conventions (quaternion layout, Euler extraction, case selection)
match the reference bit-for-bit where it is well-defined; citations are given
per function.
"""
import math

import jax
import jax.numpy as jnp

__all__ = [
    "hat", "vee", "map_to_lie_algebra", "map_to_lie_vector",
    "rodrigues", "expmap", "logmap", "log_map",
    "s2s1rodrigues", "s2s2_gram_schmidt", "vector_to_eazyz",
    "group_matrix_to_quaternions", "quaternions_to_eazyz",
    "group_matrix_to_eazyz", "quaternions_to_group_matrix",
    "eazyz_to_group_matrix",
    "random_quaternions", "random_group_matrices",
]

# Small-angle crossover for Taylor branches. Below this theta^2 the 4th-order
# Taylor series is more accurate than the trig expression in float32.
_SMALL = 1e-8


def hat(v):
    """'hat' map R^3 -> so(3): skew-symmetric matrix K with K@x = v x x.

    Reference: map_to_lie_algebra, lie_vae/lie_tools.py:17-43 (same basis
    L_x, L_y, L_z). Implemented as a direct scatter-free stack instead of a
    sum of three constant-matrix scalings.
    """
    v = jnp.asarray(v)
    assert v.shape[-1] == 3, "input must be (..., 3)"
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    return rows


def vee(X):
    """'vee' map so(3) -> R^3, inverse of :func:`hat`.

    Reference: map_to_lie_vector, lie_vae/lie_tools.py:46-53.
    """
    return jnp.stack((-X[..., 1, 2], X[..., 0, 2], -X[..., 0, 1]), -1)


# Reference-parity aliases.
map_to_lie_algebra = hat
map_to_lie_vector = vee


def expmap(v):
    """Exponential map R^3 -> SO(3) via the Rodrigues formula, total at 0.

    R = I + (sin t / t) K + ((1 - cos t) / t^2) K^2 with K = hat(v), t = |v|.
    Equals the reference ``rodrigues`` (lie_vae/lie_tools.py:56-64) away from
    t = 0 and extends it smoothly (Taylor, exact to O(t^6)) at the identity,
    with NaN-free gradients (double-where pattern).
    """
    v = jnp.asarray(v)
    K = hat(v)
    K2 = K @ K
    t2 = jnp.sum(v * v, axis=-1)[..., None, None]
    small = t2 < _SMALL
    t2s = jnp.where(small, 1.0, t2)           # safe denominator
    ts = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
                  (1.0 - jnp.cos(ts)) / t2s)
    eye = jnp.eye(3, dtype=v.dtype)
    return eye + a * K + b * K2


# Reference-parity alias.
rodrigues = expmap


def logmap(R):
    """Log map SO(3) -> so(3) (3x3 algebra element), fully batched and
    TOTAL — defined on all of SO(3) including the theta = pi antipodes.

    Generic branch: theta = acos((tr R - 1)/2);
    X = theta / (2 sin theta) * (R - R^T), Taylor-guarded at theta -> 0.
    Near the antipode (cos theta < -0.9) the antisymmetric part vanishes
    and that formula degenerates, so the axis is recovered through the
    Shepperd quaternion extraction instead (stable in every trace regime;
    this repo's reference-pinned layout is q = (xyz, w) with the vector
    part NEGATED relative to Hamilton, hence the -2 factor below). At
    exactly theta = pi both +/- axis logs are valid; the quaternion
    case-select makes a deterministic choice.

    Reference: log_map, lie_vae/lie_tools.py:100-109 — which uses
    ``torch.trace`` (single-matrix only) and NaNs at both theta -> 0 and
    the antipode; this version batches over leading dims and is total.
    """
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)[..., None, None]
    cos_t = jnp.clip(0.5 * (tr - 1.0), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    t2 = theta * theta
    # the cos clip floors theta at arccos(1-1e-7) ~ 4.5e-4, so the Taylor
    # threshold must sit ABOVE that floor or the branch is unreachable
    small = t2 < 4e-6
    ts = jnp.where(small, 1.0, theta)
    # theta / sin(theta) ~ 1 + t^2/6 + 7 t^4 / 360
    coef = jnp.where(small, 1.0 + t2 / 6.0 + 7.0 * t2 * t2 / 360.0,
                     ts / jnp.sin(ts))
    x_generic = coef * 0.5 * (R - jnp.swapaxes(R, -1, -2))

    # antipode branch: v = -theta * xyz / |xyz| from the (w>=0) quaternion.
    q = group_matrix_to_quaternions(R)
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    n2 = jnp.sum(q[..., :3] ** 2, axis=-1, keepdims=True)
    # double-where sqrt guard (n -> 0 only far from the antipode, where
    # this branch is discarded — but its grads must stay finite)
    tiny = n2 < 1e-12
    n = jnp.sqrt(jnp.where(tiny, 1.0, n2))
    scale = jnp.where(tiny, -2.0, -2.0 * jnp.arctan2(n, q[..., 3:4]) / n)
    x_pi = hat(scale * q[..., :3])

    near_pi = cos_t < -0.9
    return jnp.where(near_pi, x_pi, x_generic)


# Reference-parity alias.
log_map = logmap


def s2s1rodrigues(s2_el, s1_el):
    """S^2 x S^1 -> SO(3): rotation about unit axis ``s2_el`` by the angle
    whose (cos, sin) is ``s1_el``.

    Reference: lie_vae/lie_tools.py:67-78 (identical formula).
    """
    K = hat(s2_el)
    cos_theta = s1_el[..., 0]
    sin_theta = s1_el[..., 1]
    eye = jnp.eye(3, dtype=s2_el.dtype)
    return (eye + sin_theta[..., None, None] * K
            + (1.0 - cos_theta)[..., None, None] * (K @ K))


def s2s2_gram_schmidt(v1, v2):
    """S^2 x S^2 -> SO(3) by Gram-Schmidt; rows are (e1, e2, e1 x e2).

    Reference: lie_vae/lie_tools.py:81-89, including the 1e-5 norm clamps.
    """
    u1 = v1
    e1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-5)
    u2 = v2 - jnp.sum(e1 * v2, axis=-1, keepdims=True) * e1
    e2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-5)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], -2)


def vector_to_eazyz(v):
    """R^3 -> ZYZ Euler angles via tanh squash into (-pi,pi)x(0,pi)x(-pi,pi).

    Reference: lie_vae/lie_tools.py:92-97.
    """
    angles = jnp.tanh(v)
    scale = jnp.asarray([math.pi, math.pi / 2, math.pi], dtype=angles.dtype)
    shift = jnp.asarray([0.0, math.pi / 2, 0.0], dtype=angles.dtype)
    return angles * scale + shift


def group_matrix_to_quaternions(r):
    """Batched SO(3) matrix -> quaternion, 4-case Shepperd-style selection.

    Bit-matches the reference (lie_vae/lie_tools.py:112-157): the same
    stacked denominators with the 1e-6 guard, the same per-case numerators,
    and case selection by argmax over the (gradient-stopped) denominators.
    """
    r = jnp.asarray(r)
    assert r.shape[-2:] == (3, 3), "input must be (..., 3, 3)"
    batch_shape = r.shape[:-2]
    r = r.reshape((-1, 3, 3))

    d0, d1, d2 = r[:, 0, 0], r[:, 1, 1], r[:, 2, 2]
    denom_pre = jnp.stack([
        1.0 + d0 - d1 - d2,
        1.0 - d0 + d1 - d2,
        1.0 - d0 - d1 + d2,
        1.0 + d0 + d1 + d2,
    ], -1)
    denom = 0.5 * jnp.sqrt(1e-6 + jnp.abs(denom_pre))

    case0 = jnp.stack([
        denom[:, 0],
        (r[:, 0, 1] + r[:, 1, 0]) / (4.0 * denom[:, 0]),
        (r[:, 0, 2] + r[:, 2, 0]) / (4.0 * denom[:, 0]),
        (r[:, 1, 2] - r[:, 2, 1]) / (4.0 * denom[:, 0]),
    ], -1)
    case1 = jnp.stack([
        (r[:, 0, 1] + r[:, 1, 0]) / (4.0 * denom[:, 1]),
        denom[:, 1],
        (r[:, 1, 2] + r[:, 2, 1]) / (4.0 * denom[:, 1]),
        (r[:, 2, 0] - r[:, 0, 2]) / (4.0 * denom[:, 1]),
    ], -1)
    case2 = jnp.stack([
        (r[:, 0, 2] + r[:, 2, 0]) / (4.0 * denom[:, 2]),
        (r[:, 1, 2] + r[:, 2, 1]) / (4.0 * denom[:, 2]),
        denom[:, 2],
        (r[:, 0, 1] - r[:, 1, 0]) / (4.0 * denom[:, 2]),
    ], -1)
    case3 = jnp.stack([
        (r[:, 1, 2] - r[:, 2, 1]) / (4.0 * denom[:, 3]),
        (r[:, 2, 0] - r[:, 0, 2]) / (4.0 * denom[:, 3]),
        (r[:, 0, 1] - r[:, 1, 0]) / (4.0 * denom[:, 3]),
        denom[:, 3],
    ], -1)

    cases = jnp.stack([case0, case1, case2, case3], 1)          # (B, 4, 4)
    sel = jnp.argmax(jax.lax.stop_gradient(denom), axis=-1)     # (B,)
    q = jnp.take_along_axis(cases, sel[:, None, None], axis=1)[:, 0]
    return q.reshape(batch_shape + (4,))


def quaternions_to_eazyz(q):
    """Batched quaternion -> ZYZ Euler angles; output is not mod 2pi.

    Reference: lie_vae/lie_tools.py:160-175 (identical component formulas and
    the +/-(1 - 1e-6) clamp before acos).
    """
    q = jnp.asarray(q)
    assert q.shape[-1] == 4, "input must be (..., 4)"
    eps = 1e-6
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    alpha = jnp.arctan2(q1 * q2 - q0 * q3, q0 * q2 + q1 * q3)
    beta = jnp.arccos(jnp.clip(q3 ** 2 - q0 ** 2 - q1 ** 2 + q2 ** 2,
                               -1.0 + eps, 1.0 - eps))
    gamma = jnp.arctan2(q0 * q3 + q1 * q2, q1 * q3 - q0 * q2)
    return jnp.stack([alpha, beta, gamma], -1)


def group_matrix_to_eazyz(r):
    """Batched SO(3) matrix -> ZYZ Euler angles.

    Reference: lie_vae/lie_tools.py:178-180.
    """
    return quaternions_to_eazyz(group_matrix_to_quaternions(r))


def eazyz_to_group_matrix(angles):
    """Batched ZYZ Euler angles -> SO(3) matrix; the inverse of
    :func:`group_matrix_to_eazyz`.

    In this repo's Euler convention (pinned by quaternions_to_eazyz,
    lie_vae/lie_tools.py:160-175) the matrix recovers as
    R = Rz(-gamma) @ Ry(-beta) @ Rz(-alpha). The reference obtains the
    same map through lie_learn's ``SO3_coordinates(..., 'EA323', 'MAT')``
    (toy_results.ipynb cell 13); this implementation is round-trip-tested
    against group_matrix_to_eazyz instead of depending on lie_learn.
    """
    angles = jnp.asarray(angles)
    assert angles.shape[-1] == 3, "input must be (..., 3)"
    al, be, ga = angles[..., 0], angles[..., 1], angles[..., 2]

    def _rz(t):
        c, s = jnp.cos(t), jnp.sin(t)
        z, o = jnp.zeros_like(t), jnp.ones_like(t)
        return jnp.stack([jnp.stack([c, -s, z], -1),
                          jnp.stack([s, c, z], -1),
                          jnp.stack([z, z, o], -1)], -2)

    def _ry(t):
        c, s = jnp.cos(t), jnp.sin(t)
        z, o = jnp.zeros_like(t), jnp.ones_like(t)
        return jnp.stack([jnp.stack([c, z, s], -1),
                          jnp.stack([z, o, z], -1),
                          jnp.stack([-s, z, c], -1)], -2)

    return _rz(-ga) @ _ry(-be) @ _rz(-al)


def quaternions_to_group_matrix(q):
    """Normalise q and map to a rotation matrix.

    Uses the reference's (non-Hamilton) sign convention exactly
    (lie_vae/lie_tools.py:183-192) so that round trips with
    :func:`group_matrix_to_quaternions` and the Euler extraction agree.
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = jnp.stack([
        r * r - i * i - j * j + k * k, 2 * (r * i + j * k), 2 * (r * j - i * k),
        2 * (r * i - j * k), -r * r + i * i - j * j + k * k, 2 * (i * j + r * k),
        2 * (r * j + i * k), 2 * (i * j - r * k), -r * r - i * i + j * j + k * k,
    ], -1)
    return m.reshape(q.shape[:-1] + (3, 3))


def random_quaternions(key, n, dtype=jnp.float32):
    """Haar-uniform quaternions via the subgroup algorithm.

    Reference: lie_vae/lie_tools.py:256-263 (same construction from
    u1, u2, u3 ~ U[0, 1)).
    """
    u = jax.random.uniform(key, (3, n), dtype=dtype)
    u1, u2, u3 = u[0], u[1], u[2]
    two_pi = 2.0 * math.pi
    return jnp.stack((
        jnp.sqrt(1.0 - u1) * jnp.sin(two_pi * u2),
        jnp.sqrt(1.0 - u1) * jnp.cos(two_pi * u2),
        jnp.sqrt(u1) * jnp.sin(two_pi * u3),
        jnp.sqrt(u1) * jnp.cos(two_pi * u3),
    ), -1)


def random_group_matrices(key, n, dtype=jnp.float32):
    """Haar-uniform rotation matrices. Reference: lie_vae/lie_tools.py:266-267."""
    return quaternions_to_group_matrix(random_quaternions(key, n, dtype))
