"""Host-side numpy math for data pipelines (no device round-trips in loaders).

Same conventions as lie_vae_tpu.ops (which are the reference's conventions:
quaternion layout of lie_vae/lie_tools.py:183-192, Haar sampling of
lie_tools.py:256-263).
"""
import numpy as np


def quaternions_to_group_matrix_np(q):
    """Normalise and map to rotation matrices; numpy mirror of
    ops.quaternions_to_group_matrix (used for filename pose labels, replacing
    the reference's lie_learn SO3_coordinates call at datasets.py:61-62 —
    equivalent per the reference's own test, lie_tools.py:294-310)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.stack([
        r * r - i * i - j * j + k * k, 2 * (r * i + j * k), 2 * (r * j - i * k),
        2 * (r * i - j * k), -r * r + i * i - j * j + k * k, 2 * (i * j + r * k),
        2 * (r * j + i * k), 2 * (i * j - r * k), -r * r - i * i + j * j + k * k,
    ], -1)
    return m.reshape(q.shape[:-1] + (3, 3)).astype(np.float32)


def random_quaternions_np(n, rng):
    """Haar-uniform quaternions (subgroup algorithm)."""
    u1, u2, u3 = rng.uniform(size=(3, n))
    two_pi = 2.0 * np.pi
    return np.stack((
        np.sqrt(1.0 - u1) * np.sin(two_pi * u2),
        np.sqrt(1.0 - u1) * np.cos(two_pi * u2),
        np.sqrt(u1) * np.sin(two_pi * u3),
        np.sqrt(u1) * np.cos(two_pi * u3),
    ), -1).astype(np.float32)
