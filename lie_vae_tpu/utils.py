"""Small shared utilities (reference: lie_vae/utils.py and
lie_vae/experiments/utils.py helpers that aren't covered elsewhere —
Subset/random_split live in data.splits, schedules in train.schedules)."""
import jax.numpy as jnp


def logsumexp(x, axis=None, keepdims=False):
    """Numerically stable log-sum-exp (reference: lie_vae/utils.py:4-26).

    jnp-native; provided for API parity — internal code uses
    jax.nn.logsumexp directly.
    """
    import jax

    if axis is None:
        x = jnp.reshape(x, (-1,))
        axis = 0
    return jax.nn.logsumexp(x, axis=axis, keepdims=keepdims)


def expand_dim(x, n, axis=0):
    """Insert a broadcast axis of size n (reference:
    experiments/utils.py:82-85)."""
    return jnp.broadcast_to(
        jnp.expand_dims(x, axis),
        x.shape[:axis % (x.ndim + 1)] + (n,) + x.shape[axis % (x.ndim + 1):])


def cycle(iterable):
    """Cycle an iterable without caching items (reference:
    experiments/utils.py:75-79)."""
    while True:
        for x in iterable:
            yield x
