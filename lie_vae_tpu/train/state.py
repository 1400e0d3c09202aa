"""Train state and optimizer construction.

The optimizer chain reproduces the reference's update semantics
(lie_vae/experiments/unsupervised.py:108-117): gradients are global-norm
clipped FIRST (default clip 1e-5, main.py:171), optionally only over the
encoder + reparameterizer parameters ('selective clip',
unsupervised.py:111-116), then Adam applies torch-style L2 weight decay
(coupled, i.e. added to the clipped gradient — torch.optim.Adam semantics,
main.py:86-87).
"""
from typing import Any, Optional

import jax
import optax
from flax import core, struct


@struct.dataclass
class TrainState:
    step: int
    params: core.FrozenDict
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=params, opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=0, params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), tx=tx)


def _selective_mask(params):
    """True for the encoder + reparameterizer subtrees (the targets of the
    reference's selective clip, unsupervised.py:111-114)."""
    mask = {k: jax.tree_util.tree_map(
        lambda _: k in ("encoder", "rep_group"), v)
        for k, v in params.items()}
    # guard against a silent no-op: if the model's attribute names ever
    # drift from encoder/rep_group, the mask would clip nothing
    assert any(jax.tree_util.tree_leaves(mask)), (
        "selective clip selected zero parameters — expected 'encoder' / "
        f"'rep_group' subtrees, found top-level keys {sorted(params)}")
    return mask


def make_optimizer(lr=1e-3, weight_decay=0.0, clip_grads=1e-5,
                   selective_clip=False, params=None):
    """optax chain: [masked] global-norm clip -> L2 weight decay -> Adam."""
    parts = []
    if clip_grads:
        clip = optax.clip_by_global_norm(clip_grads)
        if selective_clip:
            assert params is not None, "selective clip needs a params template"
            parts.append(optax.masked(clip, _selective_mask(params)))
        else:
            parts.append(clip)
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    # torch Adam defaults: b1=0.9, b2=0.999, eps=1e-8
    parts.append(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)
