"""Checkpoint save/restore via orbax.

Reference: torch.save(model.state_dict()) on test-recon improvement
(main.py:122-127) and --continue_epoch resume (main.py:72-75). Here the
full TrainState is saved — params, batch_stats, optimizer state, and step —
so resume continues the optimizer trajectory (the reference silently resets
Adam moments).
"""
import os

import jax
import orbax.checkpoint as ocp


def save_state(path, state):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_state(path, template_state):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
    }
    restored = ckptr.restore(path, template)
    return template_state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"])
