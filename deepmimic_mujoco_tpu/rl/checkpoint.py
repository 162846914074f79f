"""Checkpointing (orbax): params + optimizer + env/train state.

The reference checkpoints model weights only via SB3 save/load
(reference: src/sb3_ppo.py:314, :137-138, :222-225); here the full
training state (policy, optimizer moments, PRNG, global step) is saved
so runs resume exactly — plus a params-only artifact for deployment.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save(path: str, train_state) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _np_tree(train_state._asdict()), force=True)
    return path


def restore(path: str, train_state_template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=_np_tree(
        train_state_template._asdict()))
    return type(train_state_template)(**restored)


def save_params(path: str, params) -> str:
    """Params-only artifact (deployment / eval)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    ocp.PyTreeCheckpointer().save(path, _np_tree(params), force=True)
    return path


def restore_params(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    return ocp.PyTreeCheckpointer().restore(
        path, item=_np_tree(template) if template is not None else None)


def adapt_params(params, template):
    """Adapt a params tree to a template with a WIDER observation input.

    Cross-env warm starts (DPEnv checkpoint -> DPCombinedEnv trainer)
    differ only in the first-layer input width: the combined env
    appends player-action dims to the END of the obs vector
    (envs/obs.py:get_obs), so the extra kernel rows are zero-padded at
    the bottom — new obs dims initially contribute nothing and the
    pretrained mapping is preserved exactly. Any other shape mismatch
    is an error.
    """

    def one(p, t):
        p = np.asarray(p)
        t = np.asarray(t)
        if p.shape == t.shape:
            return p
        if (p.ndim == 2 and t.ndim == 2 and p.shape[1] == t.shape[1]
                and t.shape[0] > p.shape[0]):
            pad = np.zeros((t.shape[0] - p.shape[0], p.shape[1]), p.dtype)
            return np.concatenate([p, pad], axis=0)
        raise ValueError(
            f"cannot adapt param of shape {p.shape} to {t.shape}")

    if jax.tree.structure(params) != jax.tree.structure(template):
        raise ValueError("params tree structure mismatch")
    return jax.tree.map(one, params, template)
