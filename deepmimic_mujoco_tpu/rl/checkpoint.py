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
