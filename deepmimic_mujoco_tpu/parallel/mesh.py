"""Multi-chip scaling: env-batch data parallelism over a device mesh.

The reference's entire distributed story is 32 subprocess env workers
over OS pipes plus MPI gradient averaging in a legacy flow (reference:
src/sb3_ppo.py:275-278, README.md:33-38). Here the env batch is a
sharded array axis: envs are split across chips with
``NamedSharding(mesh, P("data"))``, parameters are replicated, and the
PPO update's gradient reduction lowers to XLA psums over ICI — no
explicit communication code.

Scaling recipe (per the standard JAX playbook): pick the mesh, annotate
the batch axis, jit, let the compiler insert collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (env/batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(ts, mesh: Mesh):
    """Place a PPO TrainState: env-indexed leaves sharded on the data
    axis, parameters/optimizer replicated."""
    data = data_sharding(mesh)
    rep = replicated(mesh)

    n_envs = ts.last_obs.shape[0]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_envs:
            return jax.device_put(x, data)
        return jax.device_put(x, rep)

    env_states = jax.tree.map(place, ts.env_states)
    extra = {}
    if getattr(ts, "handoff_buf", None) is not None:
        # the handoff ring buffer is shared global state: replicated
        extra["handoff_buf"] = jax.tree.map(
            lambda x: jax.device_put(x, rep), ts.handoff_buf)
    return ts._replace(
        env_states=env_states,
        **extra,
        last_obs=jax.device_put(ts.last_obs, data),
        ep_return=jax.device_put(ts.ep_return, data),
        ep_length=jax.device_put(ts.ep_length, data),
        params=jax.tree.map(lambda x: jax.device_put(x, rep), ts.params),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, rep)
            if hasattr(x, "ndim") else x, ts.opt_state),
        key=jax.device_put(ts.key, rep),
        global_step=jax.device_put(ts.global_step, rep),
    )
