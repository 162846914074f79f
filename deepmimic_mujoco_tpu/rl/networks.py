"""Policy/value networks (flax) matching the reference's SB3 MlpPolicy.

Separate tanh MLP trunks for actor and critic with net_arch [256, 128]
(reference: src/sb3_ppo.py:265), orthogonal init (sqrt(2) hidden, 0.01
policy head, 1.0 value head), diagonal Gaussian with a state-independent
log-std parameter initialized to 0 — the SB3 defaults the reference
trains with. Widths are configurable ([1024, 512] for the SAC variant,
src/sac_sb3.py:38).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ActorCritic(nn.Module):
    action_dim: int
    net_arch: Sequence[int] = (256, 128)
    init_log_std: float = 0.0  # SB3 default; lower for torque control
    # Clamp on the log-std parameter (SB3 leaves it unbounded; bounding
    # it prevents exploration collapse -> ratio/KL explosion in long
    # runs without changing well-behaved training).
    log_std_min: float = -4.0
    log_std_max: float = 1.0

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        ortho = nn.initializers.orthogonal
        x = obs
        for w in self.net_arch:
            x = nn.tanh(nn.Dense(w, kernel_init=ortho(jnp.sqrt(2)))(x))
        mean = nn.Dense(self.action_dim, kernel_init=ortho(0.01))(x)

        v = obs
        for w in self.net_arch:
            v = nn.tanh(nn.Dense(w, kernel_init=ortho(jnp.sqrt(2)))(v))
        value = nn.Dense(1, kernel_init=ortho(1.0))(v)[..., 0]

        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.init_log_std),
            (self.action_dim,))
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mean, log_std, value


def sample_action(key, mean, log_std):
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * noise
    logp = gaussian_logp(action, mean, log_std)
    return action, logp


def gaussian_logp(action, mean, log_std):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return (-0.5 * z ** 2 - log_std
            - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)


def gaussian_entropy(log_std):
    return (log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e)).sum(-1)
