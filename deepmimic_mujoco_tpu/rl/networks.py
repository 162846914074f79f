"""Policy/value networks (flax) matching the reference's SB3 MlpPolicy.

Separate tanh MLP trunks for actor and critic with net_arch [256, 128]
(reference: src/sb3_ppo.py:265), orthogonal init (sqrt(2) hidden, 0.01
policy head, 1.0 value head), diagonal Gaussian with a state-independent
log-std parameter initialized to 0 — the SB3 defaults the reference
trains with. Widths are configurable ([1024, 512] for the SAC variant,
src/sac_sb3.py:38).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def clip_preserve_inward(x, lo, hi):
    """``jnp.clip`` with inward-preserving gradients.

    Value: identical to ``jnp.clip(x, lo, hi)`` — committed
    checkpoints replay bit-identically. Gradient: identity, except
    components that would push ``x`` further OUTSIDE the bounds are
    zeroed. A hard clip has exactly zero gradient once the raw
    parameter crosses a bound; observed failure mode (round-4 G1 run
    legs F/G): the log-std parameter decays below the floor, entropy
    freezes bit-identical for hundreds of iterations, and exploration
    can never re-open by gradient descent. With inward-preserving
    gradients the optimizer can always pull the parameter back inside,
    while outward drift past the bound stays blocked.
    """
    return jnp.clip(x, lo, hi)


def _cpi_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), x


def _cpi_bwd(lo, hi, x, g):
    # strict inequalities: for lo <= x <= hi the gradient is identity,
    # exactly like jnp.clip. Strictly outside, descent direction is
    # -g: below the floor block g > 0 (would push x further down),
    # above the ceiling block g < 0. Never blocks where clip wouldn't.
    g = jnp.where((x < lo) & (g > 0), 0.0, g)
    g = jnp.where((x > hi) & (g < 0), 0.0, g)
    return (g,)


clip_preserve_inward.defvjp(_cpi_fwd, _cpi_bwd)


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
        log_std = clip_preserve_inward(
            log_std, self.log_std_min, self.log_std_max)
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


class PDTargetActorCritic(ActorCritic):
    """ActorCritic whose action is a PD-style joint-space delta.

    The DeepMimic paper's key trainability lever is a PD action space;
    with a delta-from-current-pose target this reduces to a fixed
    per-joint affine transform of the network output:

        torque_i = kp_i * a_i - kd_i * qvel_i
        env_action = torque / act_scale

    Joint velocities are read from the observation itself (the env's
    obs layout puts ``qvel[6:] * vel_obs_scale`` right after
    ``qpos[7:]``, envs/obs.py:get_obs), so the deployed policy remains
    a pure obs -> env-action function — checkpoint playback and the
    reference's reward gates see a standard torque policy. Exploration
    noise lives in delta space: sampled noise becomes kp-scaled torque
    with velocity damping, which keeps random exploration from
    instantly destabilizing contact-rich poses.

    ``env_action`` is the bridge the trainer/eval call between
    sampling (delta space, where logp/ratios live) and the env (torque
    action space).
    """
    kp: Sequence[float] = ()
    kd: Sequence[float] = ()
    # obs columns holding each actuated joint's scaled qvel (the
    # actuator -> joint mapping is NOT contiguous: G1 interleaves arm
    # and hand joints, actuator_trnid 1..18,26..30,19..)
    qvel_cols: Sequence[int] = ()
    vel_obs_scale: float = 0.1
    act_scale: float = 20.0

    def env_action(self, obs, a_delta):
        kp = jnp.asarray(self.kp, a_delta.dtype)
        kd = jnp.asarray(self.kd, a_delta.dtype)
        cols = jnp.asarray(self.qvel_cols)
        qvel = obs[..., cols] / self.vel_obs_scale
        return (kp * a_delta - kd * qvel) / self.act_scale


def make_policy(kind: str, env, net_arch=(256, 128), init_log_std=0.0,
                log_std_min=-4.0, log_std_max=1.0):
    """Policy factory: "torque" (reference parity) or "pd" (PD-delta).

    PD gains default to the actuator ctrl range (full-scale torque at
    1 rad error) with kd = kp/10, the reference's kp:kd ratio
    (src/mujoco/mocap_util.py:22-24).
    """
    env = getattr(env, "env", env)   # unwrap GymDPEnv
    if kind == "torque":
        return ActorCritic(env.action_size, net_arch=tuple(net_arch),
                           init_log_std=init_log_std,
                           log_std_min=log_std_min,
                           log_std_max=log_std_max)
    if kind != "pd":
        raise ValueError(f"unknown policy kind: {kind}")
    import numpy as np

    m = env.model
    hi = np.asarray(m.actuator_ctrlrange[:env.action_size, 1], np.float32)
    kp = tuple(float(x) for x in hi)
    kd = tuple(float(x) / 10.0 for x in hi)
    # obs column of each actuated joint's scaled qvel: obs layout is
    # [qpos[7:] (nq-7) | qvel[6:] * scale (nv-6) | ...]
    trnid = np.asarray(m.actuator_trnid).reshape(m.nu, -1)[:, 0]
    dofadr = np.asarray(m.jnt_dofadr)[trnid[:env.action_size]]
    qvel_cols = tuple(int((m.nq - 7) + (d - 6)) for d in dofadr)
    return PDTargetActorCritic(
        env.action_size, net_arch=tuple(net_arch),
        init_log_std=init_log_std, log_std_min=log_std_min,
        log_std_max=log_std_max, kp=kp, kd=kd,
        qvel_cols=qvel_cols,
        vel_obs_scale=env.ENV_CFG.VEL_OBS_SCALE,
        act_scale=float(env.spec.act_scale))


def env_action(net, obs, action):
    """Map a policy-space action to the env action space (identity for
    plain torque policies)."""
    if hasattr(net, "env_action"):
        return net.env_action(obs, action)
    return action
