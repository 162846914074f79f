"""On-device SAC: device-resident replay buffer, twin critics, squashed
Gaussian actor with automatic entropy tuning.

The TPU-native counterpart of the reference's SB3 SAC variant
(reference: src/sac_sb3.py:20-89 — buffer 5M, net_arch [1024, 512], 32
subprocess envs). Collection and updates are one jitted iteration:
vmapped envs write into a ring buffer that never leaves HBM.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


@dataclasses.dataclass
class SACConfig:
    n_envs: int = 256
    buffer_size: int = 1_000_000
    batch_size: int = 1024
    steps_per_iter: int = 32          # env steps collected per iteration
    updates_per_iter: int = 32        # gradient updates per iteration
    lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    net_arch: tuple = (1024, 512)
    action_scale: float = 1.0
    total_timesteps: int = 10_000_000
    # --- stability knobs (round-4; see runs/sac20260819-1242_23:
    # alpha collapsed to ~0.001 by 12M steps — saturated tanh actions
    # make logp explode, which crushes the temperature — after which
    # the critic destabilized periodically (loss 0.9 -> 119 at 51M)
    # and reset all progress) -------------------------------------
    # temperature: slower lr + hard floor so exploration never dies
    alpha_lr: float = 1e-4
    log_alpha_min: float = -4.6        # alpha >= ~0.01
    # freeze actor updates for the first N env steps so the critic
    # fits the (possibly warm-started) data distribution first
    critic_warmup_steps: int = 0
    # separate actor lr (None = cfg.lr); a distilled warm-started
    # actor wants a much gentler rate than the critic or the BC prior
    # is destroyed the moment the warmup ends
    actor_lr: float = None


class Actor(nn.Module):
    action_dim: int
    net_arch: tuple

    @nn.compact
    def __call__(self, obs):
        x = obs
        for w in self.net_arch:
            x = nn.relu(nn.Dense(w)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(nn.Dense(self.action_dim)(x), -20.0, 2.0)
        return mean, log_std


class Critic(nn.Module):
    net_arch: tuple

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        for w in self.net_arch:
            x = nn.relu(nn.Dense(w)(x))
        return nn.Dense(1)(x)[..., 0]


class DoubleCritic(nn.Module):
    net_arch: tuple

    @nn.compact
    def __call__(self, obs, action):
        return (Critic(self.net_arch)(obs, action),
                Critic(self.net_arch)(obs, action))


def _squash_sample(key, mean, log_std):
    std = jnp.exp(log_std)
    z = mean + std * jax.random.normal(key, mean.shape)
    a = jnp.tanh(z)
    logp = (-0.5 * ((z - mean) / std) ** 2 - log_std
            - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
    logp -= jnp.log(1 - a ** 2 + 1e-6).sum(-1)
    return a, logp


class SACState(NamedTuple):
    actor: Any
    critic: Any
    target_critic: Any
    log_alpha: jnp.ndarray
    opt_actor: Any
    opt_critic: Any
    opt_alpha: Any
    env_states: Any
    last_obs: jnp.ndarray
    buffer: Any             # dict of ring arrays
    buf_pos: jnp.ndarray
    buf_full: jnp.ndarray
    key: jnp.ndarray
    global_step: jnp.ndarray
    # running per-env episode accounting (mirrors PPO's TrainState)
    ep_return: jnp.ndarray
    ep_length: jnp.ndarray


class SAC:
    def __init__(self, env, cfg: Optional[SACConfig] = None):
        self.env = env
        self.cfg = cfg or SACConfig()
        self.actor = Actor(env.action_size, tuple(self.cfg.net_arch))
        self.critic = DoubleCritic(tuple(self.cfg.net_arch))
        self.tx = optax.adam(self.cfg.lr)
        self.tx_actor = optax.adam(self.cfg.actor_lr
                                   if self.cfg.actor_lr is not None
                                   else self.cfg.lr)
        self.tx_alpha = optax.adam(self.cfg.alpha_lr)
        self.target_entropy = -float(env.action_size)
        self._train_iter = jax.jit(self._train_iter_impl, donate_argnums=0)

    def init(self, seed: int = 0, init_actor=None) -> SACState:
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        key, ka, kc, kr = jax.random.split(key, 4)
        obs0 = jnp.zeros((self.env.obs_size,), jnp.float32)
        act0 = jnp.zeros((self.env.action_size,), jnp.float32)
        actor = self.actor.init(ka, obs0)
        if init_actor is not None:  # e.g. distilled from a PPO policy
            actor = jax.tree.map(jnp.asarray, init_actor)
        critic = self.critic.init(kc, obs0, act0)
        log_alpha = jnp.zeros(())
        env_states, obs = jax.jit(jax.vmap(self.env.reset))(
            jax.random.split(kr, cfg.n_envs))
        n = cfg.buffer_size
        buffer = dict(
            obs=jnp.zeros((n, self.env.obs_size), jnp.float32),
            action=jnp.zeros((n, self.env.action_size), jnp.float32),
            reward=jnp.zeros((n,), jnp.float32),
            next_obs=jnp.zeros((n, self.env.obs_size), jnp.float32),
            done=jnp.zeros((n,), jnp.float32),
        )
        # target must not alias critic buffers (the jitted train iter
        # donates its input state; aliased leaves would be donated twice)
        target_critic = jax.tree.map(jnp.copy, critic)
        return SACState(
            actor=actor, critic=critic, target_critic=target_critic,
            log_alpha=log_alpha, opt_actor=self.tx_actor.init(actor),
            opt_critic=self.tx.init(critic),
            opt_alpha=self.tx_alpha.init(log_alpha),
            env_states=env_states, last_obs=obs, buffer=buffer,
            buf_pos=jnp.zeros((), jnp.int32),
            buf_full=jnp.zeros((), bool),
            key=key, global_step=jnp.zeros((), jnp.int32),
            ep_return=jnp.zeros(cfg.n_envs, jnp.float32),
            ep_length=jnp.zeros(cfg.n_envs, jnp.int32))

    def _train_iter_impl(self, s: SACState):
        cfg = self.cfg
        B = cfg.n_envs

        # ---- collect -----------------------------------------------------
        def collect(carry, _):
            env_states, obs, buffer, pos, key, ep_ret, ep_len = carry
            key, ak = jax.random.split(key)
            mean, log_std = self.actor.apply(s.actor, obs)
            a, _ = _squash_sample(ak, mean, log_std)
            env_states, out = jax.vmap(self.env.step_auto_reset)(
                env_states, a * cfg.action_scale)
            idx = (pos + jnp.arange(B)) % cfg.buffer_size
            buffer = dict(
                obs=buffer["obs"].at[idx].set(obs),
                action=buffer["action"].at[idx].set(a),
                reward=buffer["reward"].at[idx].set(out.reward),
                next_obs=buffer["next_obs"].at[idx].set(out.obs),
                done=buffer["done"].at[idx].set(
                    out.done.astype(jnp.float32)),
            )
            ep_ret = ep_ret + out.reward
            ep_len = ep_len + 1
            done_f = out.done.astype(jnp.float32)
            stats = (out.reward.mean(), (ep_ret * done_f).sum(),
                     done_f.sum(), (ep_len * out.done).sum())
            ep_ret = jnp.where(out.done, 0.0, ep_ret)
            ep_len = jnp.where(out.done, 0, ep_len)
            return (env_states, out.obs, buffer,
                    (pos + B) % cfg.buffer_size, key, ep_ret, ep_len), stats

        (env_states, last_obs, buffer, pos, key, ep_ret, ep_len), \
            (rews, ep_ret_sum, ep_cnt, ep_len_sum) = jax.lax.scan(
                collect, (s.env_states, s.last_obs, s.buffer, s.buf_pos,
                          s.key, s.ep_return, s.ep_length),
                None, length=cfg.steps_per_iter)
        full = s.buf_full | (pos < s.buf_pos)
        valid = jnp.where(full, cfg.buffer_size,
                          jnp.maximum(pos, 1))

        # ---- update ------------------------------------------------------
        def update(carry, _):
            actor, critic, target, log_alpha, oa, oc, oal, key = carry
            key, ks, kn, kp = jax.random.split(key, 4)
            idx = jax.random.randint(ks, (cfg.batch_size,), 0, valid)
            b_obs = buffer["obs"][idx]
            b_act = buffer["action"][idx]
            b_rew = buffer["reward"][idx]
            b_next = buffer["next_obs"][idx]
            b_done = buffer["done"][idx]
            alpha = jnp.exp(log_alpha)

            mean_n, log_std_n = self.actor.apply(actor, b_next)
            a_next, logp_next = _squash_sample(kn, mean_n, log_std_n)
            q1t, q2t = self.critic.apply(target, b_next, a_next)
            q_target = b_rew + cfg.gamma * (1 - b_done) * (
                jnp.minimum(q1t, q2t) - alpha * logp_next)

            def critic_loss(cp):
                q1, q2 = self.critic.apply(cp, b_obs, b_act)
                return (((q1 - q_target) ** 2).mean()
                        + ((q2 - q_target) ** 2).mean())

            closs, cgrad = jax.value_and_grad(critic_loss)(critic)
            cup, oc = self.tx.update(cgrad, oc, critic)
            critic = optax.apply_updates(critic, cup)

            def actor_loss(ap):
                mean, log_std = self.actor.apply(ap, b_obs)
                a, logp = _squash_sample(kp, mean, log_std)
                q1, q2 = self.critic.apply(critic, b_obs, a)
                return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

            (aloss, logp), agrad = jax.value_and_grad(
                actor_loss, has_aux=True)(actor)
            # critic warmup: zero the GRADIENT (not just the applied
            # update) until the critic has fit the warm-start data
            # distribution — zeroing only the update would let Adam
            # moments accumulate during the freeze and release a stale
            # momentum burst the moment warmup ends
            warm = (s.global_step >= cfg.critic_warmup_steps).astype(
                jnp.float32)
            agrad = jax.tree.map(lambda g: g * warm, agrad)
            aup, oa = self.tx_actor.update(agrad, oa, actor)
            actor = optax.apply_updates(actor, aup)

            def alpha_loss(la):
                return -(jnp.exp(la) * (logp + self.target_entropy)).mean()

            alloss, algrad = jax.value_and_grad(alpha_loss)(log_alpha)
            alup, oal = self.tx_alpha.update(algrad, oal, log_alpha)
            log_alpha = jnp.clip(optax.apply_updates(log_alpha, alup),
                                 cfg.log_alpha_min, 2.0)

            target = jax.tree.map(
                lambda t, c: t * (1 - cfg.tau) + c * cfg.tau, target, critic)
            return (actor, critic, target, log_alpha, oa, oc, oal, key), \
                (closs, aloss)

        (actor, critic, target, log_alpha, oa, oc, oal, key), losses = \
            jax.lax.scan(update,
                         (s.actor, s.critic, s.target_critic, s.log_alpha,
                          s.opt_actor, s.opt_critic, s.opt_alpha, key),
                         None, length=cfg.updates_per_iter)

        new = SACState(
            actor=actor, critic=critic, target_critic=target,
            log_alpha=log_alpha, opt_actor=oa, opt_critic=oc, opt_alpha=oal,
            env_states=env_states, last_obs=last_obs, buffer=buffer,
            buf_pos=pos, buf_full=full, key=key,
            global_step=s.global_step + B * cfg.steps_per_iter,
            ep_return=ep_ret, ep_length=ep_len)
        return new, (rews.mean(), losses[0].mean(), losses[1].mean(),
                     ep_ret_sum.sum(), ep_cnt.sum(), ep_len_sum.sum(),
                     jnp.exp(log_alpha))

    def train(self, total_timesteps: Optional[int] = None, seed: int = 0,
              verbose: bool = True, callback=None, init_actor=None):
        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        s = self.init(seed, init_actor=init_actor)
        per_iter = cfg.n_envs * cfg.steps_per_iter
        t0 = time.time()
        for it in range(max(total // per_iter, 1)):
            s, stats = self._train_iter(s)
            if callback is not None:
                callback(it, s, stats)
            if verbose and it % 10 == 0:
                r, closs, aloss, eps, epc, epl, alpha = stats
                sps = (it + 1) * per_iter / (time.time() - t0)
                ep_r = float(eps) / max(float(epc), 1.0)
                ep_l = float(epl) / max(float(epc), 1.0)
                print(f"iter {it:5d} step {(it + 1) * per_iter:>11,} "
                      f"sps {sps:>10,.0f} r {float(r):.3f} "
                      f"ep_rew {ep_r:8.2f} ep_len {ep_l:6.1f} "
                      f"closs {float(closs):.3f} aloss {float(aloss):.3f} "
                      f"alpha {float(alpha):.3f}",
                      flush=True)
        return s

    def act(self, actor_params, obs, deterministic=True, key=None):
        mean, log_std = self.actor.apply(actor_params, jnp.asarray(obs))
        if deterministic:
            return jnp.tanh(mean) * self.cfg.action_scale
        a, _ = _squash_sample(key, mean, log_std)
        return a * self.cfg.action_scale
