"""On-device PPO: rollout (lax.scan) -> GAE -> clipped update, all jit.

Replaces the reference's SB3 PPO over 32 subprocess envs (reference:
src/sb3_ppo.py:244-314 — horizon 4096, minibatch 4096, 20 epochs,
lr 4e-4) with a single XLA program per iteration: physics, mocap
sampling, reward, auto-reset, GAE and the policy update never leave the
device. Multi-chip scaling shards the env batch over a
``jax.sharding.Mesh`` data axis; XLA inserts the gradient psums.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepmimic_mujoco_tpu.rl import networks


@dataclasses.dataclass
class PPOConfig:
    # reference hyperparams (src/sb3_ppo.py:253-265), env count scaled
    # for TPU batching
    n_envs: int = 1024
    horizon: int = 64
    minibatch_size: int = 4096
    epochs: int = 20
    lr: float = 4e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    # SB3-style KL guard (src/sb3_ppo.py uses SB3 defaults): after each
    # epoch, if that epoch's mean approximate KL exceeds 1.5*target_kl,
    # the REMAINING epochs of this iteration are masked out. Unlike the
    # round-1 per-minibatch masking, the first epoch always applies, so
    # a policy can never be permanently frozen (it matches SB3's
    # early-break semantics inside one jitted scan).
    target_kl: Optional[float] = None
    # Adaptive lr-by-KL (PPO-penalty-style controller): multiply the
    # effective lr by 0.7 when an iteration's epoch-1 KL exceeds
    # 1.5*target_kl and by 1.05 when it stays under 0.5*target_kl,
    # clamped to [lr_min_scale, 1]. Every long run shows returns rise
    # exactly while KL is under target and stall once it explodes; the
    # controller keeps the optimizer in the productive regime without
    # hand-picking lr per phase.
    adaptive_lr_kl: bool = False
    lr_min_scale: float = 0.02
    # Linear lr decay to lr*lr_final_frac over total_timesteps
    # (SB3 `learning_rate=linear_schedule` idiom); 1.0 = constant.
    lr_final_frac: float = 1.0
    # PPO value clipping around the rollout value (SB3 clip_range_vf).
    clip_vf: Optional[float] = None
    # Floor on the per-minibatch advantage std: prevents noise blow-up
    # when advantages degenerate late in training.
    adv_std_floor: float = 1e-3
    # Bounds on the state-independent log-std parameter: stops
    # exploration from collapsing to a delta (ratio/KL explosion) or
    # diverging.
    log_std_min: float = -4.0
    log_std_max: float = 1.0
    adam_eps: float = 1e-5  # torch.optim.Adam default used by SB3
    # "torque" = reference-parity raw-torque policy; "pd" = PD-delta
    # action space (networks.PDTargetActorCritic) — the deployed policy
    # is still a pure obs -> torque-action function.
    policy: str = "torque"
    # Training-only survival shaping for hard-exploration clips (G1
    # run): each non-terminal transition's reward is boosted by
    # ``alive_bonus`` inside GAE, linearly annealed to zero over
    # ``alive_bonus_decay_steps`` global env steps. The env reward,
    # episode returns, and every logged metric stay reference-exact
    # (reference reward: src/deepmimic_env.py:193-256) — only the
    # advantage estimate sees the bonus, so the final policy is still
    # selected/evaluated on the true imitation reward.
    alive_bonus: float = 0.0
    alive_bonus_decay_steps: int = 0
    # Root planar-velocity-match shaping (StepOut.vel_match), annealed
    # on the same schedule as the alive bonus. Defeats the "stand
    # still" optimum the alive bonus admits on clips that move.
    vel_shaping: float = 0.0
    init_log_std: float = 0.0
    net_arch: tuple = (256, 128)
    total_timesteps: int = 500_000_000
    # Capacity of the on-policy handoff buffer (combined env only;
    # armed when env.ENV_CFG.HANDOFF_BUFFER_FRAC > 0): physical states
    # captured at GETUP -> locomotion transitions during rollout, fed
    # back as reset states so the handoff is practiced from the
    # distribution the current policy actually reaches.
    handoff_buffer_cap: int = 4096


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: Any       # vmapped DPEnvState
    last_obs: jnp.ndarray
    key: jnp.ndarray
    global_step: jnp.ndarray
    # running episode accounting (per env)
    ep_return: jnp.ndarray
    ep_length: jnp.ndarray
    # adaptive lr-by-KL controller state (1.0 when disabled)
    lr_scale: jnp.ndarray
    # on-policy handoff ring buffer (combined env; None when unused)
    handoff_buf: Any = None


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    shaping: jnp.ndarray   # extra training-only reward (0 when unused)


class IterStats(NamedTuple):
    mean_reward: jnp.ndarray
    ep_return_sum: jnp.ndarray   # sum of completed episode returns
    ep_count: jnp.ndarray
    ep_len_sum: jnp.ndarray
    pg_loss: jnp.ndarray
    v_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    clip_frac: jnp.ndarray
    log_std_mean: jnp.ndarray    # collapse diagnostics
    v_loss_max: jnp.ndarray
    lr_scale: jnp.ndarray        # adaptive-lr controller state
    # max active contacts dropped by slot saturation during the rollout
    # (0 = the fixed contact buffer was lossless all iteration)
    contact_overflow_max: jnp.ndarray = None
    # valid rows in the on-policy handoff buffer (None when unused)
    handoff_count: jnp.ndarray = None


class PPO:
    """Trainer bound to a functional env (DPEnv / DPCombinedEnv)."""

    def __init__(self, env, cfg: Optional[PPOConfig] = None):
        self.env = env
        self.cfg = cfg or PPOConfig()
        env_cfg = getattr(env, "ENV_CFG", None)
        self._handoff = bool(
            hasattr(env, "make_handoff_buffer") and env_cfg is not None
            and getattr(env_cfg, "HANDOFF_BUFFER_FRAC", 0.0) > 0.0)
        self.net = networks.make_policy(
            self.cfg.policy, env, net_arch=tuple(self.cfg.net_arch),
            init_log_std=self.cfg.init_log_std,
            log_std_min=self.cfg.log_std_min,
            log_std_max=self.cfg.log_std_max)
        cfg = self.cfg
        n_updates_per_iter = cfg.epochs * max(
            (cfg.horizon * cfg.n_envs) // cfg.minibatch_size, 1)
        n_iters = max(cfg.total_timesteps // (cfg.horizon * cfg.n_envs), 1)
        if cfg.lr_final_frac != 1.0:
            lr = optax.linear_schedule(
                cfg.lr, cfg.lr * cfg.lr_final_frac,
                n_iters * n_updates_per_iter)
        else:
            lr = cfg.lr
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(lr, eps=cfg.adam_eps),
        )
        self.tx = tx
        self._train_iter = jax.jit(self._train_iter_impl, donate_argnums=0)

    # ---- initialization -------------------------------------------------
    def init(self, seed: int = 0) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        key, pkey, rkey = jax.random.split(key, 3)
        obs0 = jnp.zeros((self.env.obs_size,), jnp.float32)
        params = self.net.init(pkey, obs0)
        opt_state = self.tx.init(params)
        reset_keys = jax.random.split(rkey, cfg.n_envs)
        env_states, obs = jax.jit(jax.vmap(self.env.reset))(reset_keys)
        return TrainState(
            params=params, opt_state=opt_state, env_states=env_states,
            last_obs=obs, key=key,
            global_step=jnp.zeros((), jnp.int64)
            if jax.config.jax_enable_x64 else jnp.zeros((), jnp.int32),
            ep_return=jnp.zeros(cfg.n_envs, jnp.float32),
            ep_length=jnp.zeros(cfg.n_envs, jnp.int32),
            lr_scale=jnp.ones((), jnp.float32),
            handoff_buf=(self.env.make_handoff_buffer(
                cfg.handoff_buffer_cap) if self._handoff else None))

    # ---- one training iteration (rollout + update), fully jitted --------
    def _train_iter_impl(self, ts: TrainState):
        cfg = self.cfg
        net = self.net

        def policy_step(carry, _):
            env_states, obs, key, ep_ret, ep_len, hbuf = carry
            key, akey = jax.random.split(key)
            mean, log_std, value = net.apply(ts.params, obs)
            action, logp = networks.sample_action(akey, mean, log_std)
            env_a = networks.env_action(net, obs, action)
            if self._handoff:
                prev_motion = env_states.motion_id
                prev_pa = env_states.player_action
                env_states, out = jax.vmap(
                    self.env.step_auto_reset,
                    in_axes=(0, 0, None))(env_states, env_a, hbuf)
                mask = self.env.handoff_capture_mask(prev_motion, out)
                hbuf = self.env.update_handoff_buffer(
                    hbuf, mask, env_states.qpos, env_states.qvel,
                    prev_pa, out.motion_id)
            else:
                env_states, out = jax.vmap(self.env.step_auto_reset)(
                    env_states, env_a)
            ep_ret = ep_ret + out.reward
            ep_len = ep_len + 1
            done_f = out.done.astype(jnp.float32)
            ov = getattr(out, "contact_overflow", None)
            ov_max = (ov.max().astype(jnp.int32) if ov is not None
                      else jnp.zeros((), jnp.int32))
            stats = (out.reward.mean(), (ep_ret * done_f).sum(),
                     done_f.sum(), (ep_len * out.done).sum(), ov_max)
            ep_ret = jnp.where(out.done, 0.0, ep_ret)
            ep_len = jnp.where(out.done, 0, ep_len)
            if cfg.vel_shaping:
                shaping = cfg.vel_shaping * out.vel_match
            else:
                shaping = jnp.zeros_like(out.reward)
            tr = Transition(obs=obs, action=action, logp=logp, value=value,
                            reward=out.reward, done=out.done,
                            shaping=shaping)
            return ((env_states, out.obs, key, ep_ret, ep_len, hbuf),
                    (tr, stats))

        carry0 = (ts.env_states, ts.last_obs, ts.key, ts.ep_return,
                  ts.ep_length, ts.handoff_buf)
        ((env_states, last_obs, key, ep_ret, ep_len, handoff_buf),
         (traj, stats)) = \
            jax.lax.scan(policy_step, carry0, None, length=cfg.horizon)

        # ---- GAE (reverse scan over the horizon) ----------------------
        _, _, last_value = net.apply(ts.params, last_obs)

        shaped = cfg.alive_bonus or cfg.vel_shaping
        if shaped and cfg.alive_bonus_decay_steps:
            frac = jnp.clip(
                1.0 - (ts.global_step.astype(jnp.float32)
                       / float(cfg.alive_bonus_decay_steps)), 0.0, 1.0)
        else:
            frac = jnp.float32(1.0)

        def gae_step(carry, tr):
            adv_next, value_next = carry
            nonterminal = 1.0 - tr.done.astype(jnp.float32)
            r = tr.reward
            if shaped:
                # both shaping terms gated by nonterminal: no training
                # signal on the step whose bootstrap is cut
                r = r + frac * (cfg.alive_bonus + tr.shaping) * nonterminal
            delta = r + cfg.gamma * value_next * nonterminal - tr.value
            adv = delta + cfg.gamma * cfg.gae_lambda * nonterminal * adv_next
            return (adv, tr.value), adv

        _, advantages = jax.lax.scan(
            gae_step, (jnp.zeros_like(last_value), last_value), traj,
            reverse=True)
        returns = advantages + traj.value

        # ---- flatten batch --------------------------------------------
        B = cfg.horizon * cfg.n_envs
        flat = jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), traj)
        adv_flat = advantages.reshape(B)
        ret_flat = returns.reshape(B)

        n_minibatches = max(B // cfg.minibatch_size, 1)

        def loss_fn(params, mb):
            obs, action, old_logp, old_value, adv, ret = mb
            mean, log_std, value = net.apply(params, obs)
            logp = networks.gaussian_logp(action, mean, log_std)
            ratio = jnp.exp(logp - old_logp)
            adv_n = (adv - adv.mean()) / jnp.maximum(
                adv.std(), cfg.adv_std_floor)
            pg1 = -adv_n * ratio
            pg2 = -adv_n * jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
            pg_loss = jnp.maximum(pg1, pg2).mean()
            if cfg.clip_vf is not None:
                # SB3 clip_range_vf: bound the value update around the
                # rollout-time prediction; pessimistic max of the two.
                v_clipped = old_value + jnp.clip(
                    value - old_value, -cfg.clip_vf, cfg.clip_vf)
                v_loss = 0.5 * jnp.maximum(
                    (value - ret) ** 2, (v_clipped - ret) ** 2).mean()
            else:
                v_loss = 0.5 * ((value - ret) ** 2).mean()
            ent = networks.gaussian_entropy(log_std).mean()
            total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
            kl = ((ratio - 1) - jnp.log(ratio)).mean()
            clipfrac = (jnp.abs(ratio - 1) > cfg.clip_eps).mean()
            return total, (pg_loss, v_loss, ent, kl, clipfrac)

        def epoch_step(carry, _):
            params, opt_state, key, stopped = carry
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, B)

            def mb_step(carry, idx):
                params, opt_state = carry
                mb = (flat.obs[idx], flat.action[idx], flat.logp[idx],
                      flat.value[idx], adv_flat[idx], ret_flat[idx])
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb)
                # When the KL guard has tripped, the remaining epochs
                # are TRUE no-ops: params and optimizer state are both
                # held (SB3 breaks out of the epoch loop; first epoch
                # always applies). Zeroing grads alone is not enough —
                # Adam's momentum keeps drifting params otherwise.
                updates, new_opt_state = self.tx.update(
                    grads, opt_state, params)
                if cfg.adaptive_lr_kl:
                    updates = jax.tree.map(lambda u: u * ts.lr_scale,
                                           updates)
                new_params = optax.apply_updates(params, updates)
                keep = stopped > 0
                params = jax.tree.map(
                    lambda o, n: jnp.where(keep, o, n), params, new_params)
                opt_state = jax.tree.map(
                    lambda o, n: jnp.where(keep, o, n), opt_state,
                    new_opt_state)
                return (params, opt_state), aux

            idxs = perm[:n_minibatches * cfg.minibatch_size].reshape(
                n_minibatches, cfg.minibatch_size)
            (params, opt_state), aux = jax.lax.scan(
                mb_step, (params, opt_state), idxs)
            if cfg.target_kl is not None:
                epoch_kl = aux[3].mean()
                stopped = jnp.maximum(
                    stopped,
                    (epoch_kl > 1.5 * cfg.target_kl).astype(jnp.float32))
            return (params, opt_state, key, stopped), aux

        (params, opt_state, key, _), aux = jax.lax.scan(
            epoch_step,
            (ts.params, ts.opt_state, key, jnp.zeros((), jnp.float32)),
            None, length=cfg.epochs)
        pg_loss, v_loss, ent, kl, clipfrac = jax.tree.map(
            lambda x: x.mean(), aux)

        lr_scale = ts.lr_scale
        if cfg.adaptive_lr_kl and cfg.target_kl is not None:
            kl_e0 = aux[3][0].mean()   # epoch-1 KL (always unmasked)
            lr_scale = jnp.where(
                kl_e0 > 1.5 * cfg.target_kl, lr_scale * 0.7,
                jnp.where(kl_e0 < 0.5 * cfg.target_kl,
                          lr_scale * 1.05, lr_scale))
            lr_scale = jnp.clip(lr_scale, cfg.lr_min_scale, 1.0)

        mean_r, ep_ret_sum, ep_cnt, ep_len_sum, ov_max = stats
        new_ts = TrainState(
            params=params, opt_state=opt_state, env_states=env_states,
            last_obs=last_obs, key=key,
            global_step=ts.global_step + B,
            ep_return=ep_ret, ep_length=ep_len, lr_scale=lr_scale,
            handoff_buf=handoff_buf)
        it_stats = IterStats(
            mean_reward=mean_r.mean(), ep_return_sum=ep_ret_sum.sum(),
            ep_count=ep_cnt.sum(), ep_len_sum=ep_len_sum.sum(),
            pg_loss=pg_loss, v_loss=v_loss, entropy=ent, approx_kl=kl,
            clip_frac=clipfrac,
            log_std_mean=params["params"]["log_std"].mean(),
            v_loss_max=jax.tree.map(lambda x: x.max(), aux)[1],
            lr_scale=lr_scale, contact_overflow_max=ov_max.max(),
            handoff_count=(handoff_buf.count if self._handoff else None))
        return new_ts, it_stats

    # ---- host loop -------------------------------------------------------
    def train(self, total_timesteps: Optional[int] = None, seed: int = 0,
              callback=None, log_every: int = 1, verbose: bool = True,
              init_params=None):
        cfg = self.cfg
        total = total_timesteps or cfg.total_timesteps
        ts = self.init(seed)
        if init_params is not None:
            # Warm start (curriculum fine-tuning): adopt pretrained
            # policy/value params, keep fresh optimizer/env state.
            init_params = jax.tree.map(jnp.asarray, init_params)
            chex_tree = jax.tree.structure(ts.params)
            assert jax.tree.structure(init_params) == chex_tree, (
                "init_params tree structure mismatch")
            ts = ts._replace(params=init_params)
        steps_per_iter = cfg.horizon * cfg.n_envs
        n_iters = max(total // steps_per_iter, 1)
        t0 = time.time()
        for it in range(n_iters):
            ts, stats = self._train_iter(ts)
            if callback is not None:
                callback(it, ts, stats)
            if verbose and (it % log_every == 0):
                sps = (it + 1) * steps_per_iter / (time.time() - t0)
                ep_r = (float(stats.ep_return_sum)
                        / max(float(stats.ep_count), 1.0))
                ep_l = (float(stats.ep_len_sum)
                        / max(float(stats.ep_count), 1.0))
                print(f"iter {it:5d} step {(it + 1) * steps_per_iter:>12,} "
                      f"sps {sps:>11,.0f} r/step {float(stats.mean_reward):.3f} "
                      f"ep_rew {ep_r:8.2f} ep_len {ep_l:7.1f} "
                      f"kl {float(stats.approx_kl):.4f}", flush=True)
        return ts

    # ---- inference --------------------------------------------------------
    def act(self, params, obs, deterministic: bool = True, key=None):
        """Returns the ENV-space action (PD policies transform here)."""
        obs = jnp.asarray(obs)
        mean, log_std, value = self.net.apply(params, obs)
        if deterministic:
            return networks.env_action(self.net, obs, mean), value
        a, _ = networks.sample_action(key, mean, log_std)
        return networks.env_action(self.net, obs, a), value
