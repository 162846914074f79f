"""SAC training entry point: ``python -m deepmimic_mujoco_tpu.rl.sac_train``.

The TPU-native counterpart of the reference's SAC trainer script
(reference: src/sac_sb3.py:20-89 — DPEnv over 32 subprocess envs,
buffer 5M, net_arch [1024, 512]). Writes the same metrics JSONL format
as the PPO trainer so learning curves are directly comparable.
"""
from __future__ import annotations

import argparse
import json
import os
import time

M = 1_000_000


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reason", nargs="?", default="")
    p.add_argument("--motion", default="walk")
    p.add_argument("--robot", default="humanoid3d")
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--buffer", type=int, default=1_000_000)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps-per-iter", type=int, default=32)
    p.add_argument("--updates-per-iter", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--arch", type=int, nargs="+", default=[1024, 512])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--total", type=int, default=10 * M)
    p.add_argument("--out", default="~/deep_mimic")
    p.add_argument("--eval-every", type=int, default=2 * M,
                   help="deterministic-eval cadence (env steps); the "
                        "best-scoring actor is checkpointed")
    p.add_argument("--idx-init", type=int, default=20,
                   help="eval episode start frame")
    p.add_argument("--warm-start-lam", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--mesh-subcapsules", type=int, default=None)
    p.add_argument("--alpha-lr", type=float, default=1e-4)
    p.add_argument("--actor-lr", type=float, default=None)
    p.add_argument("--log-alpha-min", type=float, default=-4.6)
    p.add_argument("--critic-warmup", type=int, default=0,
                   help="env steps with the actor frozen (critic fits "
                        "the warm-start data distribution first)")
    p.add_argument("--init-actor-from-ppo", default=None,
                   help="distill the SAC actor from a gated PPO "
                        "checkpoint before training (behavior cloning "
                        "on states visited by the PPO policy)")
    args = p.parse_args(argv)
    print("Reason:", args.reason or "(none)")
    return args


def distill_actor_from_ppo(sac, env, ppo_ckpt, n_rollout: int = 4096,
                           steps: int = 3000, lr: float = 3e-4,
                           init_log_std: float = -1.0, seed: int = 0):
    """Behavior-clone the SAC actor from a PPO checkpoint.

    Rolls the deterministic PPO policy over ``n_rollout`` parallel envs
    for 64 steps (RSI starts -> on-policy state coverage), then
    regresses ``tanh(mean)`` to the PPO action (clipped to the tanh
    range; the gated walk policy emits |a|>1 on 1.25%% of dims) and
    pins ``log_std`` near ``init_log_std``. VERDICT r3 'Next' #5:
    SAC-from-scratch crawled to eval 9.85/60M with a collapsing
    temperature; warm-starting from the gated PPO policy turns SAC
    training into fine-tuning."""
    import jax
    import jax.numpy as jnp
    import optax

    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

    ppo_net = networks.ActorCritic(env.action_size)
    tmpl = ppo_net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    ppo_params = restore_params(ppo_ckpt, tmpl)

    @jax.jit
    def collect(key):
        states, obs = jax.vmap(env.reset)(jax.random.split(key, n_rollout))

        def body(carry, _):
            states, obs = carry
            a, _, _ = jax.vmap(lambda o: ppo_net.apply(ppo_params, o))(obs)
            states, out = jax.vmap(env.step_auto_reset)(states, a)
            return (states, out.obs), (obs, a)

        _, (obs_tr, act_tr) = jax.lax.scan(body, (states, obs), None,
                                           length=64)
        return (obs_tr.reshape(-1, env.obs_size),
                act_tr.reshape(-1, env.action_size))

    key = jax.random.PRNGKey(seed)
    obs_d, act_d = collect(key)
    target_z = jnp.arctanh(jnp.clip(act_d, -0.995, 0.995))

    actor = sac.actor.init(jax.random.PRNGKey(seed + 1),
                           jnp.zeros(env.obs_size))
    tx = optax.adam(lr)
    opt = tx.init(actor)
    nb = obs_d.shape[0]

    @jax.jit
    def bc_step(actor, opt, key):
        idx = jax.random.randint(key, (4096,), 0, nb)

        def loss(ap):
            mean, log_std = sac.actor.apply(ap, obs_d[idx])
            return (((mean - target_z[idx]) ** 2).mean()
                    + 0.1 * ((log_std - init_log_std) ** 2).mean())

        l, g = jax.value_and_grad(loss)(actor)
        up, opt = tx.update(g, opt, actor)
        return optax.apply_updates(actor, up), opt, l

    for i in range(steps):
        key, sub = jax.random.split(key)
        actor, opt, l = bc_step(actor, opt, sub)
        if i % 500 == 0:
            print(f"distill step {i}: bc loss {float(l):.5f}", flush=True)
    print(f"distill done: bc loss {float(l):.5f}")
    return actor


def main(argv=None):
    args = parse_args(argv)

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl.sac import SAC, SACConfig

    eng_kw = {k: v for k, v in dict(
        warm_start_lam=args.warm_start_lam,
        mesh_subcapsules=args.mesh_subcapsules).items() if v is not None}
    env = DPEnv(motion=args.motion, robot=args.robot, **eng_kw)
    cfg = SACConfig(n_envs=args.n_envs, buffer_size=args.buffer,
                    batch_size=args.batch,
                    steps_per_iter=args.steps_per_iter,
                    updates_per_iter=args.updates_per_iter,
                    lr=args.lr, net_arch=tuple(args.arch),
                    total_timesteps=args.total,
                    alpha_lr=args.alpha_lr,
                    actor_lr=args.actor_lr,
                    log_alpha_min=args.log_alpha_min,
                    critic_warmup_steps=args.critic_warmup)
    sac = SAC(env, cfg)

    init_actor = None
    if args.init_actor_from_ppo:
        init_actor = distill_actor_from_ppo(
            sac, env, os.path.expanduser(args.init_actor_from_ppo))

    run_name = "sac" + time.strftime("%Y%m%d-%H%M_%S")
    out_dir = os.path.expanduser(args.out)
    os.makedirs(out_dir, exist_ok=True)
    metrics_path = os.path.join(out_dir, run_name + "_metrics.jsonl")
    config = {"algo": "SAC", "run_reason": args.reason,
              "motion": args.motion, "robot": args.robot,
              "arch": list(cfg.net_arch), "n_envs": cfg.n_envs,
              "buffer_size": cfg.buffer_size, "batch_size": cfg.batch_size,
              "learning_rate": cfg.lr, "total_timesteps": args.total}
    with open(metrics_path, "w") as f:
        f.write(json.dumps({"config": config}) + "\n")
    print("Logging to", metrics_path)

    per_iter = cfg.n_envs * cfg.steps_per_iter

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.rl import checkpoint

    # deterministic eval episode (single dispatch; actor mean action),
    # mirroring the PPO evaluator and the reference's gate replays
    @jax.jit
    def eval_episode(actor_params, key):
        state0, obs0 = env.reset(key, idx_init=args.idx_init)

        def body(carry, _):
            state, obs, alive = carry
            mean, _ = sac.actor.apply(actor_params, obs)
            a = jnp.tanh(mean) * cfg.action_scale
            nstate, out = env.step(state, a)
            r = out.reward * alive.astype(out.reward.dtype)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda x, y: jnp.where(alive, x, y), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive), r

        _, rews = jax.lax.scan(body, (state0, obs0, jnp.ones((), bool)),
                               None, length=1000)
        return rews.sum()

    best = {"rew": float("-inf")}
    eval_every_iters = max(args.eval_every // per_iter, 1)

    def callback(it, s, stats):
        r, closs, aloss, eps, epc, epl, alpha = stats
        row = {
            "global_step": (it + 1) * per_iter,
            "mean_reward": float(r),
            "ep_return": float(eps) / max(float(epc), 1.0),
            "ep_length": float(epl) / max(float(epc), 1.0),
            "critic_loss": float(closs), "actor_loss": float(aloss),
            "alpha": float(alpha),
        }
        if (it + 1) % eval_every_iters == 0:
            rew = float(eval_episode(s.actor, jax.random.PRNGKey(0)))
            row["eval_ep_rew"] = rew
            print(f"Eval: EP_REW {rew:.2f}", flush=True)
            if rew > best["rew"]:
                best["rew"] = rew
                checkpoint.save_params(
                    os.path.join(out_dir, run_name + "_best_actor"),
                    s.actor)
        with open(metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    s = sac.train(total_timesteps=args.total, seed=args.seed,
                  callback=callback, init_actor=init_actor)

    path = checkpoint.save_params(
        os.path.join(out_dir, run_name + "_actor"), s.actor)
    print("Saved actor params to", path)
    print(f"Best eval ep_rew: {best['rew']:.2f}")
    return s


if __name__ == "__main__":
    main()
