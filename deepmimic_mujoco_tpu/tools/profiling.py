"""Profiling harnesses: stage breakdown, batch-size sweep, xprof trace.

The reference's opt-in per-phase wall-clock prints + Gantt plotter
(reference: src/profile_dpenv.py, src/profile_subproc_dpenv.py:1-24,
src/plot_profiling.py:831-868) become three TPU-appropriate tools:

1. ``stage_breakdown``: jit each pipeline stage separately and time it
   over a batch — the fused-step analogue of the reference's
   Sim/Obs/Reward phase lines.
2. ``throughput_sweep``: env-steps/s vs batch size (the whole point of
   the TPU design), printed as a table + bar chart.
3. ``trace``: wraps a batch rollout in ``jax.profiler.trace`` for xprof.

Usage: python -m deepmimic_mujoco_tpu.tools.profiling [--mode sweep|stages|trace]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _bench(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def stage_breakdown(env, batch: int = 1024):
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.physics import com_pos, com_vel, fwd_kinematics
    from deepmimic_mujoco_tpu.physics.collision import collide
    from deepmimic_mujoco_tpu.physics import dynamics

    m = env.model
    eng = env.engine
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    q, v = states.qpos, states.qvel
    u = jnp.zeros((batch, m.nu), jnp.float32)

    def _rne(q, v):
        kin = fwd_kinematics(m, q)
        com = com_pos(m, kin)
        cvel, cdof_dot = com_vel(m, com, v)
        return dynamics.rne(m, com, cvel, cdof_dot, v)

    stages = {
        "fk": jax.jit(jax.vmap(lambda q: fwd_kinematics(m, q))),
        "fk+com": jax.jit(jax.vmap(lambda q: com_pos(m, fwd_kinematics(m, q)))),
        "collision": jax.jit(jax.vmap(
            lambda q: collide(m, eng.tables, fwd_kinematics(m, q),
                              eng.max_contacts))),
        "crb(M)": jax.jit(jax.vmap(
            lambda q: dynamics.crb(m, com_pos(m, fwd_kinematics(m, q))))),
        "rne(bias)": jax.jit(jax.vmap(_rne)),
        "forward": jax.jit(jax.vmap(lambda q, v, u: eng.forward(q, v, u).qacc)),
        "full step": jax.jit(jax.vmap(lambda q, v, u: eng.step(q, v, u)[0])),
        "env step": jax.jit(jax.vmap(
            lambda s, a: env.step_auto_reset(s, a)[1].reward)),
    }
    rows = []
    for name, fn in stages.items():
        if name in ("fk", "fk+com", "collision", "crb(M)"):
            dt = _bench(fn, q)
        elif name == "rne(bias)":
            dt = _bench(fn, q, v)
        elif name in ("forward", "full step"):
            dt = _bench(fn, q, v, u)
        else:
            a = jnp.zeros((batch, env.action_size), jnp.float32)
            dt = _bench(fn, states, a)
        rows.append((name, dt * 1e3, batch / dt))
        print(f"{name:>10}: {dt * 1e3:8.2f} ms/batch "
              f"({batch / dt:12,.0f} env-evals/s)", flush=True)
    return rows


def solve_breakdown(env, batch: int = 4096):
    """Substage timing INSIDE the forward pass: contact-Jacobian parts,
    the J^T-build einsums, the fused kernel with prebuilt operands, and
    the full constraint solve — isolates where the G1 solve-pipeline
    milliseconds go (VERDICT r4 perf item)."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.physics import com_pos, com_vel, fwd_kinematics
    from deepmimic_mujoco_tpu.physics import dynamics
    from deepmimic_mujoco_tpu.physics.collision import collide
    from deepmimic_mujoco_tpu.physics.solver import (
        contact_jac_parts, solve_constraints,
    )

    m = env.model
    eng = env.engine
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states, _ = jax.jit(jax.vmap(env.reset))(keys)
    q, v = states.qpos, states.qvel
    u = jnp.zeros((batch, m.nu), jnp.float32)

    def position(qi):
        kin = fwd_kinematics(m, qi)
        com = com_pos(m, kin)
        contacts = collide(m, eng.tables, kin, eng.max_contacts)
        return com, contacts

    def stage_parts(qi):
        com, contacts = position(qi)
        return contact_jac_parts(m, com, contacts, eng.body_dof)

    def stage_crb_rne(qi, vi):
        com, contacts = position(qi)
        cvel, cdof_dot = com_vel(m, com, vi)
        Mm = dynamics.crb(m, com)
        bias = dynamics.rne(m, com, cvel, cdof_dot, vi)
        return Mm, bias

    def stage_solve(qi, vi, ui):
        com, contacts = position(qi)
        cvel, cdof_dot = com_vel(m, com, vi)
        Mm = dynamics.crb(m, com)
        bias = dynamics.rne(m, com, cvel, cdof_dot, vi)
        qf = dynamics.actuator_force(m, ui) - bias
        return solve_constraints(
            m, com, Mm, qf, qi, vi, contacts, eng.body_dof,
            eng.limit_table, iterations=eng.iterations).qacc

    stages = {
        "position (fk+com+coll)": (jax.jit(jax.vmap(position)), (q,)),
        "+ jac parts": (jax.jit(jax.vmap(stage_parts)), (q,)),
        "+ crb + rne": (jax.jit(jax.vmap(stage_crb_rne)), (q, v)),
        "+ full solve": (jax.jit(jax.vmap(stage_solve)), (q, v, u)),
        "forward (engine)": (jax.jit(jax.vmap(
            lambda a, b, c: eng.forward(a, b, c).qacc)), (q, v, u)),
    }
    rows = []
    for name, (fn, args) in stages.items():
        dt = _bench(fn, *args)
        rows.append((name, dt * 1e3, batch / dt))
        print(f"{name:>24}: {dt * 1e3:8.2f} ms/batch "
              f"({batch / dt:12,.0f} env-evals/s)", flush=True)
    return rows


def train_breakdown(env, n_envs: int = 2048, horizon: int = 64,
                    epochs: int = 20, minibatch: int = 4096):
    """PPO iteration phase breakdown (VERDICT r4 #4): rollout,
    rollout+GAE, and the epoch update loop — measured as full jitted
    iterations at different epoch counts, so the per-epoch cost (the
    minibatch gather + grad + adam scan) falls out of the slope.

    Reference hyperparams being profiled: 20 epochs / minibatch 4096
    (src/sb3_ppo.py:253-265)."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.ppo import PPO, PPOConfig

    def make(e):
        cfg = PPOConfig(n_envs=n_envs, horizon=horizon, epochs=e,
                        minibatch_size=minibatch)
        ppo = PPO(env, cfg)
        return ppo, ppo.init(0)

    rows = []
    B = n_envs * horizon

    # pure rollout (policy sample + env step + obs), no GAE/update
    net = networks.ActorCritic(env.action_size)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros(env.obs_size))
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)

    def rollout(states, obs, key):
        def body(carry, _):
            states, obs, key = carry
            key, akey = jax.random.split(key)
            mean, log_std, value = net.apply(params, obs)
            action, logp = networks.sample_action(akey, mean, log_std)
            states, out = jax.vmap(env.step_auto_reset)(states, action)
            return (states, out.obs, key), (out.reward, out.done, value,
                                            logp)
        carry, traj = jax.lax.scan(body, (states, obs, key), None,
                                   length=horizon)
        return jax.tree.map(lambda x: x.sum(), traj)

    dt_roll = _bench(jax.jit(rollout), states, obs, jax.random.PRNGKey(2))
    rows.append(("rollout only", dt_roll * 1e3, B / dt_roll))

    dts = {}
    for e in (1, epochs):
        ppo, ts = make(e)
        out = ppo._train_iter(ts)
        jax.block_until_ready(out[1].approx_kl)
        ts = out[0]
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            ts, st = ppo._train_iter(ts)
        jax.block_until_ready(st.approx_kl)
        dts[e] = (time.time() - t0) / iters
        rows.append((f"full iter ({e} epochs)", dts[e] * 1e3, B / dts[e]))

    per_epoch = (dts[epochs] - dts[1]) / max(epochs - 1, 1)
    gae_flat = dts[1] - dt_roll - per_epoch
    rows.append(("per epoch (slope)", per_epoch * 1e3, B / per_epoch))
    rows.append(("GAE+flatten (residual)", gae_flat * 1e3,
                 B / max(gae_flat, 1e-9)))
    n_mb = max(B // minibatch, 1)
    rows.append((f"per minibatch ({n_mb}/epoch)",
                 per_epoch / n_mb * 1e3, 0.0))
    for name, ms, sps in rows:
        print(f"{name:>24}: {ms:8.2f} ms ({sps:12,.0f} env-steps/s)",
              flush=True)
    return rows


def throughput_sweep(env, batches=(64, 256, 1024, 4096), steps: int = 64):
    import jax
    import jax.numpy as jnp

    results = []
    for b in batches:
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        states, _ = jax.jit(jax.vmap(env.reset))(keys)

        def rollout(states, key):
            def body(carry, _):
                states, key = carry
                key, sub = jax.random.split(key)
                a = 0.1 * jax.random.normal(sub, (b, env.action_size))
                states, out = jax.vmap(env.step_auto_reset)(states, a)
                return (states, key), out.reward.mean()

            (states, _), r = jax.lax.scan(body, (states, key), None,
                                          length=steps)
            return states, r.mean()

        run = jax.jit(rollout)
        s2, r = run(states, jax.random.PRNGKey(1))
        jax.block_until_ready(r)
        t0 = time.time()
        s2, r = run(s2, jax.random.PRNGKey(2))
        jax.block_until_ready(r)
        dt = time.time() - t0
        sps = b * steps / dt
        results.append((b, sps))
        print(f"batch {b:6d}: {sps:14,.0f} env-steps/s", flush=True)
    return results


def trace(env, out_dir: str = "/tmp/dm_tpu_trace", batch: int = 1024,
          steps: int = 32):
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states, _ = jax.jit(jax.vmap(env.reset))(keys)
    a = jnp.zeros((batch, env.action_size), jnp.float32)
    step = jax.jit(jax.vmap(env.step_auto_reset))
    states, out = step(states, a)  # compile outside trace
    jax.block_until_ready(out.reward)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            states, out = step(states, a)
        jax.block_until_ready(out.reward)
    print("xprof trace written to", out_dir)


def plot_results(rows, path: str, kind: str):
    """Bar chart of stage times or throughput sweep (the reference
    renders its profiling logs as a Gantt chart,
    src/plot_profiling.py:831-868)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    if kind == "stages":
        names = [r[0] for r in rows]
        vals = [r[1] for r in rows]
        ax.barh(names, vals, color="tab:blue")
        ax.set_xlabel("ms per batch step")
    else:
        names = [str(r[0]) for r in rows]
        vals = [r[1] for r in rows]
        ax.bar(names, vals, color="tab:green")
        ax.set_xlabel("batch size")
        ax.set_ylabel("env-steps/s")
    fig.tight_layout()
    fig.savefig(path)
    print("plot saved to", path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="stages",
                   choices=["stages", "solve", "sweep", "trace", "train"])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--horizon", type=int, default=64)
    p.add_argument("--env", default="deep_mimic_mujoco",
                   choices=["deep_mimic_mujoco", "dp_combined_env"])
    p.add_argument("--motion", default="walk")
    p.add_argument("--robot", default="humanoid3d")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--plot", default=None,
                   help="save a chart of the results to this path")
    args = p.parse_args(argv)

    from deepmimic_mujoco_tpu.envs import DPCombinedEnv, DPEnv

    env = (DPEnv(motion=args.motion, robot=args.robot)
           if args.env == "deep_mimic_mujoco" else DPCombinedEnv())
    if args.mode == "stages":
        rows = stage_breakdown(env, args.batch)
        if args.plot:
            plot_results(rows, args.plot, "stages")
    elif args.mode == "solve":
        solve_breakdown(env, args.batch)
    elif args.mode == "train":
        train_breakdown(env, n_envs=args.batch, horizon=args.horizon,
                        epochs=args.epochs)
    elif args.mode == "sweep":
        rows = throughput_sweep(env)
        if args.plot:
            plot_results(rows, args.plot, "sweep")
    else:
        trace(env, batch=args.batch)


if __name__ == "__main__":
    main()
