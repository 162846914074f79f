"""Benchmark: batched throughput on the current device.

Prints one JSON line per metric; the FIRST line is the driver metric
(humanoid3d walk env-step throughput, random actions). Baseline: the
reference's DPEnv throughput of ~1,390 env-steps/s aggregate over 32
subprocess workers (BASELINE.md: src/plot_profiling.py:486); the
combined-env line is compared against its ~109 env-steps/s aggregate
(src/plot_profiling.py:258).

Extra lines (breadth per the reference's profiling of both envs,
src/plot_profiling.py:258,486,816,828):
  - G1 run env-step throughput (24 contact slots, 37 actuated DoF)
  - DPCombinedEnv env-step throughput (motion state machine)
  - humanoid3d policy+step throughput (MLP forward fused into the
    step — deliverable inference-rollout speed, not just raw physics)
  - PPO train throughput (rollout + GAE + 20-epoch update; env-steps/s
    of the full training loop)
Set BENCH_DRIVER_ONLY=1 to print just the first line.
"""
import json
import os
import time

REFERENCE_STEPS_PER_SEC = 1390.0       # DPEnv, 32 procs
REFERENCE_COMBINED_STEPS_PER_SEC = 109.0  # DPCombinedEnv, 32 procs


# bf16 matmul peak of the chip (TFLOP/s) for the utilization estimate;
# v5e ("TPU v5 lite") is 197 TFLOP/s bf16. Unknown chips report flops/s
# only. The physics step is mostly fp32 VPU work, so this fraction is a
# LOWER bound on how far we are from any speed-of-light — it is meant
# to make "how much headroom remains" quantitative across rounds, not
# to be a precise MFU.
_PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}


def _xla_flops(fn, *args):
    """XLA's own flop estimate for the compiled program (0 if the
    backend does not report one). Cost analysis counts a while/scan
    body ONCE; callers multiply by the trip count."""
    try:
        import jax

        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        return 0.0


def _bench(fn, *args):
    """Compile + time one repetition of a jitted closure."""
    import jax

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0, compile_s


def bench_env_steps(env, n_envs, n_steps, policy=False, seed=0):
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    if policy:
        from deepmimic_mujoco_tpu.rl import networks

        net = networks.ActorCritic(env.action_size)
        params = net.init(jax.random.PRNGKey(1), jnp.zeros(env.obs_size))

    def rollout(states, obs, key):
        def body(carry, _):
            states, obs, key = carry
            key, sub = jax.random.split(key)
            if policy:
                actions, _, _ = jax.vmap(lambda o: net.apply(params, o))(obs)
            else:
                actions = 0.1 * jax.random.normal(
                    sub, (n_envs, env.action_size), jnp.float32)
            states, out = jax.vmap(env.step_auto_reset)(states, actions)
            return (states, out.obs, key), out.reward.mean()

        carry, rews = jax.lax.scan(body, (states, obs, key), None,
                                   length=n_steps)
        return rews.mean()

    run = jax.jit(rollout)
    dt, compile_s = _bench(run, states, obs, jax.random.PRNGKey(2))

    # one-step program flops (the scan body), for the utilization line
    def one_step(states, obs, key):
        (states, obs, key), r = body_step(states, obs, key)
        return r

    def body_step(states, obs, key):
        key, sub = jax.random.split(key)
        if policy:
            actions, _, _ = jax.vmap(lambda o: net.apply(params, o))(obs)
        else:
            actions = 0.1 * jax.random.normal(
                sub, (n_envs, env.action_size), jnp.float32)
        states, out = jax.vmap(env.step_auto_reset)(states, actions)
        return (states, out.obs, key), out.reward.mean()

    flops_step = _xla_flops(one_step, states, obs, jax.random.PRNGKey(2))
    return n_envs * n_steps / dt, compile_s, flops_step


def bench_train(n_envs, horizon, n_iters=4):
    import jax

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl.ppo import PPO, PPOConfig

    env = DPEnv(motion="walk", robot="humanoid3d")
    cfg = PPOConfig(n_envs=n_envs, horizon=horizon,
                    minibatch_size=min(4096, n_envs * horizon))
    ppo = PPO(env, cfg)
    ts = ppo.init(0)

    def run(ts):
        for _ in range(n_iters):
            ts, stats = ppo._train_iter(ts)
        return ts, stats

    t0 = time.time()
    ts, stats = run(ts)
    jax.block_until_ready(stats)
    compile_s = time.time() - t0
    t0 = time.time()
    ts, stats = run(ts)
    jax.block_until_ready(stats)
    dt = time.time() - t0
    return n_envs * horizon * n_iters / dt, compile_s


def bench_mesh_scaling(n_devices, n_envs, n_steps):
    """Env-step throughput with the env batch sharded over an
    ``n_devices`` mesh (correctness/scaling probe: real numbers arrive
    with real multi-chip hardware; on one chip this measures sharding
    overhead ~= 0, on a CPU mesh it validates the collective path)."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.parallel import data_sharding, make_mesh

    env = DPEnv(motion="walk", robot="humanoid3d")
    mesh = make_mesh(n_devices)
    sh = data_sharding(mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
    obs = jax.device_put(obs, sh)

    def rollout(states, obs, key):
        def body(carry, _):
            states, obs, key = carry
            key, sub = jax.random.split(key)
            actions = 0.1 * jax.random.normal(
                sub, (n_envs, env.action_size), jnp.float32)
            states, out = jax.vmap(env.step_auto_reset)(states, actions)
            return (states, out.obs, key), out.reward.mean()

        carry, rews = jax.lax.scan(body, (states, obs, key), None,
                                   length=n_steps)
        return rews.mean()

    with mesh:
        run = jax.jit(rollout)
        dt, compile_s = _bench(run, states, obs, jax.random.PRNGKey(2))
    return n_envs * n_steps / dt, compile_s


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    # batch 2048 is the measured single-chip throughput optimum for
    # both robots (round-4 sweep, runs/q_r4_g1_sweep.log +
    # /tmp/h3d_sweep: h3d 744k@2048 vs 713k@4096 vs 646k@8192; G1
    # 256k@1024 / 250k@2048 vs 218k@4096) — above it VMEM/HBM pressure
    # in the fused-solve grid outweighs batching gains.
    n_envs = int(os.environ.get("BENCH_ENVS", "64" if small else "2048"))
    n_steps = int(os.environ.get("BENCH_STEPS", "16" if small else "256"))

    if "--mesh" in __import__("sys").argv:
        import sys

        import jax

        n_req = int(sys.argv[sys.argv.index("--mesh") + 1])
        n_dev = min(n_req, len(jax.devices()))
        device = str(jax.devices()[0])
        for nd in sorted({1, n_dev}):
            sps, comp = bench_mesh_scaling(nd, n_envs, n_steps)
            print(json.dumps({
                "metric": f"env_steps_per_sec_mesh{nd}_humanoid3d_walk",
                "value": round(float(sps), 1), "unit": "env-steps/s",
                "vs_baseline": round(float(sps) / REFERENCE_STEPS_PER_SEC, 2),
                "n_envs": n_envs, "n_devices": nd,
                "compile_seconds": round(comp, 1),
                "device": device}), flush=True)
        return

    import jax

    from deepmimic_mujoco_tpu.envs import DPEnv

    device = str(jax.devices()[0])

    peak = 0.0
    for kind, tf in _PEAK_BF16_TFLOPS.items():
        if kind in device:
            peak = tf
            break

    def emit(metric, sps, compile_s, baseline, flops_step=0.0, **kw):
        d = {
            "metric": metric, "value": round(float(sps), 1),
            "unit": "env-steps/s",
            "vs_baseline": round(float(sps) / baseline, 2),
            "n_envs": n_envs, "compile_seconds": round(compile_s, 1),
            "device": device, **kw}
        if flops_step > 0:
            # achieved flops/s = flops of one batched step x steps/s/batch
            tfs = flops_step * (float(sps) / n_envs) / 1e12
            d["xla_tflops_per_sec"] = round(tfs, 3)
            if peak:
                d["util_vs_bf16_peak"] = round(tfs / peak, 4)
        print(json.dumps(d), flush=True)

    env = DPEnv(motion="walk", robot="humanoid3d")
    sps, comp, fl = bench_env_steps(env, n_envs, n_steps)
    emit("env_steps_per_sec_per_chip_humanoid3d_walk", sps, comp,
         REFERENCE_STEPS_PER_SEC, fl, n_steps=n_steps)
    if os.environ.get("BENCH_DRIVER_ONLY") == "1":
        return

    env_g1 = DPEnv(motion="run", robot="unitree_g1")
    sps, comp, fl = bench_env_steps(env_g1, n_envs, n_steps)
    emit("env_steps_per_sec_per_chip_g1_run", sps, comp,
         REFERENCE_STEPS_PER_SEC, fl)

    from deepmimic_mujoco_tpu.envs.combined_env import DPCombinedEnv

    env_c = DPCombinedEnv()
    sps, comp, fl = bench_env_steps(env_c, n_envs, n_steps)
    emit("env_steps_per_sec_per_chip_combined", sps, comp,
         REFERENCE_COMBINED_STEPS_PER_SEC, fl)

    sps, comp, fl = bench_env_steps(env, n_envs, n_steps, policy=True)
    emit("policy_env_steps_per_sec_per_chip_humanoid3d_walk", sps, comp,
         REFERENCE_STEPS_PER_SEC, fl)

    tr_envs, tr_hor = (2048, 64) if not small else (64, 8)
    sps, comp = bench_train(n_envs=tr_envs, horizon=tr_hor)
    emit("train_env_steps_per_sec_per_chip_humanoid3d_walk_ppo", sps,
         comp, REFERENCE_STEPS_PER_SEC, train_envs=tr_envs,
         horizon=tr_hor, ppo_epochs=20)


if __name__ == "__main__":
    main()
