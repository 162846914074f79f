"""Benchmark: batched env-step throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's DPEnv throughput of ~1,390 env-steps/s
aggregate over 32 subprocess workers (BASELINE.md: src/plot_profiling.py:486).

The benchmark steps N humanoid3d walk-imitation envs (physics + mocap
reward + termination + RSI auto-reset fused on device) with a policy-
shaped random action source, scanned over T steps in one XLA program.
"""
import json
import os
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 1390.0


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    n_envs = int(os.environ.get("BENCH_ENVS", "64" if small else "4096"))
    n_steps = int(os.environ.get("BENCH_STEPS", "16" if small else "256"))

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv

    env = DPEnv(motion="walk", robot="humanoid3d")

    keys = jax.random.split(jax.random.PRNGKey(0), n_envs)
    reset = jax.jit(jax.vmap(env.reset))
    states, obs = reset(keys)

    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, sub = jax.random.split(key)
            actions = 0.1 * jax.random.normal(
                sub, (n_envs, env.action_size), jnp.float32)
            states, out = jax.vmap(env.step_auto_reset)(states, actions)
            return (states, key), out.reward.mean()

        (states, key), rews = jax.lax.scan(body, (states, key), None,
                                           length=n_steps)
        return states, rews.mean()

    run = jax.jit(rollout)
    # compile + warmup
    t0 = time.time()
    states2, r = run(states, jax.random.PRNGKey(1))
    jax.block_until_ready(r)
    compile_s = time.time() - t0

    t0 = time.time()
    states2, r = run(states2, jax.random.PRNGKey(2))
    jax.block_until_ready(r)
    dt = time.time() - t0

    steps_per_sec = n_envs * n_steps / dt
    result = {
        "metric": "env_steps_per_sec_per_chip_humanoid3d_walk",
        "value": round(float(steps_per_sec), 1),
        "unit": "env-steps/s",
        "vs_baseline": round(float(steps_per_sec) / REFERENCE_STEPS_PER_SEC, 2),
        "n_envs": n_envs,
        "n_steps": n_steps,
        "compile_seconds": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
