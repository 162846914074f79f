"""Multi-chip data parallelism on the virtual 8-device CPU mesh.

The env batch shards across devices; params replicate; one full PPO
iteration runs (gradient reductions lower to XLA collectives).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_sharded_ppo_iteration():
    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.parallel import (
        data_sharding, make_mesh, shard_train_state,
    )
    from deepmimic_mujoco_tpu.rl import PPO, PPOConfig

    mesh = make_mesh(8)
    env = DPEnv(motion="walk", robot="humanoid3d", iterations=8)
    cfg = PPOConfig(n_envs=16, horizon=4, minibatch_size=8, epochs=1,
                    net_arch=(16,))
    ppo = PPO(env, cfg)
    ts = ppo.init(seed=0)
    with mesh:
        ts = shard_train_state(ts, mesh)
        assert len(ts.last_obs.sharding.device_set) == 8
        ts, stats = ppo._train_iter(ts)
        jax.block_until_ready(stats)
    assert np.isfinite(float(stats.pg_loss))
    # env states stayed sharded through the iteration
    assert len(ts.env_states.qpos.sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_sharded_matches_unsharded():
    """Numerical equivalence: one full PPO iteration from the same
    seed produces the same losses and parameters whether the env batch
    lives on 1 device or is sharded over the 8-device mesh — sharding
    is a placement annotation, not a semantics change (the mesh
    replacement for the reference's SubprocVecEnv fan-out,
    src/sb3_ppo.py:275-278, must not change training math)."""
    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.parallel import make_mesh, shard_train_state
    from deepmimic_mujoco_tpu.rl import PPO, PPOConfig

    env = DPEnv(motion="walk", robot="humanoid3d", iterations=8)
    cfg = PPOConfig(n_envs=16, horizon=8, minibatch_size=32, epochs=2,
                    net_arch=(32, 16))
    ppo = PPO(env, cfg)

    ts1 = ppo.init(seed=0)
    ts1, stats1 = ppo._train_iter(ts1)
    jax.block_until_ready(stats1)

    mesh = make_mesh(8)
    ts8 = ppo.init(seed=0)
    with mesh:
        ts8 = shard_train_state(ts8, mesh)
        ts8, stats8 = ppo._train_iter(ts8)
        jax.block_until_ready(stats8)

    for name in ("pg_loss", "v_loss", "entropy", "approx_kl",
                 "mean_reward"):
        a = float(getattr(stats1, name))
        b = float(getattr(stats8, name))
        assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (
            f"{name}: unsharded {a} vs sharded {b}")

    flat1 = jax.tree.leaves(ts1.params)
    flat8 = jax.tree.leaves(ts8.params)
    for a, b in zip(flat1, flat8):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 5e-4


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_batched_env_step_sharded():
    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.parallel import data_sharding, make_mesh

    mesh = make_mesh(8)
    env = DPEnv(motion="walk", robot="humanoid3d", iterations=8)
    n = 16
    states, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), n))
    sh = data_sharding(mesh)
    states = jax.tree.map(lambda x: jax.device_put(x, sh), states)
    step = jax.jit(jax.vmap(env.step_auto_reset))
    states, out = step(states, jnp.zeros((n, env.action_size)))
    assert np.isfinite(np.asarray(out.reward)).all()
    assert len(out.obs.sharding.device_set) == 8
