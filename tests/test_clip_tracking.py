"""Perfect-tracking reward across the clip library (BASELINE configs:
walk, spinkick/dance_b dynamic-contact clips, getup, G1 clips).

Mirrors the reference's check_rewards_and_joint_limits acceptance check
(src/deepmimic_env.py:570-653): forcing the state along the clip must
earn near-maximal imitation reward on every frame.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnv


@pytest.mark.parametrize("motion,robot,min_mean", [
    ("spinkick", "humanoid3d", 0.90),
    ("dance_b", "humanoid3d", 0.90),
    ("getup_facedown", "humanoid3d", 0.90),
    ("walk", "unitree_g1", 0.95),
    ("getup_facedown_slow_FSI", "unitree_g1", 0.90),
])
def test_perfect_tracking(motion, robot, min_mean):
    env = DPEnv(motion=motion, robot=robot, iterations=0)
    step = jax.jit(lambda s, q, v: env.step(
        s, jnp.zeros(env.action_size, jnp.float32), force_state=(q, v)))
    state, _ = env.reset(jax.random.PRNGKey(0), idx_init=0)
    rews = []
    for _ in range(min(env.mocap_data_len - 1, 160)):
        i = int(state.idx_curr)
        state, out = step(state, env.mocap_qpos[i], env.mocap_qvel[i])
        rews.append(float(out.reward))
    rews = np.asarray(rews)
    assert rews.mean() > min_mean, (motion, robot, rews.mean(), rews.min())
