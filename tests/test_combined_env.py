"""DPCombinedEnv: state-machine transitions, rewards, batching.

Mirrors the reference's combined-env semantics (src/combined_env.py):
50/50 walk/getup RSI, 0.7*imitation + 0.3*task rewards, timer/success/
fallen transitions, amnesty, obs layout with player-action encoding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPCombinedEnv
from deepmimic_mujoco_tpu.envs.combined_env import (
    GETUP, RUN, TO_GETUP, WALK, DONE_FALLEN_NO_AMNESTY,
)


@pytest.fixture(scope="module")
def env():
    return DPCombinedEnv(iterations=10)


def test_obs_size(env):
    # qpos 37 + qvel 37 + torso 8 + extra contact 8 + phase 1 + pa 7
    assert env.obs_size == 37 + 37 + 8 + 8 + 1 + (2 + 3 + 2)
    assert env.action_size == 23  # 37 motors - 14 hand motors


def test_reset_distribution(env):
    reset = jax.jit(jax.vmap(env.reset))
    states, obs = reset(jax.random.split(jax.random.PRNGKey(0), 64))
    mids = np.asarray(states.motion_id)
    assert set(mids.tolist()) <= {WALK, GETUP}
    assert 5 < (mids == WALK).sum() < 59  # ~50/50
    # walk inits start past the amnesty window (reference :227)
    walk_steps = np.asarray(states.n_steps)[mids == WALK]
    assert (walk_steps >= env.ENV_CFG.AMNESTY_STEPS + 10).all()
    assert np.isfinite(np.asarray(obs)).all()


def test_perfect_tracking_combined(env):
    """Forcing the walk-motion state: imitation ~1, locomotion task ~1,
    total ~= 0.7 + 0.3 (reference reward mix :353-355)."""
    step = jax.jit(lambda s, q, v: env.step(
        s, jnp.zeros(env.action_size, jnp.float32), force_state=(q, v)))
    state, _ = env.reset(jax.random.PRNGKey(3))
    state = state._replace(motion_id=jnp.asarray(WALK, jnp.int32),
                           n_steps=jnp.asarray(0, jnp.int32))
    rews = []
    for _ in range(30):
        q, v = env.get_current_motion_state(state)
        state, out = step(state, q, v)
        rews.append((float(out.reward), float(out.imitation_reward),
                     float(out.task_reward)))
    r = np.asarray(rews)
    assert r[5:, 1].mean() > 0.95       # imitation
    assert r[5:, 2].mean() > 0.9        # velocity-matching task
    assert r[5:, 0].mean() > 0.9 * 0.7 + 0.85 * 0.3


def test_to_getup_constant_target(env):
    """TO_GETUP's mocap target is constant (getup frame 1) and its
    imitation reward is zeroed (reference :348-352)."""
    q0 = np.asarray(env.mocap_qpos[TO_GETUP, 0])
    q50 = np.asarray(env.mocap_qpos[TO_GETUP, 50])
    np.testing.assert_array_equal(q0, q50)
    np.testing.assert_array_equal(q0, np.asarray(env.mocap_qpos[GETUP, 1]))

    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state._replace(motion_id=jnp.asarray(TO_GETUP, jnp.int32),
                           n_steps=jnp.asarray(5, jnp.int32))
    q, v = env.get_current_motion_state(state)
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=(q, v))
    assert float(out.imitation_reward) == 0.0
    assert float(out.task_reward) > 0.3  # exp(0)/3 at perfect config


def test_getup_timeout_transition(env):
    """Timer end: getup -> run (preserving the reference's
    PAWalk()==PAWalk() identity-comparison quirk, :402)."""
    state, _ = env.reset(jax.random.PRNGKey(1))
    L = int(env.motion_lengths[GETUP])
    state = state._replace(motion_id=jnp.asarray(GETUP, jnp.int32),
                           n_steps=jnp.asarray(L - 1, jnp.int32))
    q, v = env.get_current_motion_state(state)
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=(q, v))
    assert int(state.motion_id) == RUN
    assert int(state.n_steps) == 1  # reset to 0, then post-step +1


def test_to_getup_success_transition(env):
    """Pose matched within 15 deg -> to_getup becomes getup (:416-420)."""
    state, _ = env.reset(jax.random.PRNGKey(2))
    state = state._replace(motion_id=jnp.asarray(TO_GETUP, jnp.int32),
                           n_steps=jnp.asarray(5, jnp.int32))
    q, v = env.get_current_motion_state(state)  # exactly the target pose
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=(q, v))
    assert int(state.motion_id) == GETUP


def test_fallen_without_amnesty_terminates(env):
    state, _ = env.reset(jax.random.PRNGKey(4))
    state = state._replace(motion_id=jnp.asarray(WALK, jnp.int32),
                           n_steps=jnp.asarray(5, jnp.int32))  # no amnesty
    q, _ = env.get_current_motion_state(state)
    q = np.asarray(q).copy()
    q[2] = 0.1  # collapsed
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=(jnp.asarray(q), jnp.zeros(env.model.nv)))
    assert bool(out.done)
    assert int(out.done_reason) == DONE_FALLEN_NO_AMNESTY
    assert int(state.motion_id) == TO_GETUP


def test_fallen_with_amnesty_continues(env):
    state, _ = env.reset(jax.random.PRNGKey(5))
    state = state._replace(motion_id=jnp.asarray(WALK, jnp.int32),
                           n_steps=jnp.asarray(400, jnp.int32))  # amnesty earned
    q, _ = env.get_current_motion_state(state)
    q = np.asarray(q).copy()
    q[2] = 0.1
    state, out = env.step(state, jnp.zeros(env.action_size, jnp.float32),
                          force_state=(jnp.asarray(q), jnp.zeros(env.model.nv)))
    assert not bool(out.done)
    assert int(state.motion_id) == TO_GETUP


def test_vmapped_auto_reset(env):
    n = 8
    states, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(6), n))
    step = jax.jit(jax.vmap(env.step_auto_reset))
    for _ in range(2):
        states, out = step(states, jnp.zeros((n, env.action_size)))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_handoff_rsi_reset_distribution():
    """Training-only RSI knobs: HANDOFF_RSI_FRAC concentrates resets in
    the last quarter of the getup clip; RSI_RANDOM_PA mixes the reset
    player action (defaults keep reference behavior, exercised by
    test_reset_distribution)."""
    from deepmimic_mujoco_tpu.envs.combined_env import PA_RUN, PA_WALK
    from deepmimic_mujoco_tpu.envs.config import DPCombinedEnvConfig

    cfg = DPCombinedEnvConfig(HANDOFF_RSI_FRAC=1.0, RSI_RANDOM_PA=True)
    env = DPCombinedEnv(cfg=cfg, iterations=10)
    states, obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(3), 64))
    mids = np.asarray(states.motion_id)
    steps = np.asarray(states.n_steps)
    glen = int(env.motion_lengths[GETUP])
    assert (mids == GETUP).all()
    assert (steps >= glen - max(glen // 4, 1) - 1).all()
    assert (steps < glen).all()
    pas = np.asarray(states.player_action)
    assert {PA_WALK, PA_RUN} == set(pas.tolist())  # both commands drawn
    assert np.isfinite(np.asarray(obs)).all()


def test_handoff_buffer_capture_and_reset(env):
    """On-policy handoff buffer (VERDICT r4 #3): states captured at
    GETUP -> locomotion transitions are fed back as reset states with
    the entered motion at frame 1, covering the off-clip state
    distribution where the round-2/4 policies die (reference handoff
    transition: src/combined_env.py:398-410)."""
    from deepmimic_mujoco_tpu.envs.config import DPCombinedEnvConfig

    cfg = DPCombinedEnvConfig(HANDOFF_BUFFER_FRAC=1.0)
    benv = DPCombinedEnv(cfg=cfg, iterations=10)
    buf = benv.make_handoff_buffer(capacity=16)
    assert int(buf.count) == 0

    # craft a batch at the last getup frame: the timer transition
    # fires this step and enters RUN (reference quirk)
    n = 4
    glen = int(benv.motion_lengths[GETUP])
    q = benv.mocap_qpos[GETUP, glen - 1]
    v = benv.mocap_qvel[GETUP, glen - 1]
    states, _ = jax.jit(jax.vmap(benv.reset))(
        jax.random.split(jax.random.PRNGKey(0), n))
    states = states._replace(
        qpos=jnp.broadcast_to(q, (n,) + q.shape),
        qvel=jnp.broadcast_to(v, (n,) + v.shape),
        motion_id=jnp.full(n, GETUP, jnp.int32),
        n_steps=jnp.full(n, glen - 1, jnp.int32))
    prev_motion = states.motion_id
    new_states, out = jax.jit(jax.vmap(
        benv.step_auto_reset, in_axes=(0, 0, None)))(
        states, jnp.zeros((n, benv.action_size)), buf)
    mask = benv.handoff_capture_mask(prev_motion, out)
    assert bool(mask.any()), "timer exit from GETUP must capture"
    buf = benv.update_handoff_buffer(
        buf, mask, new_states.qpos, new_states.qvel,
        states.player_action, out.motion_id)
    k = int(mask.sum())
    assert int(buf.count) == k and int(buf.head) == k % 16
    first = int(np.flatnonzero(np.asarray(mask))[0])
    np.testing.assert_array_equal(np.asarray(buf.qpos[0]),
                                  np.asarray(new_states.qpos[first]))
    assert int(buf.motion[0]) == RUN

    # with frac=1.0 and a non-empty buffer, resets draw from it
    rs = jax.vmap(lambda key: benv._reset_state(key, buf))(
        jax.random.split(jax.random.PRNGKey(1), 32))
    assert (np.asarray(rs.motion_id) == RUN).all()
    assert (np.asarray(rs.n_steps) == 1).all()
    # every reset qpos equals some captured buffer row
    rq = np.asarray(rs.qpos)
    bq = np.asarray(buf.qpos[:k])
    dists = np.abs(rq[:, None, :] - bq[None, :, :]).max(-1).min(-1)
    np.testing.assert_allclose(dists, 0.0, atol=0.0)

    # empty buffer never samples (falls back to standard RSI)
    empty = benv.make_handoff_buffer(capacity=16)
    rs2 = jax.vmap(lambda key: benv._reset_state(key, empty))(
        jax.random.split(jax.random.PRNGKey(2), 32))
    assert (np.asarray(rs2.motion_id) != RUN).all() or \
        (np.asarray(rs2.n_steps) != 1).any()


def test_ppo_handoff_buffer_train_iter():
    """One jitted PPO iteration on the combined env with the handoff
    buffer armed: compiles, runs, and threads the buffer through the
    rollout carry (count is monotone nondecreasing)."""
    from deepmimic_mujoco_tpu.envs.config import DPCombinedEnvConfig
    from deepmimic_mujoco_tpu.rl import PPO, PPOConfig

    cfg = DPCombinedEnvConfig(HANDOFF_BUFFER_FRAC=0.5)
    benv = DPCombinedEnv(cfg=cfg, iterations=10)
    ppo = PPO(benv, PPOConfig(n_envs=8, horizon=4, minibatch_size=32,
                              epochs=2, total_timesteps=64,
                              handoff_buffer_cap=32))
    ts = ppo.init(seed=0)
    assert ts.handoff_buf is not None
    ts2, stats = ppo._train_iter(ts)
    assert stats.handoff_count is not None
    assert int(stats.handoff_count) >= 0
    assert np.isfinite(float(stats.mean_reward))
