"""Smoke/unit tests: renderer, gym wrapper, extracted policy, linalg,
retarget continuity picker, checkpointing, PPO/SAC single iteration.

Kept compile-light: tiny nets, few envs, reduced solver iterations.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def humanoid_env():
    from deepmimic_mujoco_tpu.envs import DPEnv

    return DPEnv(motion="walk", robot="humanoid3d", iterations=8)


def test_linalg_spd_inverse():
    from deepmimic_mujoco_tpu.physics import linalg

    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 20, 20)) * 0.2
    M = np.einsum("bij,bkj->bik", A, A) + np.eye(20)
    Minv = np.asarray(jax.jit(linalg.spd_inverse)(
        jnp.asarray(M, jnp.float32)))
    err = np.abs(M @ Minv - np.eye(20)).max()
    assert err < 1e-4, err


def test_native_renderer(humanoid_env):
    from deepmimic_mujoco_tpu.tools.render import render_state

    m = humanoid_env.model
    q = np.zeros(m.nq)
    q[2] = 0.9
    q[3] = 1.0
    frame = render_state(m, q, mode="rgb_array", overlay="test 1.23",
                         width=160, height=120)
    assert frame.shape == (120, 160, 3) and frame.dtype == np.uint8
    # scene has sky, floor and body: substantial color variance
    assert frame.std() > 20


def test_native_renderer_g1_meshes():
    """G1 mesh geoms render as real hull triangles, not proxy capsules
    (round-1 gap: eval videos showed capsule proxies only)."""
    from deepmimic_mujoco_tpu.models import assets, load_model
    from deepmimic_mujoco_tpu.models.physics_model import MESH
    from deepmimic_mujoco_tpu.tools.render import _scene_tables, render_state

    m = load_model(assets.xml_path("unitree_g1"))
    tables = _scene_tables(m)
    gtype, tri_cnt = tables[0], tables[7]
    n_mesh_geoms = int((np.asarray(m.geom_type) == MESH).sum())
    assert n_mesh_geoms > 20
    # every mesh geom got a triangle table (scipy hull available here)
    assert int((gtype == MESH).sum()) == n_mesh_geoms
    assert (tri_cnt[gtype == MESH] > 3).all()
    frame = render_state(m, np.asarray(m.key_qpos[0]), mode="rgb_array",
                         width=128, height=96)
    assert frame.shape == (96, 128, 3) and frame.std() > 20


def test_gym_wrapper_roundtrip():
    from deepmimic_mujoco_tpu.envs import GymDPEnv

    env = GymDPEnv(motion="walk", robot="humanoid3d", iterations=8,
                   crash_dump_dir="/tmp")
    obs = env.reset_model(idx_init=3)
    assert obs.shape == (env.env.obs_size,)
    assert env.idx_curr == 3
    obs, r, done, info = env.step(
        np.zeros(env.action_space.shape[0]),
        force_state=(env.mocap.qpos[3], env.mocap.qvel[3]))
    assert r == pytest.approx(1.0, abs=1e-3)
    assert "reward_config" in info
    # crash dump on divergence
    obs, r, done, info = env.step(
        np.zeros(env.action_space.shape[0]),
        force_state=(env.mocap.qpos[0], np.full(env.model.nv, 1e6)))
    assert done and info["done_reason"] == "obs_out_of_bounds"
    assert env.episode_debug_log.get("full_traceback")


def test_extracted_policy_roundtrip(tmp_path):
    from deepmimic_mujoco_tpu.rl.extracted_policy import (
        ExtractedPolicy, extract_policy,
    )
    from deepmimic_mujoco_tpu.rl.networks import ActorCritic

    net = ActorCritic(action_dim=6, net_arch=(16, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(10))
    obs = np.linspace(-1, 1, 10)
    path = extract_policy(jax.tree.map(np.asarray, params), obs,
                          str(tmp_path / "pol.npz"))
    pol = ExtractedPolicy(path)
    assert pol.test()
    mean, _, _ = net.apply(params, jnp.asarray(obs, jnp.float32))
    np.testing.assert_allclose(pol.act(obs), np.asarray(mean), atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from deepmimic_mujoco_tpu.rl import checkpoint as ck
    from deepmimic_mujoco_tpu.rl.networks import ActorCritic

    net = ActorCritic(action_dim=4, net_arch=(8,))
    params = net.init(jax.random.PRNGKey(1), jnp.zeros(6))
    path = ck.save_params(str(tmp_path / "p"), params)
    restored = ck.restore_params(path, params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.tree.map(np.asarray, params), restored)


def test_retarget_continuity_picker():
    from deepmimic_mujoco_tpu.tools.retarget import _continuity_pick
    from deepmimic_mujoco_tpu.utils import hostquat as hq

    lims = [(-1.5, 1.5), (-2.9, 2.7), (-2.6, 2.6)]
    e = np.array([0.2, 0.3, -0.1])
    q = hq.euler_to_quat_intrinsic(e, "xyz")
    # within bounds: passthrough
    out = _continuity_pick(e, e, lims, q, vmax=15.0, dt=0.0166)
    np.testing.assert_allclose(out, e)
    # far from previous: clamped into the velocity box
    prev = np.array([-1.0, -1.0, 1.0])
    out = _continuity_pick(e, prev, lims, q, vmax=1.0, dt=0.0166)
    assert np.all(np.abs(out - prev) <= 1.0 * 0.0166 + 1e-9)


def test_ppo_single_iteration(humanoid_env):
    from deepmimic_mujoco_tpu.rl import PPO, PPOConfig

    cfg = PPOConfig(n_envs=8, horizon=4, minibatch_size=8, epochs=1,
                    net_arch=(16,))
    ppo = PPO(humanoid_env, cfg)
    ts = ppo.init(seed=0)
    # the train iter donates its input state: snapshot params first
    params0 = jax.tree.map(np.asarray, ts.params)
    ts2, stats = ppo._train_iter(ts)
    assert int(ts2.global_step) == 32
    assert np.isfinite(float(stats.pg_loss))
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).sum()),
                     params0, ts2.params))
    assert delta > 0


def test_sac_single_iteration(humanoid_env):
    from deepmimic_mujoco_tpu.rl.sac import SAC, SACConfig

    cfg = SACConfig(n_envs=4, buffer_size=512, batch_size=16,
                    steps_per_iter=4, updates_per_iter=2, net_arch=(16,))
    sac = SAC(humanoid_env, cfg)
    s = sac.init(seed=0)
    s2, (r, closs, aloss, eps, epc, epl, alpha) = sac._train_iter(s)
    assert int(s2.global_step) == 16
    assert np.isfinite(float(closs)) and np.isfinite(float(aloss))


def test_profiling_stage_breakdown_smoke(humanoid_env):
    from deepmimic_mujoco_tpu.tools.profiling import stage_breakdown

    rows = stage_breakdown(humanoid_env, batch=4)
    assert len(rows) == 8  # + the round-4 rne(bias) stage
    assert all(t >= 0 for _, t, _ in rows)


def test_pd_policy_env_action():
    """PD-delta policy: env action = (kp*a - kd*qvel)/act_scale with
    qvel gathered from the obs at the actuator's dof columns (the G1
    actuator->joint map is non-contiguous)."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl import networks

    env = DPEnv(motion="walk", robot="unitree_g1")
    net = networks.make_policy("pd", env)
    state, obs = env.reset(jax.random.PRNGKey(0))
    a = jnp.ones(env.action_size)
    ea = np.asarray(networks.env_action(net, obs, a))
    kp = np.asarray(net.kp)
    kd = np.asarray(net.kd)
    cols = np.asarray(net.qvel_cols)
    qv = np.asarray(obs)[cols] / env.ENV_CFG.VEL_OBS_SCALE
    np.testing.assert_allclose(ea, (kp * 1.0 - kd * qv) / 20.0, rtol=1e-5)
    # qvel columns must equal the true qvel of each actuated joint
    import numpy as onp
    m = env.model
    trnid = onp.asarray(m.actuator_trnid).reshape(m.nu, -1)[:, 0]
    dof = onp.asarray(m.jnt_dofadr)[trnid[:env.action_size]]
    np.testing.assert_allclose(
        onp.asarray(obs)[cols] / env.ENV_CFG.VEL_OBS_SCALE,
        onp.asarray(state.qvel)[dof], rtol=1e-4, atol=1e-5)


def test_extracted_policy_pd_roundtrip(tmp_path):
    """PD-delta checkpoints extract to a numpy artifact that bakes the
    kp/kd transform (deployment parity for policy='pd')."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.extracted_policy import (
        ExtractedPolicy, extract_policy,
    )

    env = DPEnv(motion="walk", robot="humanoid3d", iterations=8)
    net = networks.make_policy("pd", env, net_arch=(16, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    state, obs = env.reset(jax.random.PRNGKey(1))
    path = extract_policy(jax.tree.map(np.asarray, params),
                          np.asarray(obs), str(tmp_path / "pd.npz"),
                          net=net)
    pol = ExtractedPolicy(path)
    assert pol.test()
    mean, _, _ = net.apply(params, obs)
    want = np.asarray(networks.env_action(net, obs, mean))
    np.testing.assert_allclose(pol.act(np.asarray(obs)), want, atol=1e-4)


def test_ppo_shaping_anneal(humanoid_env):
    """Alive-bonus + vel-shaping enter GAE scaled by the linear anneal
    fraction; with a decayed-out global step they contribute nothing
    (training metrics always report the true reward)."""
    from deepmimic_mujoco_tpu.rl import PPO, PPOConfig

    base = dict(n_envs=4, horizon=4, minibatch_size=8, epochs=1,
                net_arch=(8,), lr=0.0)
    cfg_off = PPOConfig(**base)
    cfg_on = PPOConfig(**base, alive_bonus=0.5, vel_shaping=0.5,
                       alive_bonus_decay_steps=100)
    p_off = PPO(humanoid_env, cfg_off)
    p_on = PPO(humanoid_env, cfg_on)
    ts_off = p_off.init(seed=0)
    ts_on = p_on.init(seed=0)
    # past the decay horizon the shaped run matches the unshaped one
    ts_on = ts_on._replace(global_step=jnp.asarray(1000, jnp.int32))
    _, s_off = p_off._train_iter(ts_off)
    _, s_on = p_on._train_iter(ts_on)
    np.testing.assert_allclose(float(s_on.mean_reward),
                               float(s_off.mean_reward), rtol=1e-5)
    np.testing.assert_allclose(float(s_on.v_loss), float(s_off.v_loss),
                               rtol=1e-4)


def test_log_std_floor_gradient_reopens():
    """The log-std bound must not freeze exploration: once the raw
    parameter decays below the floor, a hard ``jnp.clip`` has exactly
    zero gradient and sigma can never re-open by gradient descent
    (round-4 G1-run legs F/G: entropy bit-frozen for 400+ iterations
    at log_std_mean -1.50028). ``clip_preserve_inward`` keeps forward
    values clip-identical (committed checkpoints replay unchanged) but
    passes inward-pointing gradients and blocks outward drift."""
    from deepmimic_mujoco_tpu.rl.networks import clip_preserve_inward

    lo, hi = -1.5, 1.0
    x = jnp.asarray([-2.0, -1.5, 0.0, 1.0, 3.0])
    np.testing.assert_array_equal(
        clip_preserve_inward(x, lo, hi), jnp.clip(x, lo, hi))

    # gradient of sum(f(x)): upstream cotangent g = +1 everywhere.
    # Descent step -g decreases x: must be BLOCKED strictly below the
    # floor (would push further out); identity for lo <= x <= hi
    # exactly like jnp.clip (so never worse than clip at the bound).
    g_down = jax.grad(lambda v: clip_preserve_inward(v, lo, hi).sum())(x)
    np.testing.assert_array_equal(g_down, [0.0, 1.0, 1.0, 1.0, 1.0])
    # upstream cotangent -1: descent increases x -> allowed below the
    # floor (re-opens exploration), blocked strictly above the ceiling.
    g_up = jax.grad(lambda v: -clip_preserve_inward(v, lo, hi).sum())(x)
    np.testing.assert_array_equal(g_up, [-1.0, -1.0, -1.0, -1.0, 0.0])

    # end-to-end through the policy: with the raw log_std parameter
    # BELOW the floor, the entropy gradient (which wants larger sigma)
    # must be nonzero so exploration can re-open.
    from deepmimic_mujoco_tpu.rl import networks

    net = networks.ActorCritic(4, net_arch=(8,), log_std_min=lo)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(6))
    params["params"]["log_std"] = jnp.full(4, lo - 0.3)

    def neg_entropy(p):
        _, log_std, _ = net.apply(p, jnp.zeros(6))
        return -networks.gaussian_entropy(log_std)

    g = jax.grad(neg_entropy)(params)["params"]["log_std"]
    assert np.all(np.asarray(g) < 0.0), (
        "entropy gradient must re-open a below-floor log_std")


def test_interactive_viewer_headless(humanoid_env):
    """Viewer loop drives mocap playback + camera/scrub controls
    headless (the same code path an interactive backend animates;
    reference capability: live MjViewer, src/deepmimic_env.py:527-538)."""
    from deepmimic_mujoco_tpu.tools.view import Viewer, mocap_source

    src, n = mocap_source(humanoid_env)
    v = Viewer(humanoid_env.model, src, width=160, height=120)
    f0 = v.step_once()
    assert f0.shape == (120, 160, 3) and v.frame_idx == 1
    v.handle_key("a"); v.handle_key("w")
    assert v.azimuth == 145.0 and v.distance == 2.75
    f1 = v.step_once()
    assert f1.shape == (120, 160, 3)
    # camera moved and the clip advanced: frames must differ
    assert np.abs(f1.astype(int) - f0.astype(int)).mean() > 0.5
    v.handle_key(" ")  # pause
    idx = v.frame_idx
    v.step_once()
    assert v.frame_idx == idx  # paused: no advance
    v.handle_key("right")
    assert v.frame_idx == idx + 1  # scrub while paused
    v.handle_key("q")
    assert v.quit


def test_viewer_policy_source(humanoid_env, tmp_path):
    """policy_source steps the env live from a saved checkpoint."""
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import save_params
    from deepmimic_mujoco_tpu.tools.view import policy_source

    env = humanoid_env
    net = networks.ActorCritic(env.action_size)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    ck = tmp_path / "ck"
    save_params(str(ck), params)
    src = policy_source(env, str(ck))
    q0, q1 = src(0), src(1)
    assert q0.shape == (env.model.nq,)
    assert np.abs(q1 - q0).max() > 0  # the env actually stepped
