"""Smooth-dynamics parity vs the oracle engine.

Stage-by-stage: mass matrix (CRBA), bias force (RNE), contact-free
forward acceleration, and contact-free trajectory rollout under both
integrators. Contact behavior is validated separately at a behavioral
level (tests/test_step_behavior.py) since our solver's friction cone
differs from the oracle's pyramidal PGS by design.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.physics import com_pos, com_vel, fwd_kinematics
from deepmimic_mujoco_tpu.physics import dynamics
from deepmimic_mujoco_tpu.physics.step import Engine


def random_state(ref, rng, scale=0.4):
    qpos = rng.normal(size=ref.nq) * scale
    qpos[2] += 1.5
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    for j in range(1, ref.njnt):
        adr = ref.jnt_qposadr[j]
        lo, hi = ref.jnt_range[j]
        qpos[adr] = np.clip(qpos[adr], lo * 0.9, hi * 0.9)
    qvel = rng.normal(size=ref.nv) * scale
    return qpos, qvel


@pytest.fixture(scope="module", params=["humanoid3d", "unitree_g1"])
def setup(request):
    path = assets.xml_path(request.param)
    m = load_model(path)
    ref = mujoco.MjModel.from_xml_path(path)
    return m, ref, request.param


def test_mass_matrix_parity(setup):
    m, ref, _ = setup
    d = mujoco.MjData(ref)
    rng = np.random.default_rng(0)

    f = jax.jit(lambda q: dynamics.crb(m, com_pos(m, fwd_kinematics(m, q))))
    for _ in range(3):
        qpos, qvel = random_state(ref, rng)
        d.qpos[:] = qpos
        mujoco.mj_forward(ref, d)
        M_ref = np.zeros((ref.nv, ref.nv))
        mujoco.mj_fullM(ref, d, M_ref)
        M = np.asarray(f(jnp.asarray(qpos, jnp.float32)))
        scale = max(1.0, np.abs(M_ref).max())
        np.testing.assert_allclose(M / scale, M_ref / scale, atol=2e-5)


def test_bias_force_parity(setup):
    m, ref, _ = setup
    d = mujoco.MjData(ref)
    rng = np.random.default_rng(1)

    def bias(q, v):
        kin = fwd_kinematics(m, q)
        com = com_pos(m, kin)
        cvel, cdof_dot = com_vel(m, com, v)
        return dynamics.rne(m, com, cvel, cdof_dot, v)

    f = jax.jit(bias)
    for _ in range(3):
        qpos, qvel = random_state(ref, rng)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(ref, d)
        got = np.asarray(f(jnp.asarray(qpos, jnp.float32),
                           jnp.asarray(qvel, jnp.float32)))
        scale = max(1.0, np.abs(d.qfrc_bias).max())
        np.testing.assert_allclose(got / scale, d.qfrc_bias / scale, atol=3e-5)


def _no_friction_pair(name):
    """Model copies with joint frictionloss zeroed: our engine
    approximates frictionloss with a smooth Coulomb torque while the
    oracle treats it as a constraint; on near-massless finger dofs the
    difference dominates qacc, so pure smooth-dynamics parity is tested
    without it.
    """
    path = assets.xml_path(name)
    m = load_model(path)
    m.dof_frictionloss = np.zeros(m.nv)
    m.jnt_limited = np.zeros(m.njnt, dtype=bool)
    ref = mujoco.MjModel.from_xml_path(path)
    ref.dof_frictionloss[:] = 0.0
    ref.jnt_limited[:] = 0
    return m, ref


def test_contact_free_qacc_parity(setup):
    """Drop the robot high above the floor: no contacts, pure smooth
    dynamics + actuation must match the oracle's qacc."""
    _, _, name = setup
    m, ref = _no_friction_pair(name)
    d = mujoco.MjData(ref)
    rng = np.random.default_rng(2)
    # iterations=0 -> pure smooth dynamics: the oracle states are
    # screened to ncon==0, but our conservative mesh-proxy capsules can
    # report contacts the true hulls don't have, which would otherwise
    # pollute a smooth-parity comparison
    eng = Engine(m, iterations=0)
    fwd = jax.jit(lambda q, v, u: eng.forward(q, v, u).qacc)
    checked = 0
    for _ in range(8):
        qpos, qvel = random_state(ref, rng, scale=0.25)
        qpos[2] += 5.0  # far above floor
        ctrl = rng.uniform(-1, 1, size=ref.nu)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(ref, d)
        if d.ncon:  # random pose self-collides; skip this draw
            continue
        checked += 1
        got = np.asarray(fwd(jnp.asarray(qpos, jnp.float32),
                             jnp.asarray(qvel, jnp.float32),
                             jnp.asarray(ctrl, jnp.float32)))
        scale = max(1.0, np.abs(d.qacc).max())
        # frictionloss is a smooth approximation in our engine; exclude
        # dofs where it bites by bounding with a slightly looser tol
        np.testing.assert_allclose(got / scale, d.qacc / scale, atol=2e-3)
    assert checked >= 2, "all random draws self-collided"


def test_contact_free_trajectory_rk4(setup):
    """20 RK4 steps in free fall with actuation: trajectories match."""
    _, _, name = setup
    m, ref = _no_friction_pair(name)
    d = mujoco.MjData(ref)
    eng = Engine(m, iterations=0)  # RK4 per model option; smooth only
    step = jax.jit(lambda q, v, u: eng.step(q, v, u)[:2])

    # find a seed whose 20-step oracle fall stays contact-free
    for seed in range(3, 13):
        rng = np.random.default_rng(seed)
        qpos, qvel = random_state(ref, rng, scale=0.05)
        qpos[2] += 10.0
        ctrl = rng.uniform(-0.1, 0.1, size=ref.nu)
        mujoco.mj_resetData(ref, d)
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        contact_free = True
        for _ in range(20):
            d.ctrl[:] = ctrl
            mujoco.mj_step(ref, d)
            if d.nefc:  # any constraint row: contact OR joint limit
                contact_free = False
                break
        if contact_free:
            break
    assert contact_free, "no constraint-free fall found in 10 seeds"

    q, v = jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32)
    u = jnp.asarray(ctrl, jnp.float32)
    for _ in range(20):
        q, v = step(q, v, u)
    # float32 engine vs float64 oracle over 20 chaotic steps: tolerances
    # reflect trajectory-level divergence growth, not stage error (stage
    # parity is covered by the qacc/M/bias tests above)
    np.testing.assert_allclose(np.asarray(q)[:3], d.qpos[:3], atol=5e-3)
    np.testing.assert_allclose(np.asarray(q)[7:], d.qpos[7:], atol=6e-2)
    dot = abs(np.dot(np.asarray(q)[3:7], d.qpos[3:7]))
    assert dot > 1 - 1e-4
    np.testing.assert_allclose(np.asarray(v), d.qvel, atol=2e-1)
