"""Env-in-lanes position stage (physics/lanes.py) vs the per-env
reference path (physics/kinematics.py).

The lanes rewrite recomputes fwd_kinematics/com_pos with the env axis
in TPU lanes; same formulas, different op order and constant one-hot
MXU gathers at HIGHEST precision — so results must agree to fp32
roundoff, batched AND after full engine steps. Trained-checkpoint
gates replay under lanes_position=True, so this tolerance is what
certifies the flip is behavior-preserving.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.physics.kinematics import com_pos, fwd_kinematics
from deepmimic_mujoco_tpu.physics.lanes import make_position_fn
from deepmimic_mujoco_tpu.physics.step import Engine


def _model(robot):
    return load_model(assets.xml_path(robot))


def _rand_qpos(m, key, batch):
    """Random but valid qpos batch: normalized free-joint quaternion."""
    q = 0.4 * jax.random.normal(key, (batch, m.nq), jnp.float32)
    q = q.at[:, 2].add(1.0)  # keep root above ground-ish
    quat = q[:, 3:7] + jnp.array([2.0, 0, 0, 0])  # bias toward identity
    quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    return q.at[:, 3:7].set(quat)


@pytest.mark.parametrize("robot", ["humanoid3d", "unitree_g1"])
def test_lanes_position_matches_per_env(robot):
    m = _model(robot)
    qpos = _rand_qpos(m, jax.random.PRNGKey(0), 17)  # non-multiple of 8

    pos_fn = make_position_fn(m)
    kin_l, com_l = jax.jit(jax.vmap(pos_fn))(qpos)
    kin_r = jax.jit(jax.vmap(lambda q: fwd_kinematics(m, q)))(qpos)
    com_r = jax.jit(jax.vmap(lambda q: com_pos(m, fwd_kinematics(m, q))))(
        qpos)

    for name in kin_r._fields:
        a, b = getattr(kin_l, name), getattr(kin_r, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=f"{robot} Kin.{name}")
    for name in com_r._fields:
        a, b = getattr(com_l, name), getattr(com_r, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5,
            err_msg=f"{robot} Com.{name}")


def test_lanes_single_env_uses_reference_path():
    """Unbatched call must be bit-identical to the per-env path (the
    custom_vmap single-env branch IS that path)."""
    m = _model("humanoid3d")
    qpos = _rand_qpos(m, jax.random.PRNGKey(1), 1)[0]
    pos_fn = make_position_fn(m)
    kin_l, com_l = jax.jit(pos_fn)(qpos)
    kin_r = jax.jit(lambda q: fwd_kinematics(m, q))(qpos)
    com_r = jax.jit(lambda q: com_pos(m, fwd_kinematics(m, q)))(qpos)
    for name in kin_r._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(kin_l, name)),
            np.asarray(getattr(kin_r, name)), err_msg=name)
    for name in com_r._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(com_l, name)),
            np.asarray(getattr(com_r, name)), err_msg=name)


@pytest.mark.parametrize("robot", ["humanoid3d", "unitree_g1"])
def test_engine_step_lanes_vs_per_env(robot):
    """Full batched engine steps with lanes on vs off: trajectories
    must track to fp32 roundoff over several steps (contact branches
    amplify any divergence; 5 steps stays well-behaved)."""
    m = _model(robot)
    eng_l = Engine(m, lanes_position=True)
    eng_r = Engine(m, lanes_position=False)
    qpos = _rand_qpos(m, jax.random.PRNGKey(2), 9)
    qvel = 0.05 * jax.random.normal(
        jax.random.PRNGKey(3), (9, m.nv), jnp.float32)
    ctrl = jnp.zeros(m.nu, jnp.float32)

    def roll(eng):
        def body(carry, _):
            qp, qv = carry
            qp, qv, _ = jax.vmap(
                lambda a, b: eng.step(a, b, ctrl))(qp, qv)
            return (qp, qv), (qp, qv)
        _, (qps, qvs) = jax.lax.scan(body, (qpos, qvel), None, length=5)
        return qps, qvs

    qp_l, qv_l = jax.jit(lambda: roll(eng_l))()
    qp_r, qv_r = jax.jit(lambda: roll(eng_r))()
    np.testing.assert_allclose(np.asarray(qp_l), np.asarray(qp_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(qv_l), np.asarray(qv_r),
                               atol=1e-2, rtol=1e-2)
