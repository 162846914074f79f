"""FK / com-stage parity vs the oracle engine on random configurations.

All stages are evaluated through ONE jitted function per robot (shared
by a module-scope fixture) to keep compile counts low; correctness of
each field is asserted separately.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.physics import com_pos, com_vel, fwd_kinematics

N_STATES = 4


def random_state(ref, rng, scale=0.5):
    qpos = rng.normal(size=ref.nq) * scale
    qpos[2] += 1.0
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    for j in range(1, ref.njnt):
        adr = ref.jnt_qposadr[j]
        lo, hi = ref.jnt_range[j]
        qpos[adr] = np.clip(qpos[adr], lo, hi)
    qvel = rng.normal(size=ref.nv) * scale
    return qpos, qvel


@pytest.fixture(scope="module", params=["humanoid3d", "unitree_g1"])
def data(request):
    """Batched outputs of our pipeline + oracle outputs per state."""
    path = assets.xml_path(request.param)
    m = load_model(path)
    ref = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(ref)
    rng = np.random.default_rng(42)
    states = [random_state(ref, rng) for _ in range(N_STATES)]
    qs = jnp.asarray(np.stack([s[0] for s in states]), jnp.float32)
    vs = jnp.asarray(np.stack([s[1] for s in states]), jnp.float32)

    def stage(q, v):
        kin = fwd_kinematics(m, q)
        com = com_pos(m, kin)
        cvel, cdof_dot = com_vel(m, com, v)
        return kin, com, cvel, cdof_dot

    kin, com, cvel, cdof_dot = jax.jit(jax.vmap(stage))(qs, vs)

    oracle = []
    for qpos, qvel in states:
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(ref, d)
        oracle.append({
            "xpos": d.xpos.copy(), "xquat": d.xquat.copy(),
            "xipos": d.xipos.copy(), "geom_xpos": d.geom_xpos.copy(),
            "site_xpos": d.site_xpos.copy(), "xanchor": d.xanchor.copy(),
            "xaxis": d.xaxis.copy(), "subtree_com": d.subtree_com.copy(),
            "cdof": d.cdof.copy(), "cinert": d.cinert.copy(),
            "cvel": d.cvel.copy(), "cdof_dot": d.cdof_dot.copy(),
        })
    return m, kin, com, cvel, cdof_dot, oracle


def test_fk_parity(data):
    m, kin, com, cvel, cdof_dot, oracle = data
    for i, o in enumerate(oracle):
        np.testing.assert_allclose(np.asarray(kin.xpos[i]), o["xpos"], atol=3e-6)
        dot = np.abs(np.sum(np.asarray(kin.xquat[i]) * o["xquat"], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(kin.xipos[i]), o["xipos"], atol=3e-6)
        np.testing.assert_allclose(np.asarray(kin.geom_xpos[i]), o["geom_xpos"], atol=3e-6)
        np.testing.assert_allclose(np.asarray(kin.site_xpos[i]), o["site_xpos"], atol=3e-6)
        np.testing.assert_allclose(np.asarray(kin.xanchor[i]), o["xanchor"], atol=3e-6)
        np.testing.assert_allclose(np.asarray(kin.xaxis[i]), o["xaxis"], atol=3e-6)


def test_com_stage_parity(data):
    m, kin, com, cvel, cdof_dot, oracle = data
    for i, o in enumerate(oracle):
        np.testing.assert_allclose(np.asarray(com.subtree_com[i])[1:],
                                   o["subtree_com"][1:], atol=3e-6)
        np.testing.assert_allclose(np.asarray(com.cdof[i]), o["cdof"], atol=2e-5)
        cin = np.asarray(com.cinert[i])
        for b in range(1, m.nbody):
            I10 = o["cinert"][b]
            Imat = np.array([
                [I10[0], I10[3], I10[4]],
                [I10[3], I10[1], I10[5]],
                [I10[4], I10[5], I10[2]],
            ])
            h = I10[6:9]
            mass = I10[9]
            hx = np.array([[0, -h[2], h[1]], [h[2], 0, -h[0]], [-h[1], h[0], 0]])
            S = np.zeros((6, 6))
            S[:3, :3] = Imat
            S[:3, 3:] = hx
            S[3:, :3] = hx.T
            S[3:, 3:] = mass * np.eye(3)
            # convention verified exactly in float64; tolerance covers
            # float32 accumulation over the subtree-com chain
            np.testing.assert_allclose(cin[b], S, atol=1.5e-3,
                                       err_msg=f"body {m.body_names[b]}")


def test_cvel_parity(data):
    m, kin, com, cvel, cdof_dot, oracle = data
    for i, o in enumerate(oracle):
        np.testing.assert_allclose(np.asarray(cvel[i]), o["cvel"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(cdof_dot[i]), o["cdof_dot"], atol=1e-4)
