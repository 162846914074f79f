"""Collision narrow-phase checks vs the oracle engine.

Floor contacts (the ones that drive locomotion) are compared directly;
self-collision pairs are checked for detection agreement (active /
inactive) since our primitive approximations differ slightly in depth.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.physics import fwd_kinematics
from deepmimic_mujoco_tpu.physics.collision import build_pair_tables, collide


@pytest.fixture(scope="module")
def humanoid():
    path = assets.xml_path("humanoid3d")
    m = load_model(path)
    ref = mujoco.MjModel.from_xml_path(path)
    tables = build_pair_tables(m)
    fn = jax.jit(lambda q: collide(m, tables, fwd_kinematics(m, q), 32))
    return m, ref, fn


def oracle_contacts(ref, qpos):
    d = mujoco.MjData(ref)
    d.qpos[:] = qpos
    mujoco.mj_forward(ref, d)
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        out.append((int(c.geom1), int(c.geom2), float(c.dist),
                    np.array(c.pos), np.array(c.frame[:3])))
    return out


def stand_qpos(nq, z):
    q = np.zeros(nq)
    q[2] = z
    q[3] = 1.0
    return q


def test_feet_on_floor(humanoid):
    m, ref, fn = humanoid
    # lower the humanoid until the feet boxes penetrate the floor
    q = stand_qpos(m.nq, 0.83)
    cons = fn(jnp.asarray(q, jnp.float32))
    ours = {}
    act = np.asarray(cons.dist) < np.asarray(cons.includemargin)
    for i in np.where(act)[0]:
        key = (int(cons.geom1[i]), int(cons.geom2[i]))
        ours.setdefault(key, []).append(
            (float(cons.dist[i]), np.asarray(cons.pos[i])))
    want = oracle_contacts(ref, q)
    want_pairs = {}
    for g1, g2, dist, pos, frame in want:
        want_pairs.setdefault((min(g1, g2), max(g1, g2)), []).append((dist, pos))

    ours_pairs = {(min(a, b), max(a, b)): v for (a, b), v in ours.items()}
    assert set(ours_pairs) == set(want_pairs), (ours_pairs.keys(), want_pairs.keys())
    for key in want_pairs:
        dmine = sorted(d for d, _ in ours_pairs[key])
        dref = sorted(d for d, _ in want_pairs[key])
        # same number of corner contacts at matching depths
        assert len(dmine) >= len(dref)
        np.testing.assert_allclose(dmine[:len(dref)], dref, atol=1e-5)


def test_no_contacts_in_air(humanoid):
    m, ref, fn = humanoid
    q = stand_qpos(m.nq, 2.0)
    cons = fn(jnp.asarray(q, jnp.float32))
    act = np.asarray(cons.dist) < np.asarray(cons.includemargin)
    assert not act.any()
    assert not oracle_contacts(ref, q)


def test_detection_agreement_on_mocap_frames(humanoid):
    """Active-pair agreement with the oracle across a dynamic clip."""
    m, ref, fn = humanoid
    from deepmimic_mujoco_tpu.mocap import load_clip

    clip = load_clip(assets.mocap_path("humanoid3d", "crawl"), m)
    agree = total = 0
    for i in range(0, len(clip), 9):
        q = clip.qpos[i]
        cons = fn(jnp.asarray(q, jnp.float32))
        act = np.asarray(cons.dist) < np.asarray(cons.includemargin)
        ours = {(min(int(cons.geom1[i]), int(cons.geom2[i])),
                 max(int(cons.geom1[i]), int(cons.geom2[i])))
                for i in np.where(act)[0]}
        want = {(min(g1, g2), max(g1, g2))
                for g1, g2, *_ in oracle_contacts(ref, q)}
        floor_ours = {p for p in ours if 0 in p}
        floor_want = {p for p in want if 0 in p}
        total += 1
        agree += floor_ours == floor_want
    assert agree / total > 0.9, f"floor contact agreement {agree}/{total}"
