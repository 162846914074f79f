"""Multi-capsule mesh proxies (opt-in Engine(mesh_subcapsules=2)).

A single PCA capsule over-approximates elongated G1 links; the
2-segment decomposition must (a) still cover the hull, (b) be tighter
(less false rest-pose overlap before calibration), and (c) leave the
default single-capsule path byte-identical.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import assets, load_model, mesh_utils
from deepmimic_mujoco_tpu.physics.collision import (
    build_pair_tables, total_slots,
)
from deepmimic_mujoco_tpu.physics.step import Engine


def _capsule_dist(p, cap):
    pos, quat, r, h = cap
    from deepmimic_mujoco_tpu.utils import hostquat as hq
    axis = hq.to_mat(np.asarray(quat))[:, 2]
    t = np.clip((p - pos) @ axis, -h, h)
    return np.linalg.norm(p - (pos + t * axis)) - r


def test_fit_capsules_cover_hull():
    rng = np.random.default_rng(0)
    # elongated L-ish cloud
    a = rng.normal(size=(60, 3)) * [0.02, 0.02, 0.2]
    b = rng.normal(size=(60, 3)) * [0.1, 0.02, 0.02] + [0.0, 0.0, 0.25]
    verts = np.concatenate([a, b])
    caps = mesh_utils.fit_capsules(verts, 2)
    assert len(caps) == 2
    for p in verts:
        d = min(_capsule_dist(p, c) for c in caps)
        assert d < 0.02, (p, d)


def test_fit_capsules_tighter_than_single():
    """Volume proxy: sum of sub-capsule bounding volumes should not
    exceed ~1.5x, while the max radius shrinks for elongated parts."""
    rng = np.random.default_rng(1)
    verts = np.concatenate([
        rng.normal(size=(80, 3)) * [0.03, 0.03, 0.3],
        rng.normal(size=(80, 3)) * [0.15, 0.03, 0.03] + [0, 0, 0.4],
    ])
    single = mesh_utils.fit_capsule(verts)
    caps = mesh_utils.fit_capsules(verts, 2)
    assert max(c[2] for c in caps) <= single[2] + 1e-9


def test_g1_subcapsule_tables_and_step():
    m = load_model(assets.xml_path("unitree_g1"))
    t1 = build_pair_tables(m, mesh_subcapsules=1)
    t2 = build_pair_tables(m, mesh_subcapsules=2)
    assert total_slots(t2) > total_slots(t1)
    # default table carries no sub expansion
    assert all((g.sub1 < 0).all() and (g.sub2 < 0).all() for g in t1)

    eng = Engine(m, iterations=8, mesh_subcapsules=2)
    q0 = np.asarray(m.key_qpos[0])
    step = jax.jit(eng.step)
    q, v = jnp.asarray(q0, jnp.float32), jnp.zeros(m.nv, jnp.float32)
    for _ in range(5):
        q, v, _ = step(q, v, jnp.zeros(m.nu, jnp.float32))
    assert bool(jnp.isfinite(q).all()) and bool(jnp.isfinite(v).all())
    # standing start stays standing over 5 steps
    assert float(q[2]) > 0.6


def _support(points, dirs):
    return (dirs @ points.T).max(1)


def _capsule_support(cap, dirs):
    pos, quat, r, h = cap
    from deepmimic_mujoco_tpu.utils import hostquat as hq
    axis = hq.to_mat(np.asarray(quat))[:, 2]
    return dirs @ pos + np.abs(dirs @ axis) * h + r


def test_subcapsules_protrude_less_than_single():
    """Support-function comparison on the real G1 meshes: the union of
    sub-capsules must stick out beyond the true hull less (on average
    over directions) than the single fat PCA capsule — i.e. the
    decomposition is a strictly tighter over-approximation."""
    m = load_model(assets.xml_path("unitree_g1"))
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(128, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    n_multi = 0
    for mesh in m.meshes:
        hv = np.asarray(mesh.verts)
        h_hull = _support(hv, dirs)
        single = (np.asarray(mesh.capsule_pos), mesh.capsule_quat,
                  mesh.capsule_size[0], mesh.capsule_size[1])
        e1 = np.maximum(_capsule_support(single, dirs) - h_hull, 0.0)
        h_sub = np.max([_capsule_support(c, dirs)
                        for c in mesh.sub_capsules], axis=0)
        e2 = np.maximum(h_sub - h_hull, 0.0)
        # adaptive fit: whatever was chosen is never worse than single
        assert e2.mean() <= e1.mean() + 1e-6, mesh.name
        n_multi += len(mesh.sub_capsules) > 1
    # elongated links (knees, hip-yaw, forearms...) must actually split
    assert n_multi >= 4, n_multi
