"""Forward kinematics and com-frame quantities (pure jnp, TPU-first).

Tree recursions are restructured for low kernel counts:
- FK walks *levels* of the link tree (depth ~7-11) instead of bodies,
  each level one vectorized batch (see physics/tree.py);
- every accumulation (subtree com, velocity propagation) is a dense
  0/1-mask matmul that XLA maps onto the MXU.

Replaces the reference's per-process native engine calls
``sim.forward`` / FK fields (reference: src/deepmimic_env.py:489-491,
mocap FK precompute src/mujoco/mocap_v2.py:292-307). Field semantics
mirror the engine data the reference reads: xpos/xquat, xipos,
geom_xpos, cvel ([rot; lin], anchored at the subtree com of the body's
kinematic root — used at src/deepmimic_env.py:53-54).
"""
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import FREE, PhysicsModel
from deepmimic_mujoco_tpu.physics import spatial
from deepmimic_mujoco_tpu.physics.tree import (
    LINK_FIXED, LINK_FREE, LINK_HINGE, TreeTables, build_tree_tables,
)
from deepmimic_mujoco_tpu.utils import quat as jq

_TREE_CACHE = {}


def tree_tables(m: PhysicsModel) -> TreeTables:
    key = id(m)
    if key not in _TREE_CACHE:
        _TREE_CACHE[key] = build_tree_tables(m)
    return _TREE_CACHE[key]


class Kin(NamedTuple):
    """Position-stage kinematics (single env; vmap for batches)."""
    xpos: jnp.ndarray        # (nbody, 3)
    xquat: jnp.ndarray       # (nbody, 4)
    xipos: jnp.ndarray       # (nbody, 3)
    ximat: jnp.ndarray       # (nbody, 3, 3)
    xanchor: jnp.ndarray     # (njnt, 3)
    xaxis: jnp.ndarray       # (njnt, 3)
    geom_xpos: jnp.ndarray   # (ngeom, 3)
    geom_xmat: jnp.ndarray   # (ngeom, 3, 3)
    site_xpos: jnp.ndarray   # (nsite, 3)
    site_xmat: jnp.ndarray   # (nsite, 3, 3)


class Com(NamedTuple):
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray       # (nbody, 6, 6)
    cdof: jnp.ndarray         # (nv, 6)


def fwd_kinematics(m: PhysicsModel, qpos: jnp.ndarray) -> Kin:
    """qpos -> world frames, level-parallel."""
    dtype = qpos.dtype
    t = tree_tables(m)

    # slot-major buffers, world row prepended (index 0)
    pos_rows = [jnp.zeros((1, 3), dtype)]
    quat_rows = [jnp.asarray([[1.0, 0, 0, 0]], dtype)]
    anchor_rows = [jnp.zeros((1, 3), dtype)]
    axis_rows = [jnp.zeros((1, 3), dtype)]
    n_done = 1

    for grp in t.groups:
        pos_all = jnp.concatenate(pos_rows) if len(pos_rows) > 1 else pos_rows[0]
        quat_all = jnp.concatenate(quat_rows) if len(quat_rows) > 1 else quat_rows[0]
        pidx = grp.parent_slot + 1  # world at 0
        p_pos = pos_all[pidx]
        p_quat = quat_all[pidx]
        off_p = jnp.asarray(grp.offset_pos, dtype)
        off_q = jnp.asarray(grp.offset_quat, dtype)
        pre_pos = p_pos + jq.rotate(p_quat, off_p)
        pre_quat = jq.mul(p_quat, off_q)

        if grp.link_type == LINK_FREE:
            qidx = grp.qpos_adr[:, None] + np.arange(7)[None]
            qv = qpos[qidx]  # (L, 7)
            new_pos = qv[:, :3]
            new_quat = jq.normalize(qv[:, 3:7])
            anchor = new_pos
            axis = jnp.asarray(grp.jnt_axis, dtype)
        elif grp.link_type == LINK_HINGE:
            angle = qpos[grp.qpos_adr]
            axis_l = jnp.asarray(grp.jnt_axis, dtype)
            jpos_l = jnp.asarray(grp.jnt_pos, dtype)
            qj = jq.from_axis_angle(axis_l, angle)
            anchor = pre_pos + jq.rotate(pre_quat, jpos_l)
            new_quat = jq.mul(pre_quat, qj)
            new_pos = anchor - jq.rotate(new_quat, jpos_l)
            axis = jq.rotate(new_quat, axis_l)
        else:  # fixed
            new_pos, new_quat = pre_pos, pre_quat
            anchor = new_pos
            axis = jnp.asarray(grp.jnt_axis, dtype)

        pos_rows.append(new_pos)
        quat_rows.append(new_quat)
        anchor_rows.append(anchor)
        axis_rows.append(axis)
        n_done += len(grp.parent_slot)

    pos_all = jnp.concatenate(pos_rows)
    quat_all = jnp.concatenate(quat_rows)
    anchor_all = jnp.concatenate(anchor_rows)
    axis_all = jnp.concatenate(axis_rows)

    xpos = pos_all[t.body_slot + 1]
    xquat = quat_all[t.body_slot + 1]
    xanchor = anchor_all[t.jnt_slot + 1]
    xaxis = axis_all[t.jnt_slot + 1]

    xipos = xpos + jq.rotate(xquat, jnp.asarray(m.body_ipos, dtype))
    ximat = jq.to_mat(jq.mul(xquat, jnp.asarray(m.body_iquat, dtype)))

    gb = m.geom_bodyid
    geom_xpos = xpos[gb] + jq.rotate(xquat[gb], jnp.asarray(m.geom_pos, dtype))
    geom_xmat = jq.to_mat(jq.mul(xquat[gb], jnp.asarray(m.geom_quat, dtype)))

    if m.nsite:
        sb = m.site_bodyid
        site_xpos = xpos[sb] + jq.rotate(xquat[sb], jnp.asarray(m.site_pos, dtype))
        site_xmat = jq.to_mat(jq.mul(xquat[sb], jnp.asarray(m.site_quat, dtype)))
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype)

    return Kin(xpos=xpos, xquat=xquat, xipos=xipos, ximat=ximat,
               xanchor=xanchor, xaxis=xaxis,
               geom_xpos=geom_xpos, geom_xmat=geom_xmat,
               site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: PhysicsModel, kin: Kin) -> Com:
    """Subtree com, com-frame spatial inertias, motion subspace —
    accumulations as dense mask matmuls."""
    dtype = kin.xpos.dtype
    t = tree_tables(m)
    mass = jnp.asarray(m.body_mass, dtype)
    D = jnp.asarray(t.descendants, dtype)

    # HIGHEST: default matmul precision rounds inputs to bf16 on the
    # TPU MXU — measured up to 3.4e-2 abs error in cinert vs the CPU
    # path (round-5 lanes diagnosis, runs/q_r5_lanes_diag.log). These
    # are tiny matmuls; exactness costs nothing here.
    _hi = jax.lax.Precision.HIGHEST
    sub_mass = jnp.matmul(D, mass, precision=_hi)
    sub_mom = jnp.matmul(D, mass[:, None] * kin.xipos, precision=_hi)
    subtree_com = sub_mom / jnp.maximum(sub_mass, 1e-12)[:, None]

    anchor = subtree_com[m.body_rootid]  # (nbody, 3)

    diag = jnp.zeros((m.nbody, 3, 3), dtype)
    inertia_diag = jnp.asarray(m.body_inertia, dtype)
    diag = diag.at[:, 0, 0].set(inertia_diag[:, 0])
    diag = diag.at[:, 1, 1].set(inertia_diag[:, 1])
    diag = diag.at[:, 2, 2].set(inertia_diag[:, 2])
    inertia_com = jnp.matmul(
        jnp.matmul(kin.ximat, diag, precision=_hi),
        jnp.swapaxes(kin.ximat, -1, -2), precision=_hi)
    cinert = spatial.inertia_matrix(mass, inertia_com, kin.xipos - anchor)

    # cdof: free root (6 rows) + hinges (1 row each), dof order
    rows = []
    hinge_jids = [j for j in range(m.njnt) if m.jnt_type[j] != FREE]
    free_jids = [j for j in range(m.njnt) if m.jnt_type[j] == FREE]
    assert free_jids in ([], [0]), "free joint must be the root joint"
    if free_jids:
        b = int(m.jnt_bodyid[0])
        o = anchor[b]
        eye = jnp.eye(3, dtype=dtype)
        zeros = jnp.zeros((3, 3), dtype)
        trans = jnp.concatenate([zeros, eye], axis=1)  # (3, 6)
        R = jq.to_mat(kin.xquat[b])
        u = jnp.swapaxes(R, -1, -2)  # row k = body axis k in world (R[:, k])
        lin = jnp.cross(u, (o - kin.xpos[b])[None, :])
        rot = jnp.concatenate([u, lin], axis=1)  # (3, 6)
        rows.append(trans)
        rows.append(rot)
    if hinge_jids:
        hj = np.asarray(hinge_jids)
        u = kin.xaxis[hj]
        a = kin.xanchor[hj]
        o = anchor[np.asarray(m.jnt_bodyid)[hj]]
        rows.append(jnp.concatenate([u, jnp.cross(u, o - a)], axis=1))
    cdof = jnp.concatenate(rows, axis=0)
    return Com(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: PhysicsModel, com: Com, qvel: jnp.ndarray):
    """cvel per body + cdof time derivatives, via mask matmuls.

    cvel[i] = sum over root-path dofs of cdof*qvel; cdof_dot[j] is the
    motion cross of the velocity 'seen' by dof j (strict dof ancestors;
    a free joint's rotation subspace sees only its translations) with
    cdof[j] — matches the engine's velocity stage (validated against
    oracle cvel/cdof_dot).
    """
    dtype = qvel.dtype
    t = tree_tables(m)
    _hi = jax.lax.Precision.HIGHEST  # bf16 MXU rounding (see com_pos)
    wv = com.cdof * qvel[:, None]                        # (nv, 6)
    cvel = jnp.matmul(jnp.asarray(t.body_dof_path, dtype), wv,
                      precision=_hi)                     # (nbody, 6)
    vseen = jnp.matmul(jnp.asarray(t.dof_seen, dtype), wv,
                       precision=_hi)                    # (nv, 6)
    cdof_dot = spatial.motion_cross(vseen, com.cdof)
    cdof_dot = cdof_dot * (1.0 - jnp.asarray(t.dof_free_trans, dtype))[:, None]
    return cvel, cdof_dot


def mass_center(m: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Mass-weighted com of all bodies (reference:
    src/deepmimic_env.py:27-30)."""
    mass = jnp.asarray(m.body_mass, kin.xipos.dtype)[:, None]
    return (mass * kin.xipos).sum(0) / mass.sum()
