"""Forward kinematics and com-frame quantities (pure jnp).

The body tree is unrolled at trace time (parents/joint layout are
compile-time constants from :class:`PhysicsModel`), so XLA sees a
static chain of small fused ops; batching comes from ``vmap`` over the
env axis. Replaces the reference's per-process native engine calls
``sim.forward`` / FK fields (reference: src/deepmimic_env.py:489-491,
mocap FK precompute src/mujoco/mocap_v2.py:292-307).

Field semantics mirror the engine data fields the reference reads:
xpos/xquat (body frames), xipos (inertial com), geom_xpos, cvel
(com-based spatial velocity, [rot; lin], anchored at the subtree com of
the body's kinematic root — used at src/deepmimic_env.py:53-54).
"""
from typing import NamedTuple

import jax.numpy as jnp

from deepmimic_mujoco_tpu.physics import spatial
from deepmimic_mujoco_tpu.models.physics_model import FREE, HINGE, PhysicsModel
from deepmimic_mujoco_tpu.utils import quat as jq


class Kin(NamedTuple):
    """Position-stage kinematics (single env; vmap for batches)."""
    xpos: jnp.ndarray        # (nbody, 3)
    xquat: jnp.ndarray       # (nbody, 4)
    xipos: jnp.ndarray       # (nbody, 3)
    ximat: jnp.ndarray       # (nbody, 3, 3) inertial orientation
    xanchor: jnp.ndarray     # (njnt, 3) joint anchors in world
    xaxis: jnp.ndarray       # (njnt, 3) joint axes in world
    geom_xpos: jnp.ndarray   # (ngeom, 3)
    geom_xmat: jnp.ndarray   # (ngeom, 3, 3)
    site_xpos: jnp.ndarray   # (nsite, 3)
    site_xmat: jnp.ndarray   # (nsite, 3, 3)


class Com(NamedTuple):
    """Com-frame quantities for dynamics."""
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray       # (nbody, 6, 6) spatial inertia, c-frame
    cdof: jnp.ndarray         # (nv, 6) motion subspace, c-frame


def fwd_kinematics(m: PhysicsModel, qpos: jnp.ndarray) -> Kin:
    """qpos -> world frames for bodies, joints, geoms and sites."""
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for i in range(1, m.nbody):
        p = int(m.body_parentid[i])
        pos = xpos[p] + jq.rotate(xquat[p], jnp.asarray(m.body_pos[i], dtype))
        quat = jq.mul(xquat[p], jnp.asarray(m.body_quat[i], dtype))
        j0 = int(m.body_jntadr[i])
        for k in range(int(m.body_jntnum[i])):
            j = j0 + k
            jtype = int(m.jnt_type[j])
            qadr = int(m.jnt_qposadr[j])
            if jtype == FREE:
                pos = qpos[qadr:qadr + 3]
                quat = jq.normalize(qpos[qadr + 3:qadr + 7])
                xanchor[j] = pos
                xaxis[j] = jnp.asarray(m.jnt_axis[j], dtype)
            elif jtype == HINGE:
                axis_l = jnp.asarray(m.jnt_axis[j], dtype)
                jpos_l = jnp.asarray(m.jnt_pos[j], dtype)
                angle = qpos[qadr]
                qj = jq.from_axis_angle(axis_l, angle)
                anchor = pos + jq.rotate(quat, jpos_l)
                quat = jq.mul(quat, qj)
                pos = anchor - jq.rotate(quat, jpos_l)
                xanchor[j] = anchor
                xaxis[j] = jq.rotate(quat, axis_l)
            else:  # SLIDE/BALL: not used by the supported robots yet
                raise NotImplementedError(f"joint type {jtype}")
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)

    bq = xquat  # (nbody, 4)
    xipos = xpos + jq.rotate(bq, jnp.asarray(m.body_ipos, dtype))
    ximat = jq.to_mat(jq.mul(bq, jnp.asarray(m.body_iquat, dtype)))

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

    return Kin(
        xpos=xpos, xquat=xquat, xipos=xipos, ximat=ximat,
        xanchor=jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype),
        xaxis=jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype),
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
    )


def com_pos(m: PhysicsModel, kin: Kin) -> Com:
    """Subtree com, com-frame spatial inertias and motion subspace."""
    dtype = kin.xpos.dtype
    mass = jnp.asarray(m.body_mass, dtype)

    # subtree com: bottom-up accumulation (static unroll)
    sub_mass = [mass[i] for i in range(m.nbody)]
    sub_mom = [mass[i] * kin.xipos[i] for i in range(m.nbody)]
    for i in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[i])
        sub_mass[p] = sub_mass[p] + sub_mass[i]
        sub_mom[p] = sub_mom[p] + sub_mom[i]
    subtree_com = jnp.stack([
        sub_mom[i] / jnp.maximum(sub_mass[i], 1e-12) for i in range(m.nbody)])
    # bodies with zero subtree mass inherit their own frame origin
    # (world body keeps the total-robot com like the engine does via root)

    # com-frame anchor per body: subtree com of its kinematic root
    anchor = subtree_com[m.body_rootid]          # (nbody, 3)

    # spatial inertia about the anchor, world-aligned
    inertia_com = (kin.ximat
                   @ jnp.vectorize(jnp.diag, signature="(k)->(k,k)")(
                       jnp.asarray(m.body_inertia, dtype))
                   @ jnp.swapaxes(kin.ximat, -1, -2))
    cinert = spatial.inertia_matrix(mass, inertia_com, kin.xipos - anchor)

    # motion subspace per dof, about the same anchor
    cdof = []
    for j in range(m.njnt):
        b = int(m.jnt_bodyid[j])
        o = anchor[b]
        jtype = int(m.jnt_type[j])
        if jtype == FREE:
            zero = jnp.zeros(3, dtype)
            for ax in range(3):
                e = jnp.zeros(3, dtype).at[ax].set(1.0)
                cdof.append(jnp.concatenate([zero, e]))
            # rotational dofs: axes of the child body frame, anchored at
            # the body frame origin
            R = jq.to_mat(kin.xquat[b])
            for ax in range(3):
                u = R[:, ax]
                cdof.append(jnp.concatenate([u, jnp.cross(u, o - kin.xpos[b])]))
        elif jtype == HINGE:
            u = kin.xaxis[j]
            a = kin.xanchor[j]
            cdof.append(jnp.concatenate([u, jnp.cross(u, o - a)]))
        else:
            raise NotImplementedError
    cdof = jnp.stack(cdof) if cdof else jnp.zeros((0, 6), dtype)

    return Com(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: PhysicsModel, com: Com, qvel: jnp.ndarray):
    """Body spatial velocities (cvel) and cdof time derivatives.

    Mirrors the engine's velocity stage: cvel accumulates down the tree;
    cdof_dot[j] is the motion cross product of the velocity 'seen so
    far' at that dof with cdof[j] (translation dofs of a free joint are
    constant; its rotation dofs see only the translational velocity).
    """
    dtype = qvel.dtype
    nb = m.nbody
    cvel = [jnp.zeros(6, dtype) for _ in range(nb)]
    cdof_dot = [jnp.zeros(6, dtype) for _ in range(m.nv)]

    for i in range(1, nb):
        p = int(m.body_parentid[i])
        v = cvel[p]
        j0 = int(m.body_jntadr[i])
        for k in range(int(m.body_jntnum[i])):
            j = j0 + k
            jtype = int(m.jnt_type[j])
            d0 = int(m.jnt_dofadr[j])
            if jtype == FREE:
                # translation: constant subspace, cdof_dot = 0
                for ax in range(3):
                    v = v + com.cdof[d0 + ax] * qvel[d0 + ax]
                # rotation: subspace moves with the translational motion
                for ax in range(3, 6):
                    cdof_dot[d0 + ax] = spatial.motion_cross(v, com.cdof[d0 + ax])
                for ax in range(3, 6):
                    v = v + com.cdof[d0 + ax] * qvel[d0 + ax]
            elif jtype == HINGE:
                cdof_dot[d0] = spatial.motion_cross(v, com.cdof[d0])
                v = v + com.cdof[d0] * qvel[d0]
            else:
                raise NotImplementedError
        cvel[i] = v

    return jnp.stack(cvel), jnp.stack(cdof_dot)


def mass_center(m: PhysicsModel, kin: Kin) -> jnp.ndarray:
    """Mass-weighted com of all bodies (reference:
    src/deepmimic_env.py:27-30)."""
    mass = jnp.asarray(m.body_mass, kin.xipos.dtype)[:, None]
    return (mass * kin.xipos).sum(0) / mass.sum()
