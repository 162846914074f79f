"""Smooth dynamics: CRBA mass matrix, RNE bias forces, actuation.

Tree loops are unrolled at trace time; everything else is batched
linear algebra that XLA maps onto the MXU when vmapped over envs.
Replaces the native engine's smooth-dynamics stage invoked by the
reference's ``sim.step`` (reference: src/deepmimic_env.py:362).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import FREE, HINGE, PhysicsModel
from deepmimic_mujoco_tpu.physics import spatial
from deepmimic_mujoco_tpu.physics.kinematics import Com


def dof_ancestor_mask(m: PhysicsModel) -> np.ndarray:
    """Static (nv, nv) bool: mask[i, j] = dof i is on the root path of
    dof j (ancestor-or-self)."""
    nv = m.nv
    mask = np.zeros((nv, nv), dtype=bool)
    for j in range(nv):
        k = j
        while k >= 0:
            mask[k, j] = True
            k = int(m.dof_parentid[k])
    return mask


def body_dof_mask(m: PhysicsModel) -> np.ndarray:
    """Static (nbody, nv) bool: dofs that move each body."""
    mask = np.zeros((m.nbody, m.nv), dtype=bool)
    for b in range(1, m.nbody):
        i = b
        while i > 0:
            if m.body_dofnum[i] > 0:
                a = int(m.body_dofadr[i])
                mask[b, a:a + int(m.body_dofnum[i])] = True
            i = int(m.body_parentid[i])
    return mask


def crb(m: PhysicsModel, com: Com) -> jnp.ndarray:
    """Composite-rigid-body mass matrix (dense, nv x nv) + armature.

    Subtree inertia accumulation is one descendant-mask matmul; the
    matrix assembly is one (nv, 6) x (6, nv) matmul masked by the static
    ancestor pattern.
    """
    from deepmimic_mujoco_tpu.physics.kinematics import tree_tables

    dtype = com.cdof.dtype
    t = tree_tables(m)
    D = jnp.asarray(t.descendants, dtype)
    Ic_tot = (D @ com.cinert.reshape(m.nbody, 36)).reshape(m.nbody, 6, 6)
    Icd = Ic_tot[np.asarray(m.dof_bodyid)]
    F = jnp.einsum("jab,jb->ja", Icd, com.cdof)
    G = com.cdof @ F.T  # G[i, j] = cdof_i . F_j
    mask = jnp.asarray(dof_ancestor_mask(m))
    M = jnp.triu(jnp.where(mask, G, 0.0))
    M = M + M.T - jnp.diag(jnp.diag(M))
    return M + jnp.diag(jnp.asarray(m.dof_armature, dtype))


def rne(m: PhysicsModel, com: Com, cvel: jnp.ndarray,
        cdof_dot: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Bias force C(q, v) + gravity loads (qacc = 0).

    Forward acceleration propagation and backward force accumulation
    are dense mask matmuls (path-sum and subtree-sum respectively).
    """
    from deepmimic_mujoco_tpu.physics.kinematics import tree_tables

    dtype = qvel.dtype
    t = tree_tables(m)
    grav = jnp.asarray(m.opt.gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -grav])
    path = jnp.asarray(t.body_dof_path, dtype)          # (nbody, nv)
    cacc = a0[None, :] + path @ (cdof_dot * qvel[:, None])
    # world row gets a0 too but contributes nothing below
    Iv = jnp.einsum("nab,nb->na", com.cinert, cvel)
    f = (jnp.einsum("nab,nb->na", com.cinert, cacc)
         + spatial.force_cross(cvel, Iv))
    D = jnp.asarray(t.descendants, dtype)
    ftot = D @ f                                         # subtree sums
    return jnp.einsum("jd,jd->j", com.cdof, ftot[np.asarray(m.dof_bodyid)])


def passive_force(m: PhysicsModel, qpos: jnp.ndarray,
                  qvel: jnp.ndarray) -> jnp.ndarray:
    """Spring forces only. Viscous damping and joint frictionloss are
    handled by the integrator (Euler: implicitly; RK4: explicitly with
    a stability-bounded smooth Coulomb) — see Engine.forward. The
    reference engine treats frictionloss as a constraint row; an
    explicitly-integrated tanh approximation is violently unstable on
    near-massless finger dofs (slope floss/eps >> 2*I/dt).
    """
    dtype = qvel.dtype
    frc = jnp.zeros(m.nv, dtype)
    if np.any(m.jnt_stiffness != 0):
        # hinge springs only (free-joint springs unused by these robots)
        for j in range(m.njnt):
            if m.jnt_type[j] == HINGE and m.jnt_stiffness[j] != 0:
                qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
                frc = frc.at[dadr].add(
                    -m.jnt_stiffness[j] * (qpos[qadr] - m.jnt_springref[j]))
    return frc


def actuator_force(m: PhysicsModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Motor transmission: qfrc[dof(joint)] += gear * clip(ctrl)."""
    dtype = ctrl.dtype
    lo = jnp.asarray(m.actuator_ctrlrange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_ctrlrange[:, 1], dtype)
    limited = jnp.asarray(m.actuator_ctrllimited)
    c = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)
    force = c * jnp.asarray(m.actuator_gear, dtype)
    # scatter to dofs (static mapping: motor -> joint -> first dof)
    dof_idx = np.asarray([int(m.jnt_dofadr[j]) for j in m.actuator_trnid])
    qfrc = jnp.zeros(m.nv, dtype)
    return qfrc.at[dof_idx].add(force)


def limited_hinge_table(m: PhysicsModel):
    """Static (dof_adr, qpos_adr, lo, hi) arrays for limited hinges;
    consumed by the constraint solver's joint-limit rows."""
    rows = [(int(m.jnt_dofadr[j]), int(m.jnt_qposadr[j]),
             float(m.jnt_range[j, 0]), float(m.jnt_range[j, 1]))
            for j in range(m.njnt)
            if m.jnt_type[j] == HINGE and m.jnt_limited[j]]
    if not rows:
        return (np.zeros(0, np.int64),) * 2 + (np.zeros(0),) * 2
    d, q, lo, hi = map(np.asarray, zip(*rows))
    return d, q, lo.astype(float), hi.astype(float)
