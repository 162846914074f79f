"""Constraint solver: soft contacts + joint limits in dual (force) space.

Matches the reference engine's constraint model (PGS solver with
solref/solimp "KBI" soft constraints, ``iterations=50`` per
deepmimic_humanoid3d.xml:9): constraint accelerations are driven toward
``aref = -b*vel - k*imp*pos`` through the impedance-regularized system

    A = J M^-1 J^T + diag(R),   R_i = (1 - imp_i)/imp_i * A_ii.

Contacts use an elliptic friction cone (condim-1 pairs have mu=0 ==
frictionless, exactly the reference's condim semantics); the engine's
pyramidal cone differs slightly in the sliding regime — a documented
approximation validated at behavior level. Joint limits are unilateral
rows with J = +-e_dof.

TPU-first: fixed shapes (K contact slots * 3 rows + L limit slots),
activity handled by masks, and the iteration is a fully vectorized
under-relaxed projected block-Jacobi — no sequential per-contact sweep,
so the whole solve vmaps over thousands of envs as batched matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import PhysicsModel
from deepmimic_mujoco_tpu.physics.collision import Contacts
from deepmimic_mujoco_tpu.physics.kinematics import Com, Kin

_LIMIT_SOLREF = (0.02, 1.0)
_LIMIT_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)


class SolveResult(NamedTuple):
    qacc: jnp.ndarray             # (nv,)
    qfrc_constraint: jnp.ndarray  # (nv,)
    lam: jnp.ndarray              # (K*3 + L,) constraint forces


def _impedance(solimp, pos):
    """solimp = (dmin, dmax, width, midpoint, power); pos<0 = violated."""
    dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-10), 0.0, 1.0)
    a = 1.0 / jnp.maximum(mid, 1e-6) ** (power - 1)
    b = 1.0 / jnp.maximum(1 - mid, 1e-6) ** (power - 1)
    y = jnp.where(x < mid, a * x ** power, 1.0 - b * (1.0 - x) ** power)
    return jnp.clip(dmin + y * (dmax - dmin), 1e-5, 1.0 - 1e-5)


def _kb(solref, solimp):
    """(stiffness k, damping b) from solref=(timeconst, dampratio)."""
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    dmax = solimp[..., 1]
    b = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-10)
    return k, b


def build_contact_jacobian(m: PhysicsModel, com: Com, contacts: Contacts,
                           body_dof: np.ndarray) -> jnp.ndarray:
    """(K, 3, nv): rows = relative velocity of geom2's body w.r.t.
    geom1's body at the contact point, in the contact frame."""
    g2b = jnp.asarray(np.asarray(m.geom_bodyid), jnp.int32)
    b1 = g2b[contacts.geom1]
    b2 = g2b[contacts.geom2]
    anchor = com.subtree_com[int(m.body_rootid[-1])]
    cd_ang = com.cdof[:, :3]                     # (nv, 3)
    cd_lin = com.cdof[:, 3:]
    r = contacts.pos[:, None, :] - anchor        # (K, 1, 3)
    Jp = cd_lin[None] + jnp.cross(cd_ang[None], r)   # (K, nv, 3)
    mask = jnp.asarray(body_dof, contacts.pos.dtype)  # (nbody, nv)
    w = mask[b2] - mask[b1]                      # (K, nv)
    Jp = Jp * w[:, :, None]
    return jnp.einsum("krd,knd->krn", contacts.frame, Jp)


def solve_constraints(m: PhysicsModel, com: Com, M: jnp.ndarray,
                      qacc_smooth: jnp.ndarray, qpos: jnp.ndarray,
                      qvel: jnp.ndarray, contacts: Contacts,
                      body_dof: np.ndarray, limit_table,
                      iterations: int = 50,
                      relaxation: float = 0.6) -> SolveResult:
    dtype = qacc_smooth.dtype
    nv = m.nv
    K = contacts.dist.shape[0]

    # ---- contact rows --------------------------------------------------
    Jc = build_contact_jacobian(m, com, contacts, body_dof)   # (K, 3, nv)
    pos_c = contacts.dist - contacts.includemargin
    active_c = pos_c < 0.0
    imp_c = _impedance(contacts.solimp, pos_c)
    k_c, b_c = _kb(contacts.solref, contacts.solimp)
    vel_c = jnp.einsum("krn,n->kr", Jc, qvel)
    normal_sel = jnp.asarray([1.0, 0.0, 0.0], dtype)
    aref_c = -b_c[:, None] * vel_c - (k_c * imp_c * pos_c)[:, None] * normal_sel

    J = Jc.reshape(K * 3, nv)
    aref = aref_c.reshape(K * 3)
    imp = jnp.repeat(imp_c, 3)
    active = jnp.repeat(active_c, 3)

    # ---- joint-limit rows ----------------------------------------------
    ld, lq, llo, lhi = limit_table
    L = len(ld)
    if L:
        qj = qpos[np.asarray(lq)]
        vj = qvel[np.asarray(ld)]
        dist_lo = qj - jnp.asarray(llo, dtype)   # >=0 ok
        dist_hi = jnp.asarray(lhi, dtype) - qj
        # one row per joint: the nearer limit (both can't bind at once)
        use_lo = dist_lo < dist_hi
        pos_l = jnp.where(use_lo, dist_lo, dist_hi)
        sign = jnp.where(use_lo, 1.0, -1.0)
        active_l = pos_l < 0.0
        solimp_l = jnp.asarray(np.tile(_LIMIT_SOLIMP, (L, 1)), dtype)
        solref_l = jnp.asarray(np.tile(_LIMIT_SOLREF, (L, 1)), dtype)
        imp_l = _impedance(solimp_l, pos_l)
        k_l, b_l = _kb(solref_l, solimp_l)
        vel_l = sign * vj
        aref_l = -b_l * vel_l - k_l * imp_l * pos_l
        Jl = jnp.zeros((L, nv), dtype).at[
            jnp.arange(L), jnp.asarray(np.asarray(ld))].set(sign)
        J = jnp.concatenate([J, Jl], axis=0)
        aref = jnp.concatenate([aref, aref_l])
        imp = jnp.concatenate([imp, imp_l])
        active = jnp.concatenate([active, active_l])

    # ---- A = J M^-1 J^T + R --------------------------------------------
    cho = jax.scipy.linalg.cho_factor(M)
    MinvJT = jax.scipy.linalg.cho_solve(cho, J.T)            # (nv, n)
    A = J @ MinvJT
    diagA = jnp.clip(jnp.diag(A), 1e-8, None)
    R = (1.0 - imp) / imp * diagA
    b_vec = J @ qacc_smooth - aref
    Ahat = A + jnp.diag(R)
    inv_diag = relaxation / jnp.clip(jnp.diag(Ahat), 1e-8, None)
    activef = active.astype(dtype)

    mu = contacts.friction[:, 0]

    def project(lam):
        lamc = lam[:K * 3].reshape(K, 3)
        n = jnp.maximum(lamc[:, 0], 0.0)
        t = lamc[:, 1:]
        tn = jnp.linalg.norm(t, axis=-1)
        lim = mu * n
        scale = jnp.where(tn > lim,
                          lim / jnp.maximum(tn, 1e-12), 1.0)
        t = t * scale[:, None]
        lamc = jnp.concatenate([n[:, None], t], axis=1).reshape(K * 3)
        if L:
            laml = jnp.maximum(lam[K * 3:], 0.0)
            lam = jnp.concatenate([lamc, laml])
        else:
            lam = lamc
        return lam * activef

    def sweep(_, lam):
        grad = Ahat @ lam + b_vec
        return project(lam - inv_diag * grad)

    lam = jax.lax.fori_loop(0, iterations, sweep,
                            jnp.zeros(J.shape[0], dtype))

    qfrc = J.T @ lam
    qacc = qacc_smooth + jax.scipy.linalg.cho_solve(cho, qfrc)
    return SolveResult(qacc=qacc, qfrc_constraint=qfrc, lam=lam)
