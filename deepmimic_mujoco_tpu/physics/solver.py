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
projected diagonal-scaled gradient whose step size comes from an
in-solve power-iteration estimate of lambda_max(D^-1 A) — a fixed
relaxation diverges once many rows couple (G1: ~130 rows through one
tree). The whole solve vmaps over thousands of envs as batched matmuls.
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


def _kb(solref, solimp, dt: float = 0.0):
    """(stiffness k, damping b) from solref=(timeconst, dampratio).

    Like the reference engine, the time constant is clamped to at least
    2*timestep — without the clamp dt*b ~= 1.75 makes every loaded
    contact a marginal discrete oscillator that pumps energy into the
    tree (observed as G1 knees exploding under standing load).
    """
    timeconst = jnp.maximum(solref[..., 0], 2.0 * dt)
    dampratio = solref[..., 1]
    dmax = solimp[..., 1]
    b = 2.0 / jnp.maximum(dmax * timeconst, 1e-10)
    k = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, 1e-10)
    return k, b


def contact_jac_parts(m: PhysicsModel, com: Com, contacts: Contacts,
                      body_dof: np.ndarray):
    """Raw pieces of the contact Jacobian: (cd_lin (nv,3), cd_ang
    (nv,3), rpos (K,3) contact point rel. the root subtree com, w
    (K,nv) signed body-path dof mask). The fused TPU path consumes
    these directly so the per-env (n, nv) J is never materialized."""
    g2b = jnp.asarray(np.asarray(m.geom_bodyid), jnp.int32)
    b1 = g2b[contacts.geom1]
    b2 = g2b[contacts.geom2]
    anchor = com.subtree_com[int(m.body_rootid[-1])]
    cd_ang = com.cdof[:, :3]                     # (nv, 3)
    cd_lin = com.cdof[:, 3:]
    rpos = contacts.pos - anchor                 # (K, 3)
    mask = jnp.asarray(body_dof, contacts.pos.dtype)  # (nbody, nv)
    w = mask[b2] - mask[b1]                      # (K, nv)
    return cd_lin, cd_ang, rpos, w


def build_contact_jacobian(m: PhysicsModel, com: Com, contacts: Contacts,
                           body_dof: np.ndarray) -> jnp.ndarray:
    """(K, 3, nv): rows = relative velocity of geom2's body w.r.t.
    geom1's body at the contact point, in the contact frame."""
    cd_lin, cd_ang, rpos, w = contact_jac_parts(m, com, contacts,
                                                body_dof)
    Jp = cd_lin[None] + jnp.cross(cd_ang[None], rpos[:, None, :])
    Jp = Jp * w[:, :, None]                      # (K, nv, 3)
    return jnp.einsum("krd,knd->krn", contacts.frame, Jp)


def solve_constraints(m: PhysicsModel, com: Com, M_hat: jnp.ndarray,
                      qfrc_smooth: jnp.ndarray, qpos: jnp.ndarray,
                      qvel: jnp.ndarray, contacts: Contacts,
                      body_dof: np.ndarray, limit_table,
                      iterations: int = 50,
                      relaxation: float = 0.15,
                      lam0=None, cone: str = "elliptic") -> SolveResult:
    """``M_hat`` is the (possibly implicit-damping-augmented) mass
    matrix; the inverse-mass solve happens INSIDE this function so the
    TPU path can fuse it with the constraint solve in one Pallas
    kernel (ops/fused_solve.py). The XLA fallback forms an explicit
    inverse — see physics/linalg.py for why that beats triangular
    solves for batched tiny systems under plain XLA."""
    dt = m.opt.timestep
    dtype = qfrc_smooth.dtype
    nv = m.nv
    K = contacts.dist.shape[0]

    use_fused = bool(iterations) and _use_fused()

    # ---- contact rows (segment-major: normals | t1 | t2 | limits) -----
    if use_fused:
        # J is never materialized: the Pallas batch rule builds J^T
        # straight in kernel layout from these parts, and the contact
        # velocity contracts through u = sum_n w v cd (Jp v = u_lin +
        # u_ang x r per contact)
        cd_lin, cd_ang, rpos, w = contact_jac_parts(
            m, com, contacts, body_dof)
        wv = w * qvel[None, :]
        u_lin = wv @ cd_lin                      # (K, 3)
        u_ang = wv @ cd_ang
        vel_c = jnp.einsum(
            "krd,kd->kr", contacts.frame,
            u_lin + jnp.cross(u_ang, rpos))
    else:
        Jc = build_contact_jacobian(m, com, contacts, body_dof)
        vel_c = jnp.einsum("krn,n->kr", Jc, qvel)
    pos_c = contacts.dist - contacts.includemargin
    active_c = pos_c < 0.0
    imp_c = _impedance(contacts.solimp, pos_c)
    k_c, b_c = _kb(contacts.solref, contacts.solimp, dt)
    normal_sel = jnp.asarray([1.0, 0.0, 0.0], dtype)
    aref_c = -b_c[:, None] * vel_c - (k_c * imp_c * pos_c)[:, None] * normal_sel

    aref = jnp.concatenate([aref_c[:, 0], aref_c[:, 1], aref_c[:, 2]])
    imp = jnp.tile(imp_c, 3)
    active = jnp.tile(active_c, 3)

    # ---- joint-limit rows (J_l = +-e_dof: never materialized) ----------
    ld, lq, llo, lhi = limit_table
    L = len(ld)
    ld_idx = np.asarray(ld)
    if L:
        qj = qpos[np.asarray(lq)]
        vj = qvel[ld_idx]
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
        k_l, b_l = _kb(solref_l, solimp_l, dt)
        vel_l = sign * vj
        aref_l = -b_l * vel_l - k_l * imp_l * pos_l
        aref = jnp.concatenate([aref, aref_l])
        imp = jnp.concatenate([imp, imp_l])
        active = jnp.concatenate([active, active_l])

    activef = active.astype(dtype)
    mu = contacts.friction[:, 0]

    if use_fused:
        # one Pallas kernel: M^-1, J^T build, A, and all sweeps in VMEM
        from deepmimic_mujoco_tpu.ops.fused_solve import (
            fused_solve_parts_single,
        )

        lam0_k = lam0.astype(dtype) if lam0 is not None else None
        sign_l = (sign if L else jnp.zeros((0,), dtype))
        qacc, qfrc, lam = fused_solve_parts_single(
            M_hat, cd_lin, cd_ang, contacts.frame, rpos, w, sign_l,
            qfrc_smooth, aref, imp, activef, mu, lam0_k,
            K=K, L=L, ld_idx=tuple(int(i) for i in ld_idx),
            iterations=iterations, pyramidal=(cone == "pyramidal"),
            interpret=_FUSED_INTERPRET)
        return SolveResult(qacc=qacc, qfrc_constraint=qfrc, lam=lam)

    # ---- unified J: contact rows + materialized +-unit limit rows ----
    J = jnp.concatenate([Jc[:, 0], Jc[:, 1], Jc[:, 2]], axis=0)
    if L:
        E_lim = np.zeros((L, nv), np.float32)
        E_lim[np.arange(L), ld_idx] = 1.0
        J_lim = sign[:, None] * jnp.asarray(E_lim, dtype)
        J = jnp.concatenate([J, J_lim], axis=0)              # (n, nv)

    # ---- XLA fallback: explicit inverse + batched matmuls ------------
    # The limit rows ride the same two clean matmuls as the contact
    # rows: a blockwise build (contact matmuls + Minv gathers +
    # jnp.block) does fewer MACs, but jnp.block's concats cost ~2.5 ms
    # of pure layout copies at batch 4096 (round-3 trace).
    from deepmimic_mujoco_tpu.physics import linalg

    Minv = linalg.spd_inverse(M_hat)
    qacc_smooth = Minv @ qfrc_smooth
    if not iterations:  # constraints disabled (smooth-parity tests)
        z = jnp.zeros(J.shape[0], dtype)
        return SolveResult(qacc=qacc_smooth, qfrc_constraint=0 * qfrc_smooth,
                           lam=z)
    MinvJT = Minv @ J.T                                      # (nv, n)
    A = J @ MinvJT                                           # (n, n)
    b_vec = J @ qacc_smooth - aref
    diagA = jnp.clip(jnp.diagonal(A), 1e-8, None)
    R = (1.0 - imp) / imp * diagA
    Ahat = A + jnp.diag(R)
    inv_diag = 1.0 / jnp.clip(diagA + R, 1e-8, None)

    lam = _pgs_iterate(Ahat, b_vec, inv_diag, mu, activef,
                       K=K, L=L, iterations=iterations,
                       relaxation=relaxation, lam0=lam0,
                       pyramidal=(cone == "pyramidal"))

    # qfrc = J^T lam over the unified J (limit rows included)
    qfrc = J.T @ lam
    qacc = qacc_smooth + MinvJT @ lam
    return SolveResult(qacc=qacc, qfrc_constraint=qfrc, lam=lam)


_FUSED_INTERPRET = False  # tests: run the kernel in interpret mode


def _use_fused() -> bool:
    """Default TPU path: the fused mass-matrix + constraint-solve
    Pallas kernel (ops/fused_solve.py). DM_TPU_FUSED_SOLVE=0 falls
    back to the XLA chain (always used on CPU, where the two paths
    are parity-tested against each other — including end-to-end via
    the _FUSED_INTERPRET test hook)."""
    import os

    import jax

    if _FUSED_INTERPRET:
        return True
    return (os.environ.get("DM_TPU_FUSED_SOLVE") != "0"
            and jax.default_backend() in ("tpu", "axon"))


def _pgs_iterate(Ahat, b_vec, inv_diag, mu, activef, *, K, L,
                 iterations, relaxation, lam0=None, pyramidal=False):
    """Pure-XLA iteration (CPU tests, interpretability; the TPU default
    is the fused Pallas kernel dispatched in solve_constraints). An
    earlier standalone Pallas PGS kernel that took pre-built A as input
    measured SLOWER than this XLA loop on v5e (98-109k vs 200k env
    steps/s at batch 4096, round-2 bench): with A already materialized
    in HBM, the solve is bandwidth-bound either way and the kernel only
    added grid-program launch overhead. The win came from fusing the
    A-BUILD (and the mass-matrix solve) into the same kernel so A never
    exists in HBM at all — see ops/fused_solve.py."""
    dtype = Ahat.dtype
    if iterations == 0:  # constraints disabled (smooth-parity tests)
        return jnp.zeros(Ahat.shape[0], dtype)

    # barrier: stop XLA from sinking A's definition into the loop and
    # re-evaluating the whole upstream pipeline per sweep
    Ahat, b_vec, inv_diag, activef, mu = jax.lax.optimization_barrier(
        (Ahat, b_vec, inv_diag, activef, mu))

    # adaptive step: projected diagonal-scaled gradient converges for
    # step < 2/lambda_max(D^-1 A); with many coupled rows (G1: ~130)
    # lambda_max reaches 10-30 and any fixed relaxation diverges.
    # Estimate the spectral radius by power iteration on the active
    # sub-system and take a safe fraction of its inverse.
    def power(_, vec):
        w = inv_diag * (Ahat @ (vec * activef)) * activef
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)

    v0 = activef / jnp.maximum(jnp.linalg.norm(activef), 1e-12)
    ve = jax.lax.fori_loop(0, 12, power, v0)
    lam_max = jnp.maximum(jnp.linalg.norm(
        inv_diag * (Ahat @ (ve * activef)) * activef), 1.0)
    step = jnp.minimum(1.5 / lam_max, 1.0)

    def project(lam):
        n = jnp.maximum(lam[:K], 0.0)
        t1 = lam[K:2 * K]
        t2 = lam[2 * K:3 * K]
        lim = mu * n
        if pyramidal:
            # tangent-frame-aligned 4-edge pyramid (mujoco200 PGS cone;
            # reference solver=PGS, deepmimic_humanoid3d.xml:9): the
            # tangent cross-section is the L1 diamond |t1|+|t2| <=
            # mu*n. Euclidean projection onto it, per quadrant: points
            # over the edge move to the clamped edge segment.
            a1, a2 = jnp.abs(t1), jnp.abs(t2)
            x = jnp.clip((a1 - a2 + lim) * 0.5, 0.0, lim)
            over = a1 + a2 > lim
            p1 = jnp.where(over, x, a1)
            p2 = jnp.where(over, lim - x, a2)
            t1s, t2s = jnp.sign(t1) * p1, jnp.sign(t2) * p2
        else:
            tn = jnp.sqrt(t1 * t1 + t2 * t2 + 1e-24)
            scale = jnp.where(tn > lim, lim / tn, 1.0)
            t1s, t2s = t1 * scale, t2 * scale
        parts = [n, t1s, t2s]
        if L:
            parts.append(jnp.maximum(lam[3 * K:], 0.0))
        return jnp.concatenate(parts) * activef

    def sweep(_, lam):
        grad = Ahat @ lam + b_vec
        return project(lam - step * inv_diag * grad)

    init = (project(lam0.astype(dtype)) if lam0 is not None
            else jnp.zeros(Ahat.shape[0], dtype))
    return jax.lax.fori_loop(0, iterations, sweep, init)
