"""Pallas TPU kernel: fused mass-matrix solve + constraint solver.

Replaces the whole XLA chain  ``spd_inverse(M) -> qacc_smooth ->
A = J M^-1 J^T + R -> projected-gradient solve -> qacc/qfrc`` with ONE
kernel whose intermediates never leave VMEM. At batch 4096 the XLA
chain costs ~10.8 ms/step on v5e (round-3 stage profile): the unrolled
Cholesky/inverse alone streams (B, nv, nv) through HBM ~40 times, the
A-build round-trips (B, n, nv) matmuls, and every solver sweep
re-reads A. Per env the entire working set is ~50 KB, so a block of
envs fits VMEM easily and the whole solve is VPU-bound instead of
HBM-bound.

Layout: env-in-lanes. Each grid program takes an E-env block with env
as the LAST (lane) axis — M as (nv, nv, E), J^T as (nv, n, E), vectors
as (rows, E). All per-env linear algebra becomes broadcast VPU ops
over the lane axis; reductions run over sublanes or the leading axis,
never over lanes (Mosaic lowers lane reductions poorly).

In-kernel pipeline (fp32):
  1. Cholesky  M = L L^T       (right-looking outer-product form,
                                unrolled over the static nv)
  2. W = L^-1 J^T              (forward substitution, outer-product
                                form: O(nv) 3D vector ops)
  3. qacc_smooth = M^-1 qfrc   (two triangular vector solves)
  4. diag(A) = sum_k W_k^2, R = (1-imp)/imp diag, b = J qacc_s - aref
  5. power iteration for step = min(1.5/lambda_max(D^-1 Ahat), 1)
  6. ``iterations`` projected diagonal-scaled-gradient sweeps with the
     elliptic friction-cone projection; A is never materialized —
     Ahat @ lam = W^T (W lam) + R lam at the same cost as a direct
     matvec (W is half of A's rows) with none of the n^2 nv build.
  7. qacc = qacc_smooth + L^-T (W lam), qfrc = J^T lam.

Numerics vs the XLA fallback (physics/solver.py): steps 1-3 use exact
triangular solves where the fallback forms an explicit inverse with a
Newton-Schulz refine, and the matvecs run fp32 on the VPU where XLA
dispatches bf16 MXU matmuls — agreement is tested to ~1e-3 relative
(tests/test_fused_solve.py), tighter than the fallback's own bf16
noise floor. Solver SEMANTICS (step-size rule, projection, iteration
count, warm start) mirror _pgs_iterate exactly.

Reference being replaced: the PGS solve inside mujoco200's
``sim.step`` (50 iterations, src/mujoco/.../deepmimic_humanoid3d.xml:9),
invoked at src/deepmimic_env.py:362.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POWER_ITERS = 12  # matches physics/solver.py:_pgs_iterate
# Mosaic requires the lane (env) block dim to be a multiple of 128; one
# 128-env block per grid program keeps the G1-sized working set
# (~11 MB: JT + in-place W + M + L + vectors, fp32) inside v5e VMEM.
ENV_BLOCK = 128


def _round_up(x, m):
    return -(-x // m) * m


def _fused_kernel(M_ref, JT_ref, qf_ref, aref_ref, imp_ref, act_ref,
                  mu_ref, lam0_ref, qacc_ref, qfrc_ref, lam_ref,
                  *scratch, nv, nv_p, n_p, K, L, iterations,
                  manual_dma, pyramidal=False):
    f32 = jnp.float32
    E = qf_ref.shape[-1]

    if manual_dma:
        # ---- 0. manual DMA of the two matrix operands ---------------
        # M and J^T stay in HBM (memory_space=ANY) and are copied into
        # SINGLE-buffered VMEM scratch here: the default pipelined
        # double-buffering of a (nv_p, n_p, E) block costs 2x its
        # VMEM, which overflows the 16 MB budget at G1 dims (nv=43,
        # n=109, E=128). Compute per program (~60 us) dwarfs the ~5 us
        # copy, so losing DMA/compute overlap is cheap — but small
        # models (humanoid3d) fit double-buffered and keep the overlap
        # (+5% end-to-end), so this path is size-gated (_needs_dma).
        m_vmem, jt_vmem, dma_sems = scratch
        i = pl.program_id(0)
        cp_m = pltpu.make_async_copy(
            M_ref.at[:, :, pl.ds(i * E, E)], m_vmem, dma_sems.at[0])
        cp_j = pltpu.make_async_copy(
            JT_ref.at[:, :, pl.ds(i * E, E)], jt_vmem, dma_sems.at[1])
        cp_m.start()
        cp_j.start()
        cp_m.wait()
        cp_j.wait()
    else:
        m_vmem, jt_vmem = M_ref, JT_ref

    # ---- 1. Cholesky, right-looking ---------------------------------
    # Padded diagonal entries arrive as 1.0 (set host-side), so the
    # loop runs uniformly over nv_p.
    A = m_vmem[...]                                  # (nv_p, nv_p, E)
    Lmat = jnp.zeros_like(A)
    inv_Ld = jnp.zeros((nv_p, E), f32)               # rows = 1/L[k,k]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nv_p, E), 0)
    for j in range(nv_p):
        inv_d = jax.lax.rsqrt(jnp.maximum(A[j, j, :], 1e-12))   # (E,)
        col = A[:, j, :] * inv_d[None, :]            # (nv_p, E)
        col = jnp.where(row_iota >= j, col, 0.0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (nv_p, 1), 0) == j
                  ).astype(f32)                      # (nv_p, 1)
        # masked add column write (dynamic_update_slice is not
        # implemented in the Mosaic TPU lowering)
        Lmat = Lmat + col[:, None, :] * onehot[None, :, :]
        inv_Ld = inv_Ld + onehot * inv_d[None, :]
        A = A - col[:, None, :] * col[None, :, :]

    # ---- 2. W = L^-1 J^T (forward substitution, outer form) ---------
    # ONE rank-1 FMA per column: with u = W[k] (pre-update),
    # W' = W - c (x) u where c[k] = 1 - 1/L[kk] (scales row k to its
    # final value rk = u/L[kk]) and c[i>k] = L[i,k]/L[kk] (subtracts
    # L[i,k]*rk). Folding the row-k write into the same update kills
    # two of the three full-(nv_p, n_p, E) passes the masked
    # select-and-subtract form cost per column (VPU-bound kernel).
    W = jt_vmem[...]                                 # (nv_p, n_p, E)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nv_p, 1), 0)
    for k in range(nv):
        u = W[k]                                     # (n_p, E)
        is_k = (row_ids == k).astype(f32)
        gt_k = (row_ids > k).astype(f32)
        c = (is_k * (1.0 - inv_Ld[k][None, :])
             + gt_k * Lmat[:, k, :] * inv_Ld[k][None, :])   # (nv_p, E)
        W = W - c[:, None, :] * u[None, :, :]

    # ---- 3. qacc_smooth = M^-1 qfrc (two triangular solves) ---------
    def fwd_solve(rhs):                              # L y = rhs
        res, y = rhs, jnp.zeros_like(rhs)
        for k in range(nv):
            yk = res[k] * inv_Ld[k]                  # (E,)
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (nv_p, 1), 0) == k).astype(f32)
            y = y + onehot * yk[None, :]
            res = res - Lmat[:, k, :] * yk[None, :]
        return y

    def bwd_solve(rhs):                              # L^T z = rhs
        res, z = rhs, jnp.zeros_like(rhs)
        for k in reversed(range(nv)):
            zk = res[k] * inv_Ld[k]
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (nv_p, 1), 0) == k).astype(f32)
            z = z + onehot * zk[None, :]
            res = res - Lmat[k, :, :] * zk[None, :]
        return z

    qf = qf_ref[...]                                 # (nv_p, E)
    y = fwd_solve(qf)                                # L^-1 qfrc
    qacc_smooth = bwd_solve(y)

    # ---- 4. diag(A), R, b -------------------------------------------
    # J is never re-read after W's init: J qacc_smooth = W^T (L^T
    # M^-1 qf) = W^T y, and J^T lam = L (W lam) — keeping the JT value
    # out of the kernel stack is what fits the G1-sized block (nv=43,
    # n=109, E=128) under the 16 MB VMEM limit.
    imp = imp_ref[...]                               # (n_p, E)
    active = act_ref[...]
    aref = aref_ref[...]
    mu = mu_ref[...]                                 # (K_p, E)
    diagA = jnp.clip(jnp.sum(W * W, axis=0), 1e-8, None)     # (n_p, E)
    R = (1.0 - imp) / imp * diagA
    inv_diag = 1.0 / jnp.clip(diagA + R, 1e-8, None)
    b = jnp.sum(W * y[:, None, :], axis=0) - aref    # (n_p, E)

    def matvec(v):                                   # Ahat @ v
        u = jnp.sum(W * v[None, :, :], axis=1)       # (nv_p, E) = W v
        return jnp.sum(W * u[:, None, :], axis=0) + R * v

    # ---- 5. power iteration (mirrors solver.py exactly) -------------
    def pw(_, vec):
        w = inv_diag * matvec(vec * active) * active
        nrm = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return w / jnp.maximum(nrm, 1e-12)

    v0 = active / jnp.maximum(
        jnp.sqrt(jnp.sum(active * active, axis=0, keepdims=True)), 1e-12)
    ve = jax.lax.fori_loop(0, POWER_ITERS, pw, v0)
    w = inv_diag * matvec(ve * active) * active
    lam_max = jnp.maximum(
        jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True)), 1.0)
    step = jnp.minimum(1.5 / lam_max, 1.0)           # (1, E)

    # ---- 6. projected sweeps ----------------------------------------
    def project(lam):
        nrm = jnp.maximum(lam[0:K], 0.0)             # (K, E)
        t1 = lam[K:2 * K]
        t2 = lam[2 * K:3 * K]
        lim = mu[:K] * nrm
        if pyramidal:
            # tangent-aligned 4-edge pyramid (mujoco200 PGS): L1
            # diamond |t1|+|t2| <= mu*n, Euclidean projection
            # (elementwise only — keep Mosaic-lowerable)
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
        rest = jnp.maximum(lam[3 * K:], 0.0)         # limits + pad
        return jnp.concatenate(
            [nrm, t1s, t2s, rest], axis=0) * active

    def sweep(_, lam):
        grad = matvec(lam) + b
        return project(lam - step * inv_diag * grad)

    lam = jax.lax.fori_loop(0, iterations, sweep, project(lam0_ref[...]))

    # ---- 7. outputs --------------------------------------------------
    t = jnp.sum(W * lam[None, :, :], axis=1)         # (nv_p, E) = W lam
    qacc_ref[...] = qacc_smooth + bwd_solve(t)
    # J^T lam = L (W lam) = L t (see step 4 note)
    qfrc_ref[...] = jnp.sum(Lmat * t[None, :, :], axis=1)
    lam_ref[...] = lam


def _solve_lanes(M_lanes, JT_lanes, qf, aref, imp, active, mu, lam0,
                 *, nv, n, K, L, iterations, pyramidal=False,
                 interpret=False):
    """Core pallas dispatch over env-in-lanes operands.

    M_lanes (nv_p, nv_p, B_pad) with unit padded diagonal, JT_lanes
    (nv_p, n_p, B_pad); vectors env-major (B, rows). Returns
    (qacc (B, nv), qfrc (B, nv), lam (B, n))."""
    B = qf.shape[0]
    f32 = M_lanes.dtype
    nv_p = _round_up(nv, 8)
    n_p = _round_up(n, 8)
    K_p = _round_up(K, 8)
    E = ENV_BLOCK
    B_pad = _round_up(B, E)

    pad2 = lambda x, t: jnp.pad(x, ((0, B_pad - B), (0, t - x.shape[1])))
    to_lanes2 = lambda x: x.T                        # (B, r) -> (r, B)
    args = (
        M_lanes,
        JT_lanes,
        to_lanes2(pad2(qf, nv_p)),
        to_lanes2(pad2(aref, n_p)),
        to_lanes2(jnp.clip(pad2(imp, n_p), 1e-5, 1 - 1e-5)),
        to_lanes2(pad2(active.astype(f32), n_p)),
        to_lanes2(pad2(mu, K_p)),
        to_lanes2(pad2(lam0, n_p)),
    )

    # VMEM plan: pipelined (double-buffered) matrix inputs when they
    # fit — DMA/compute overlap is worth ~5% — else single-buffered
    # manual DMA (see _fused_kernel step 0)
    mat_elems = nv_p * nv_p + nv_p * n_p
    est = 4 * E * (2 * mat_elems            # pipelined input buffers
                   + 2 * mat_elems          # A+L / W + loop transient
                   + 12 * n_p + 8 * nv_p)
    manual_dma = est > 13 * 1024 * 1024
    kernel = functools.partial(
        _fused_kernel, nv=nv, nv_p=nv_p, n_p=n_p, K=K, L=L,
        iterations=iterations, manual_dma=manual_dma,
        pyramidal=pyramidal)
    vec_spec = lambda r: pl.BlockSpec((r, E), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    if manual_dma:
        mat_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch = [
            pltpu.VMEM((nv_p, nv_p, E), f32),
            pltpu.VMEM((nv_p, n_p, E), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        mat_specs = [
            pl.BlockSpec((nv_p, nv_p, E), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv_p, n_p, E), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        scratch = []
    qacc, qfrc, lam = pl.pallas_call(
        kernel,
        grid=(B_pad // E,),
        in_specs=mat_specs + [
            vec_spec(nv_p), vec_spec(n_p), vec_spec(n_p), vec_spec(n_p),
            vec_spec(K_p), vec_spec(n_p),
        ],
        out_specs=[vec_spec(nv_p), vec_spec(nv_p), vec_spec(n_p)],
        out_shape=[
            jax.ShapeDtypeStruct((nv_p, B_pad), f32),
            jax.ShapeDtypeStruct((nv_p, B_pad), f32),
            jax.ShapeDtypeStruct((n_p, B_pad), f32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    return (qacc[:nv, :B].T, qfrc[:nv, :B].T, lam[:n, :B].T)


def _m_to_lanes(M, nv, nv_p, B_pad):
    f32 = M.dtype
    B = M.shape[0]
    eye_pad = jnp.concatenate(
        [jnp.zeros((nv,), f32), jnp.ones((nv_p - nv,), f32)])
    M_p = jnp.pad(M, ((0, B_pad - B), (0, nv_p - nv), (0, nv_p - nv)))
    M_p = M_p + jnp.diag(eye_pad)[None]              # unit padded diag
    return jnp.transpose(M_p, (1, 2, 0))             # (nv_p, nv_p, B)


def _fused_batched(M, J, qf, aref, imp, active, mu, lam0, *, K, L,
                   iterations, pyramidal=False, interpret=False):
    """Batched entry from an explicit per-env J (B, n, nv)."""
    B, n, nv = J.shape
    nv_p = _round_up(nv, 8)
    n_p = _round_up(n, 8)
    B_pad = _round_up(B, ENV_BLOCK)
    JT_p = jnp.pad(J, ((0, B_pad - B), (0, n_p - n), (0, nv_p - nv)))
    return _solve_lanes(
        _m_to_lanes(M, nv, nv_p, B_pad), jnp.transpose(JT_p, (2, 1, 0)),
        qf, aref, imp, active, mu, lam0,
        nv=nv, n=n, K=K, L=L, iterations=iterations,
        pyramidal=pyramidal, interpret=interpret)


def _fused_batched_parts(M, cd_lin, cd_ang, frame, rpos, w, sign_l, qf,
                         aref, imp, active, mu, lam0, *, K, L, ld_idx,
                         iterations, pyramidal=False, interpret=False):
    """Batched entry that BUILDS J^T directly in the kernel's
    env-in-lanes layout from contact-Jacobian parts — the per-env
    (B, n, nv) J, its concat with limit rows, and the 3D transpose
    never exist in HBM (~0.9 ms/step at batch 4096 in the J-based
    path: einsum + layout copies).

    Row r of contact c: J[rK+c, :] = frame[c,r,:] . (cd_lin[n] +
    cd_ang[n] x rpos[c]) * w[c,n]; using a.(b x c) = b.(c x a), the
    angular term contracts through G[c,r,:] = rpos[c] x frame[c,r,:],
    so the whole build is two einsums emitted straight into
    (nv, 3K, B) plus the static one-hot limit block scaled by sign."""
    B, nv, _ = cd_lin.shape
    n = 3 * K + L
    f32 = cd_lin.dtype
    nv_p = _round_up(nv, 8)
    n_p = _round_up(n, 8)
    B_pad = _round_up(B, ENV_BLOCK)

    G = jnp.cross(rpos[:, :, None, :], frame)        # (B, K, 3, 3)
    JT_c = (jnp.einsum("bcrd,bnd,bcn->nrcb", frame, cd_lin, w)
            + jnp.einsum("bcri,bni,bcn->nrcb", G, cd_ang, w))
    JT_c = JT_c.reshape(nv, 3 * K, B)
    parts = [JT_c]
    if L:
        E_lim = np.zeros((nv, L), np.float32)
        E_lim[np.asarray(ld_idx), np.arange(L)] = 1.0
        parts.append(jnp.asarray(E_lim, f32)[:, :, None]
                     * sign_l.T[None, :, :])         # (nv, L, B)
    JT = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    JT = jnp.pad(JT, ((0, nv_p - nv), (0, n_p - n), (0, B_pad - B)))
    return _solve_lanes(
        _m_to_lanes(M, nv, nv_p, B_pad), JT,
        qf, aref, imp, active, mu, lam0,
        nv=nv, n=n, K=K, L=L, iterations=iterations,
        pyramidal=pyramidal, interpret=interpret)


@functools.lru_cache(maxsize=None)
def _make_fused_parts(K, L, ld_idx, iterations, pyramidal=False,
                      interpret=False):
    @jax.custom_batching.custom_vmap
    def fused(M, cd_lin, cd_ang, frame, rpos, w, sign_l, qf, aref, imp,
              active, mu, lam0):
        out = _fused_batched_parts(
            *[x[None] for x in (M, cd_lin, cd_ang, frame, rpos, w,
                                sign_l, qf, aref, imp, active, mu,
                                lam0)],
            K=K, L=L, ld_idx=ld_idx, iterations=iterations,
            pyramidal=pyramidal, interpret=interpret)
        return tuple(o[0] for o in out)

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, *ops):
        ops = [x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
               for x, bt in zip(ops, in_batched)]
        out = _fused_batched_parts(*ops, K=K, L=L, ld_idx=ld_idx,
                                   iterations=iterations,
                                   pyramidal=pyramidal,
                                   interpret=interpret)
        return out, (True, True, True)

    return fused


def fused_solve_parts_single(M, cd_lin, cd_ang, frame, rpos, w, sign_l,
                             qf_smooth, aref, imp, active, mu,
                             lam0=None, *, K: int, L: int,
                             ld_idx: tuple, iterations: int,
                             pyramidal: bool = False,
                             interpret: bool = False):
    """Fused solve fed by contact-Jacobian PARTS (per-env J is never
    materialized); under vmap the J^T build lands directly in the
    kernel's env-in-lanes layout. ``ld_idx`` is the static tuple of
    limited dof indices (the limit rows' +-e_dof columns)."""
    if lam0 is None:
        lam0 = jnp.zeros_like(aref)
    fn = _make_fused_parts(K, L, tuple(ld_idx), iterations, pyramidal,
                           interpret)
    return fn(M, cd_lin, cd_ang, frame, rpos, w, sign_l, qf_smooth,
              aref, imp, active, mu, lam0)


@functools.lru_cache(maxsize=None)
def _make_fused(K, L, iterations, pyramidal=False, interpret=False):
    @jax.custom_batching.custom_vmap
    def fused(M, J, qf, aref, imp, active, mu, lam0):
        qacc, qfrc, lam = _fused_batched(
            M[None], J[None], qf[None], aref[None], imp[None],
            active[None], mu[None], lam0[None], K=K, L=L,
            iterations=iterations, pyramidal=pyramidal,
            interpret=interpret)
        return qacc[0], qfrc[0], lam[0]

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, *ops):
        ops = [x if bt else jnp.broadcast_to(x, (axis_size,) + x.shape)
               for x, bt in zip(ops, in_batched)]
        out = _fused_batched(*ops, K=K, L=L, iterations=iterations,
                             pyramidal=pyramidal, interpret=interpret)
        return out, (True, True, True)

    return fused


def fused_solve_single(M, J, qf_smooth, aref, imp, active, mu,
                       lam0=None, *, K: int, L: int, iterations: int,
                       pyramidal: bool = False,
                       interpret: bool = False):
    """One env's fused mass-matrix + constraint solve; under vmap,
    dispatches to the blocked batch kernel. Returns
    (qacc, qfrc_constraint, lam) with the same solver semantics as
    physics/solver.py's fallback path."""
    if lam0 is None:
        lam0 = jnp.zeros_like(aref)
    fn = _make_fused(K, L, iterations, pyramidal, interpret)
    return fn(M, J, qf_smooth, aref, imp, active, mu, lam0)
