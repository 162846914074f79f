"""Pallas TPU kernel: projected-Jacobi contact/limit solver.

The dual system A lam = -b with A = J M^-1 J^T + R stays resident in
VMEM for all solver iterations — a plain XLA loop re-streams A from HBM
every sweep (~160 MB/iteration at batch 4096), which dominated the
whole physics step.

Each grid program solves a BLOCK of envs (one-env programs serialize on
the TensorCore and are latency-bound). The iteration matvec is a
sublane reduction ``grad_i = sum_k A[e,k,i] * lam[e,k]`` (A symmetric,
so no transpose), all VPU work on VMEM-resident data.

Semantics are EXACTLY the XLA fallback in physics/solver.py
(_pgs_iterate): projected diagonal-scaled gradient with an in-kernel
power-iteration estimate of lambda_max(D^-1 A) choosing the step size.
Any divergence between the two paths changes contact dynamics and
breaks trained policies (observed: walk gate 339 -> 27 from a smaller
solver perturbation), so parity here is a hard requirement, enforced
by tests/test_pgs_kernel.py against the fallback.

Exposed as a single-env function with a ``custom_vmap`` rule, so the
per-env physics code stays vmap-style while batched calls dispatch to
the blocked kernel. Row layout is segment-major: [normals(K) |
tangent1(K) | tangent2(K) | limits(L) | pad].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# envs per grid program. A block costs E x 128 x 128 f32 = E/16 MB of
# VMEM; larger blocks amortize per-program launch + DMA overhead (the
# dominant cost at E=16: 256 programs for a 4096-env batch).
ENV_BLOCK = int(os.environ.get("DM_TPU_PGS_BLOCK", "64"))
POWER_ITERS = 12  # matches physics/solver.py:_pgs_iterate


def _round_up(x, m):
    return -(-x // m) * m


def _project(lam, mu, active, K, L, n_pad):
    n = jnp.maximum(lam[:, 0:K], 0.0)
    t1 = lam[:, K:2 * K]
    t2 = lam[:, 2 * K:3 * K]
    tn = jnp.sqrt(t1 * t1 + t2 * t2 + 1e-24)
    lim = mu[:, :K] * n
    scale = jnp.where(tn > lim, lim / tn, 1.0)
    parts = [n, t1 * scale, t2 * scale]
    if L:
        parts.append(jnp.maximum(lam[:, 3 * K:3 * K + L], 0.0))
    pad = n_pad - 3 * K - L
    if pad:
        parts.append(jnp.zeros((lam.shape[0], pad), lam.dtype))
    return jnp.concatenate(parts, axis=1) * active


def _pgs_kernel(A_ref, b_ref, invd_ref, mu_ref, active_ref, lam0_ref,
                lam_ref, *, K, L, n_pad, iterations):
    A = A_ref[...]          # (E, n_pad, n_pad)
    b = b_ref[...]          # (E, n_pad)
    invd = invd_ref[...]
    mu = mu_ref[...]
    active = active_ref[...]

    def matvec(v):          # (E, n_pad) -> (E, n_pad); A symmetric
        # sublane reduction; the lane-axis variant (A * v[:, None, :]
        # summed over axis 2) lowers pathologically in Mosaic (>15 min
        # for a bench the sublane form finishes in 2)
        return jnp.sum(A * v[:, :, None], axis=1)

    # ---- power iteration for the largest eigenvalue of D^-1 A on the
    # active sub-system (mirrors solver.py exactly) -------------------
    def pw(_, vec):
        w = invd * matvec(vec * active) * active
        nrm = jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True))
        return w / jnp.maximum(nrm, 1e-12)

    v0 = active / jnp.maximum(
        jnp.sqrt(jnp.sum(active * active, axis=1, keepdims=True)), 1e-12)
    ve = jax.lax.fori_loop(0, POWER_ITERS, pw, v0)
    w = invd * matvec(ve * active) * active
    lam_max = jnp.maximum(
        jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True)), 1.0)
    step = jnp.minimum(1.5 / lam_max, 1.0)   # (E, 1)

    def body(_, lam):
        grad = matvec(lam) + b
        return _project(lam - step * invd * grad, mu, active, K, L, n_pad)

    init = _project(lam0_ref[...], mu, active, K, L, n_pad)
    lam_ref[...] = jax.lax.fori_loop(0, iterations, body, init)


def _pgs_batched(A, b, inv_diag, mu, active, lam0, *, K, L, iterations,
                 interpret=False):
    B, n, _ = A.shape
    n_pad = _round_up(n, 128)
    K_pad = _round_up(K, 128)
    E = ENV_BLOCK
    B_pad = _round_up(B, E)
    dtype = A.dtype

    A_p = jnp.pad(A, ((0, B_pad - B), (0, n_pad - n), (0, n_pad - n)))
    pad2 = lambda x, t: jnp.pad(x, ((0, B_pad - B), (0, t - x.shape[1])))
    b_p = pad2(b, n_pad)
    invd_p = pad2(inv_diag, n_pad)
    mu_p = pad2(mu, K_pad)
    act_p = pad2(active.astype(dtype), n_pad)
    lam0_p = pad2(lam0, n_pad)

    kernel = functools.partial(_pgs_kernel, K=K, L=L, n_pad=n_pad,
                               iterations=iterations)
    vec_spec = pl.BlockSpec((E, n_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    lam = pl.pallas_call(
        kernel,
        grid=(B_pad // E,),
        in_specs=[
            pl.BlockSpec((E, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
            vec_spec,
            pl.BlockSpec((E, K_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
            vec_spec,
        ],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, n_pad), dtype),
        interpret=interpret,
    )(A_p, b_p, invd_p, mu_p, act_p, lam0_p)
    return lam[:B, :n]


@functools.lru_cache(maxsize=None)
def _make_pgs(K, L, iterations, interpret=False):
    @jax.custom_batching.custom_vmap
    def pgs(A, b, inv_diag, mu, active, lam0):
        lam = _pgs_batched(A[None], b[None], inv_diag[None], mu[None],
                           active[None], lam0[None], K=K, L=L,
                           iterations=iterations, interpret=interpret)
        return lam[0]

    @pgs.def_vmap
    def _pgs_vmap(axis_size, in_batched, A, b, inv_diag, mu, active, lam0):
        # operands that are env-independent (e.g. a zeros lam0, or a
        # constant-folded friction vector) arrive unbatched — broadcast
        ops = [jnp.broadcast_to(x, (axis_size,) + x.shape) if not bt
               else x
               for x, bt in zip((A, b, inv_diag, mu, active, lam0),
                                in_batched)]
        out = _pgs_batched(*ops, K=K, L=L, iterations=iterations,
                           interpret=interpret)
        return out, True

    return pgs


def pgs_solve_single(A, b, inv_diag, mu, active, lam0=None, *, K: int,
                     L: int, iterations: int, interpret: bool = False):
    """One env's dual PGS solve; under vmap, dispatches to the blocked
    batch kernel via a custom batching rule. Semantics identical to the
    XLA fallback in physics/solver.py."""
    if lam0 is None:
        lam0 = jnp.zeros_like(b)
    fn = _make_pgs(K, L, iterations, interpret)
    return fn(A, b, inv_diag, mu, active, lam0)
