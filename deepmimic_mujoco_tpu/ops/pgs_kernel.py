"""Pallas TPU kernel: projected-Jacobi contact/limit solver.

The dual system A lam = -b with A = J M^-1 J^T + R stays resident in
VMEM for all solver iterations — a plain XLA loop re-streams A from HBM
every sweep (~160 MB/iteration at batch 4096), which dominated the
whole physics step.

Each grid program solves a BLOCK of envs (one-env programs serialize on
the TensorCore and are latency-bound; measured 3x slower than the XLA
loop). The iteration matvec is a sublane reduction
``grad_i = sum_k A[e,k,i] * lam[e,k]`` (A symmetric, so no transpose),
all VPU work on VMEM-resident data.

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

ENV_BLOCK = 8  # envs per grid program (A block: 8 x 128 x 128 f32 = 512 KB)


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


def _pgs_kernel(A_ref, b_ref, invd_ref, mu_ref, active_ref, lam_ref,
                *, K, L, n_pad, iterations, relaxation):
    A = A_ref[...]          # (E, n_pad, n_pad)
    b = b_ref[...]          # (E, n_pad)
    invd = invd_ref[...]
    mu = mu_ref[...]
    active = active_ref[...]

    def body(_, lam):
        grad = jnp.sum(A * lam[:, :, None], axis=1) + b
        return _project(lam - relaxation * invd * grad, mu, active,
                        K, L, n_pad)

    lam_ref[...] = jax.lax.fori_loop(0, iterations, body,
                                     jnp.zeros_like(b))


def _pgs_batched(A, b, inv_diag, mu, active, *, K, L, iterations,
                 relaxation, interpret=False):
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

    kernel = functools.partial(_pgs_kernel, K=K, L=L, n_pad=n_pad,
                               iterations=iterations,
                               relaxation=relaxation)
    lam = pl.pallas_call(
        kernel,
        grid=(B_pad // E,),
        in_specs=[
            pl.BlockSpec((E, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, n_pad), dtype),
        interpret=interpret,
    )(A_p, b_p, invd_p, mu_p, act_p)
    return lam[:B, :n]


@functools.lru_cache(maxsize=None)
def _make_pgs(K, L, iterations, relaxation):
    @jax.custom_batching.custom_vmap
    def pgs(A, b, inv_diag, mu, active):
        lam = _pgs_batched(A[None], b[None], inv_diag[None], mu[None],
                           active[None], K=K, L=L, iterations=iterations,
                           relaxation=relaxation)
        return lam[0]

    @pgs.def_vmap
    def _pgs_vmap(axis_size, in_batched, A, b, inv_diag, mu, active):
        assert all(in_batched), "pgs expects all operands batched"
        out = _pgs_batched(A, b, inv_diag, mu, active, K=K, L=L,
                           iterations=iterations, relaxation=relaxation)
        return out, True

    return pgs


def pgs_solve_single(A, b, inv_diag, mu, active, *, K: int, L: int,
                     iterations: int, relaxation: float):
    """One env's dual PGS solve; under vmap, dispatches to the blocked
    batch kernel via a custom batching rule."""
    fn = _make_pgs(K, L, iterations, float(relaxation))
    return fn(A, b, inv_diag, mu, active)
