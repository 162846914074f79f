"""Pallas PGS kernel vs the XLA fallback: bitwise-level parity.

The two paths must produce the same constraint forces — solver output
differences change contact dynamics and break trained policies (a
smaller perturbation moved the walk gate from 339 to 27). Runs the
kernel in interpreter mode so the parity contract is enforced on the
CPU CI mesh; on TPU the compiled kernel goes through the same HLO.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.ops import pgs_kernel
from deepmimic_mujoco_tpu.physics import solver


def _random_problem(key, K, L, n_active_c, n_active_l):
    n = 3 * K + L
    k1, k2, k3 = jax.random.split(key, 3)
    # SPD-ish A: G G^T + diag
    G = jax.random.normal(k1, (n, n), jnp.float32)
    A = G @ G.T / n + jnp.eye(n) * 0.5
    b = jax.random.normal(k2, (n,), jnp.float32)
    inv_diag = 1.0 / jnp.clip(jnp.diagonal(A), 1e-8, None)
    mu = jnp.full((K,), 0.9, jnp.float32)
    active_c = (jnp.arange(K) < n_active_c)
    active_l = (jnp.arange(L) < n_active_l)
    active = jnp.concatenate(
        [active_c, active_c, active_c, active_l]).astype(jnp.float32)
    lam0 = jnp.zeros((n,), jnp.float32)
    return A, b, inv_diag, mu, active, lam0


def _fallback(A, b, inv_diag, mu, active, lam0, K, L, iterations):
    return solver._pgs_iterate(A, b, inv_diag, mu, active, K=K, L=L,
                               iterations=iterations, relaxation=0.15,
                               lam0=lam0)


@pytest.mark.parametrize("K,L,nc,nl", [(8, 12, 3, 2), (24, 37, 11, 0),
                                       (16, 28, 0, 5)])
def test_kernel_matches_fallback(K, L, nc, nl):
    key = jax.random.PRNGKey(K * 100 + L)
    A, b, inv_diag, mu, active, lam0 = _random_problem(key, K, L, nc, nl)
    ref = _fallback(A, b, inv_diag, mu, active, lam0, K, L, 50)
    out = pgs_kernel.pgs_solve_single(
        A, b, inv_diag, mu, active, lam0, K=K, L=L, iterations=50,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_matches_fallback_batched():
    K, L = 8, 12
    B = 5   # deliberately not a multiple of ENV_BLOCK
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    probs = [_random_problem(k, K, L, i % (K + 1), (2 * i) % (L + 1))
             for i, k in enumerate(keys)]
    batch = [jnp.stack(x) for x in zip(*probs)]
    ref = jax.vmap(lambda A, b, d, m, a, l: _fallback(
        A, b, d, m, a, l, K, L, 50))(*batch)
    out = jax.vmap(lambda A, b, d, m, a, l: pgs_kernel.pgs_solve_single(
        A, b, d, m, a, l, K=K, L=L, iterations=50, interpret=True))(*batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_kernel_warm_start_parity():
    K, L = 8, 12
    key = jax.random.PRNGKey(3)
    A, b, inv_diag, mu, active, _ = _random_problem(key, K, L, 4, 3)
    lam0 = jax.random.normal(jax.random.PRNGKey(9), b.shape, jnp.float32)
    ref = _fallback(A, b, inv_diag, mu, active, lam0, K, L, 50)
    out = pgs_kernel.pgs_solve_single(
        A, b, inv_diag, mu, active, lam0, K=K, L=L, iterations=50,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
