"""Parity: fused Pallas mass-matrix+constraint solve (interpret mode)
vs the XLA fallback chain in physics/solver.py.

The fused kernel is the default TPU path; any semantic drift between
it and the fallback changes contact dynamics under trained policies
(reference regression pattern: play_g1_run_polar_breeze.py:50), so the
two must agree to float noise on identical inputs. Runs the kernel in
interpret mode so the parity is pinned on CPU CI.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.ops.fused_solve import fused_solve_single
from deepmimic_mujoco_tpu.physics import linalg
from deepmimic_mujoco_tpu.physics.solver import _pgs_iterate


def _mk(seed, nv, K, L):
    n = 3 * K + L
    r = np.random.RandomState(seed)
    G = r.randn(nv, nv)
    M = G @ G.T + nv * np.eye(nv)
    J = r.randn(n, nv) * (r.rand(n, 1) < 0.8)
    qf = r.randn(nv) * 10
    aref = r.randn(n)
    imp = np.clip(r.rand(n), 0.05, 0.95)
    act_c = r.rand(K) < 0.5
    act_l = r.rand(L) < 0.3
    active = np.concatenate([act_c, act_c, act_c, act_l])
    mu = np.full(K, 1.0)
    return [np.asarray(x, np.float32)
            for x in (M, J, qf, aref, imp, active, mu)]


def _fallback(M, J, qf, aref, imp, active, mu, lam0, K, L, its,
              pyramidal=False):
    Minv = linalg.spd_inverse(M)
    qacc_s = Minv @ qf
    MinvJT = Minv @ J.T
    A = J @ MinvJT
    b = J @ qacc_s - aref
    diagA = jnp.clip(jnp.diagonal(A), 1e-8, None)
    R = (1.0 - imp) / imp * diagA
    Ahat = A + jnp.diag(R)
    invd = 1.0 / jnp.clip(diagA + R, 1e-8, None)
    lam = _pgs_iterate(Ahat, b, invd, mu, active, K=K, L=L,
                       iterations=its, relaxation=0.15, lam0=lam0,
                       pyramidal=pyramidal)
    return qacc_s + MinvJT @ lam, J.T @ lam, lam


def test_fused_pyramidal_matches_fallback():
    """The optional pyramidal (mujoco200-PGS) cone projection agrees
    between the fused kernel and the XLA fallback, and differs from the
    elliptic default (i.e. the option is live). Trajectory-level cone
    deviation is quantified in tools/diag_cone.py / ARCHITECTURE.md."""
    from deepmimic_mujoco_tpu.ops.fused_solve import (
        fused_solve_single as fss,
    )

    nv, K, L, its = 34, 16, 28, 30
    M, J, qf, aref, imp, active, mu = [
        jnp.asarray(x) for x in _mk(7, nv, K, L)]
    ref = _fallback(M, J, qf, aref, imp, active, mu, None, K, L, its,
                    pyramidal=True)
    got = fss(M, J, qf, aref, imp, active, mu, K=K, L=L,
              iterations=its, pyramidal=True, interpret=True)
    for name, a, b in zip(("qacc", "qfrc", "lam"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 2e-4, name
    ell = _fallback(M, J, qf, aref, imp, active, mu, None, K, L, its)
    assert np.abs(np.asarray(ell[2]) - np.asarray(ref[2])).max() > 1e-5


# humanoid3d dims at the production iteration count; G1 dims at a
# reduced count (interpret mode is ~3 s/sweep — the layout/slicing
# paths it guards are iteration-count independent)
@pytest.mark.parametrize("nv,K,L,its", [(34, 16, 28, 50),
                                        (43, 24, 37, 25)])
def test_fused_matches_fallback(nv, K, L, its):
    B = 4
    args = [jnp.asarray(np.stack(a))
            for a in zip(*[_mk(s, nv, K, L) for s in range(B)])]
    M, J, qf, aref, imp, active, mu = args

    ref = jax.vmap(lambda *a: _fallback(*a, None, K, L, its))(
        M, J, qf, aref, imp, active, mu)
    got = jax.vmap(lambda *a: fused_solve_single(
        *a, K=K, L=L, iterations=its, interpret=True))(
        M, J, qf, aref, imp, active, mu)

    for name, a, b in zip(("qacc", "qfrc", "lam"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 2e-4, name


def test_fused_warm_start_parity():
    nv, K, L, its = 34, 16, 28, 20
    M, J, qf, aref, imp, active, mu = [
        jnp.asarray(x) for x in _mk(3, nv, K, L)]
    lam0 = jnp.asarray(
        np.random.RandomState(9).randn(3 * K + L).astype(np.float32))

    ref = _fallback(M, J, qf, aref, imp, active, mu, lam0, K, L, its)
    got = fused_solve_single(M, J, qf, aref, imp, active, mu, lam0,
                             K=K, L=L, iterations=its, interpret=True)
    for name, a, b in zip(("qacc", "qfrc", "lam"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 2e-4, name


def test_fused_parts_matches_explicit_j():
    """The parts-based entry (J^T built inside the batch rule) must
    equal the explicit-J entry on the J assembled the solver way:
    rows [frame_r . (cd_lin + cd_ang x r) * w | sign * e_dof]."""
    from deepmimic_mujoco_tpu.ops.fused_solve import (
        fused_solve_parts_single,
    )

    nv, K, L, its = 34, 16, 28, 25
    B = 2
    r = np.random.RandomState(11)
    ld_idx = np.sort(r.choice(nv, L, replace=False))

    Ms, Js, parts = [], [], []
    for b in range(B):
        rb = np.random.RandomState(100 + b)
        G = rb.randn(nv, nv)
        M = (G @ G.T + nv * np.eye(nv)).astype(np.float32)
        cd_lin = rb.randn(nv, 3).astype(np.float32)
        cd_ang = rb.randn(nv, 3).astype(np.float32)
        frame = rb.randn(K, 3, 3).astype(np.float32)
        rpos = rb.randn(K, 3).astype(np.float32)
        w = (rb.rand(K, nv) < 0.5).astype(np.float32)
        sign = np.where(rb.rand(L) < 0.5, 1.0, -1.0).astype(np.float32)
        Jp = (cd_lin[None] + np.cross(np.broadcast_to(cd_ang[None], (K, nv, 3)),
                                      rpos[:, None, :])) * w[:, :, None]
        Jc = np.einsum("krd,knd->krn", frame, Jp)
        E_lim = np.zeros((L, nv), np.float32)
        E_lim[np.arange(L), ld_idx] = 1.0
        J = np.concatenate([Jc[:, 0], Jc[:, 1], Jc[:, 2],
                            sign[:, None] * E_lim], axis=0)
        Ms.append(M)
        Js.append(J)
        parts.append((cd_lin, cd_ang, frame, rpos, w, sign))

    _, J0, qf, aref, imp, active, mu = _mk(7, nv, K, L)
    stack = lambda i: jnp.asarray(np.stack([p[i] for p in parts]))
    M_b = jnp.asarray(np.stack(Ms))
    J_b = jnp.asarray(np.stack(Js))
    rep = lambda a: jnp.asarray(np.broadcast_to(a, (B,) + a.shape).copy())

    ref = jax.vmap(lambda M, J: fused_solve_single(
        M, J, jnp.asarray(qf), jnp.asarray(aref), jnp.asarray(imp),
        jnp.asarray(active), jnp.asarray(mu), K=K, L=L,
        iterations=its, interpret=True))(M_b, J_b)
    got = jax.vmap(lambda M, cl, ca, fr, rp, w_, sg, qf_, ar, im, ac, mu_:
                   fused_solve_parts_single(
                       M, cl, ca, fr, rp, w_, sg, qf_, ar, im, ac, mu_,
                       K=K, L=L, ld_idx=tuple(int(i) for i in ld_idx),
                       iterations=its, interpret=True))(
        M_b, stack(0), stack(1), stack(2), stack(3), stack(4), stack(5),
        rep(qf), rep(aref), rep(imp), rep(active), rep(mu))

    for name, a, b in zip(("qacc", "qfrc", "lam"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 2e-4, name


def test_env_step_kernel_vs_fallback_end_to_end():
    """Full DPEnv.step parity: fused kernel (interpret) vs XLA
    fallback on a REAL G1 contact state. Catches interface bugs
    between solver.py's parts extraction and the kernel (sign
    conventions, limit-row indexing) that synthetic-parts tests
    replicate by construction."""
    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.physics import solver

    env = DPEnv(motion="getup_facedown_slow_FSI", robot="unitree_g1",
                iterations=15)
    s, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    a = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                (env.action_size,), jnp.float32)

    def two_steps():
        s1, o1 = env.step(s, a)
        s2, o2 = env.step(s1, a)
        return s2.qpos, s2.qvel, o2.reward

    ref = jax.jit(two_steps)()
    solver._FUSED_INTERPRET = True
    try:
        got = jax.jit(two_steps)()
    finally:
        solver._FUSED_INTERPRET = False

    for name, x, y in zip(("qpos", "qvel", "reward"), ref, got):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1.0)
        assert np.abs(x - y).max() / scale < 5e-3, (
            f"{name}: max diff {np.abs(x - y).max():.2e}")
