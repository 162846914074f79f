import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from deepmimic_mujoco_tpu.utils import hostquat as hq


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def wxyz_to_xyzw(q):
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def test_mul_matches_scipy():
    a, b = rand_quats(64, 1), rand_quats(64, 2)
    got = hq.mul(a, b)
    want = (R.from_quat(wxyz_to_xyzw(a)) * R.from_quat(wxyz_to_xyzw(b))).as_quat()
    # compare up to sign
    got_x = wxyz_to_xyzw(got)
    sign = np.sign(np.sum(got_x * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_x * sign, want, atol=1e-12)


def test_rotate_matches_matrix():
    q = rand_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    np.testing.assert_allclose(
        hq.rotate(q, v),
        np.einsum("nij,nj->ni", R.from_quat(wxyz_to_xyzw(q)).as_matrix(), v),
        atol=1e-12,
    )


def test_mat_roundtrip():
    q = rand_quats(128, 5)
    m = hq.to_mat(q)
    np.testing.assert_allclose(m, R.from_quat(wxyz_to_xyzw(q)).as_matrix(), atol=1e-12)
    q2 = hq.from_mat(m)
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-10)


def test_to_rpy_matches_scipy_extrinsic_xyz():
    q = rand_quats(128, 6)
    rpy = hq.to_rpy(q)
    want = R.from_quat(wxyz_to_xyzw(q)).as_euler("xyz")  # extrinsic xyz == rpy
    np.testing.assert_allclose(rpy, want, atol=1e-10)


@pytest.mark.parametrize("order,scipy_seq", [("xyz", "XYZ"), ("yxz", "YXZ")])
def test_euler_intrinsic_roundtrip(order, scipy_seq):
    q = rand_quats(128, 7)
    e = hq.quat_to_euler_intrinsic(q, order)
    want = R.from_quat(wxyz_to_xyzw(q)).as_euler(scipy_seq)
    np.testing.assert_allclose(e, want, atol=1e-9)
    q2 = hq.euler_to_quat_intrinsic(e, order)
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-10)


def test_axis_angle_and_vel():
    axis = np.array([0.0, 0.0, 1.0])
    q0 = hq.from_axis_angle(axis, np.asarray(0.3))
    q1 = hq.from_axis_angle(axis, np.asarray(0.5))
    w = hq.vel_from_quats(q0, q1, 0.1)
    np.testing.assert_allclose(w, [0.0, 0.0, 2.0], atol=1e-10)


def test_integrate_local_frame():
    rng = np.random.default_rng(8)
    q = hq.normalize(rng.normal(size=(4,)))
    w = rng.normal(size=(3,))
    dt = 0.01
    q1 = hq.integrate(q, w, dt)
    # recover velocity by finite difference
    np.testing.assert_allclose(hq.vel_from_quats(q, q1, dt), w, atol=1e-8)


def test_integrate_matches_mujoco():
    mujoco = pytest.importorskip("mujoco")
    rng = np.random.default_rng(9)
    for _ in range(16):
        q = hq.normalize(rng.normal(size=(4,)))
        w = rng.normal(size=(3,)) * 3.0
        dt = 0.0166
        got = hq.integrate(q.copy(), w, dt)
        ref = q.copy()
        mujoco.mju_quatIntegrate(ref, w, dt)
        dot = abs(np.dot(got, ref))
        assert dot > 1.0 - 1e-10


def test_device_matches_host():
    from deepmimic_mujoco_tpu.utils import quat as dq
    import jax.numpy as jnp

    q = rand_quats(32, 10).astype(np.float32)
    v = np.random.default_rng(11).normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(dq.rotate(jnp.asarray(q), jnp.asarray(v))),
        hq.rotate(q, v), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dq.to_rpy(jnp.asarray(q))), hq.to_rpy(q), atol=1e-5)
