"""Mocap pipeline tests: formats, alignment, FK parity (checkpoint A).

The flagship check mirrors the reference's kinematic parity test
(src/deepmimic_env.py:540-559): replaying the walk clip, the clip's
precomputed hand geom heights must match live FK — here validated
against the independent oracle engine, which is stronger than the
reference's self-consistency check.
"""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from deepmimic_mujoco_tpu.mocap import load_clip
from deepmimic_mujoco_tpu.models import assets, load_model


@pytest.fixture(scope="module")
def humanoid():
    return load_model(assets.xml_path("humanoid3d"))


@pytest.fixture(scope="module")
def g1():
    return load_model(assets.xml_path("unitree_g1"))


@pytest.fixture(scope="module")
def walk(humanoid):
    return load_clip(assets.mocap_path("humanoid3d", "walk"), humanoid)


def test_walk_clip_basic(walk):
    assert walk.loop == "wrap"
    assert walk.dt == pytest.approx(0.01666)
    assert walk.qpos.shape[1] == 35
    assert len(walk) > 30
    # interpolation doubled the frame count (raw dt 0.0333)
    assert walk.qvel.shape == (len(walk), 34)
    # first-frame velocity is zero by construction
    np.testing.assert_allclose(walk.qvel[0], 0.0, atol=1e-8)


def test_walk_poses_physical(walk):
    # upright root (z between 0.6 and 1.1 through the gait)
    assert walk.qpos[:, 2].min() > 0.6 and walk.qpos[:, 2].max() < 1.1
    # quats stay normalized-ish after lerp
    n = np.linalg.norm(walk.qpos[:, 3:7], axis=1)
    assert n.min() > 0.95 and n.max() < 1.05


def test_walk_hand_xpos_mocap(humanoid, walk):
    """Checkpoint A: clip FK precompute matches oracle FK per frame."""
    ref = mujoco.MjModel.from_xml_path(assets.xml_path("humanoid3d"))
    d = mujoco.MjData(ref)
    hand = humanoid.geom_name2id("left_wrist")
    for i in range(0, len(walk), 7):
        d.qpos[:] = walk.qpos[i]
        mujoco.mj_forward(ref, d)
        # even indices are original frames (exact FK); odd indices are
        # lerped frames where stored xpos is lerped rather than re-FK'd
        # (reference semantics, src/mujoco/mocap_v2.py:330-331)
        atol = 5e-6 if i % 2 == 0 else 5e-3
        np.testing.assert_allclose(walk.geom_xpos[i][hand],
                                   d.geom_xpos[hand], atol=atol)
        np.testing.assert_allclose(walk.body_xpos[i], d.xpos, atol=atol)


def test_joint_limits_mostly_respected(humanoid, walk):
    """The singularity fix keeps ball-joint eulers inside the hardcoded
    box; overall joint-limit violation should be rare on walk."""
    lo = humanoid.jnt_range[1:, 0]
    hi = humanoid.jnt_range[1:, 1]
    q = walk.qpos[:, 7:]
    frac = np.mean((q < lo - 0.05) | (q > hi + 0.05))
    assert frac < 0.05


def test_euler_reconstruction_error(humanoid):
    """Quat->euler->quat roundtrip on a dynamic clip stays small for
    most frames (the singularity fix trades error for continuity)."""
    from deepmimic_mujoco_tpu.mocap import align_rotation
    from deepmimic_mujoco_tpu.utils import hostquat as hq
    import json

    path = assets.mocap_path("humanoid3d", "walk")
    clip = load_clip(path, humanoid)
    raw = np.asarray(json.load(open(path))["Frames"])
    # chest quat (DP slot 0, cols 8:12) vs converted euler (qpos 7:10)
    T0 = len(raw)
    for k in range(0, T0, 5):
        q_target = align_rotation(raw[k, 8:12])
        # clip frames are interpolated 2x: frame k maps to 2k
        e = clip.qpos[2 * k, 7:10] if 2 * k < len(clip) else None
        if e is None:
            continue
        q_back = hq.euler_to_quat_intrinsic(e, "xyz")
        err = min(np.linalg.norm(q_back - q_target),
                  np.linalg.norm(q_back + q_target))
        assert err < 0.05, f"frame {k} chest euler error {err}"


def test_all_humanoid_clips_load(humanoid):
    import glob
    import os

    root = os.path.join(assets.asset_root(), "motions")
    clips = sorted(glob.glob(os.path.join(root, "humanoid3d_*.txt")))
    assert len(clips) == 15
    # backflip (dt=0.0625) and spin (dt=0.0417) are not integer
    # multiples of the sim dt; the reference's loader raises on them
    # too (src/mujoco/mocap_v2.py:315-316)
    non_integer_dt = {"humanoid3d_backflip.txt", "humanoid3d_spin.txt"}
    for path in clips:
        if os.path.basename(path) in non_integer_dt:
            with pytest.raises(ValueError):
                load_clip(path, humanoid)
            continue
        clip = load_clip(path, humanoid)
        assert len(clip) > 10
        assert np.isfinite(clip.qpos).all() and np.isfinite(clip.qvel).all()


def test_g1_direct_qpos_clips_load(g1):
    for motion in ["walk", "run", "getup_facedown_slow_FSI"]:
        clip = load_clip(assets.mocap_path("unitree_g1", motion), g1)
        assert clip.qpos.shape[1] == 44
        assert np.isfinite(clip.qpos).all()
        # G1 clips are already at sim dt
        assert clip.dt == pytest.approx(0.01666, rel=0.1)


def test_qvel_root_angular_convention(humanoid, walk):
    """Finite-difference root angular velocity integrates back to the
    next frame's quaternion (local-frame convention)."""
    from deepmimic_mujoco_tpu.utils import hostquat as hq
    for k in range(1, 40, 7):
        q0 = walk.qpos[k - 1, 3:7] / np.linalg.norm(walk.qpos[k - 1, 3:7])
        q1 = walk.qpos[k, 3:7] / np.linalg.norm(walk.qpos[k, 3:7])
        w = walk.qvel[k, 3:6]
        q1_pred = hq.integrate(q0, w, walk.dt)
        # lerped frames make the FD inexact (~1 deg); the check only
        # needs to reject the wrong (world-frame) convention, which
        # errs by tens of degrees
        assert abs(np.dot(q1_pred, q1)) > 1 - 1e-4
