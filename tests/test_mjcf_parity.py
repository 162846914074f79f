"""MJCF parser parity vs the MuJoCo model compiler (oracle, test-only)."""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from deepmimic_mujoco_tpu.models import assets, load_model


@pytest.fixture(scope="module", params=["humanoid3d", "unitree_g1"])
def pair(request):
    path = assets.xml_path(request.param)
    return load_model(path), mujoco.MjModel.from_xml_path(path), request.param


def test_sizes(pair):
    m, ref, _ = pair
    assert m.nq == ref.nq and m.nv == ref.nv
    assert m.nbody == ref.nbody and m.ngeom == ref.ngeom
    assert m.njnt == ref.njnt and m.nu == ref.nu


def test_options(pair):
    m, ref, _ = pair
    assert m.opt.timestep == pytest.approx(ref.opt.timestep)
    np.testing.assert_allclose(m.opt.gravity, ref.opt.gravity)
    assert m.opt.iterations == ref.opt.iterations


def test_tree_structure(pair):
    m, ref, _ = pair
    np.testing.assert_array_equal(m.body_parentid, ref.body_parentid)
    np.testing.assert_array_equal(m.body_rootid, ref.body_rootid)
    np.testing.assert_array_equal(m.body_jntnum, ref.body_jntnum)
    np.testing.assert_array_equal(m.body_dofadr[m.body_dofnum > 0],
                                  ref.body_dofadr[ref.body_dofnum > 0])
    np.testing.assert_array_equal(m.jnt_qposadr, ref.jnt_qposadr)
    np.testing.assert_array_equal(m.jnt_dofadr, ref.jnt_dofadr)
    np.testing.assert_array_equal(m.jnt_type, ref.jnt_type)
    np.testing.assert_array_equal(m.dof_parentid, ref.dof_parentid)


def test_body_frames(pair):
    m, ref, _ = pair
    np.testing.assert_allclose(m.body_pos, ref.body_pos, atol=1e-12)
    dot = np.abs(np.sum(m.body_quat * ref.body_quat, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_inertials(pair):
    m, ref, name = pair
    np.testing.assert_allclose(m.body_mass, ref.body_mass, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(m.body_ipos, ref.body_ipos, atol=1e-8)
    # compare full inertia tensors (iquat conventions may differ by
    # eigenvector ordering when moments are degenerate)
    from deepmimic_mujoco_tpu.utils import hostquat as hq
    for i in range(1, m.nbody):
        Rm = hq.to_mat(m.body_iquat[i])
        Rr = hq.to_mat(ref.body_iquat[i])
        Im = Rm @ np.diag(m.body_inertia[i]) @ Rm.T
        Ir = Rr @ np.diag(ref.body_inertia[i]) @ Rr.T
        np.testing.assert_allclose(Im, Ir, atol=1e-7,
                                   err_msg=f"body {m.body_names[i]}")


def test_joints_dofs(pair):
    m, ref, _ = pair
    np.testing.assert_allclose(m.jnt_axis, ref.jnt_axis, atol=1e-12)
    np.testing.assert_allclose(m.jnt_pos, ref.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(m.jnt_range, ref.jnt_range, atol=1e-12)
    np.testing.assert_allclose(m.dof_armature, ref.dof_armature, atol=1e-12)
    np.testing.assert_allclose(m.dof_damping, ref.dof_damping, atol=1e-12)
    np.testing.assert_allclose(m.dof_frictionloss, ref.dof_frictionloss, atol=1e-12)


def test_geoms(pair):
    m, ref, name = pair
    np.testing.assert_array_equal(m.geom_type, ref.geom_type)
    np.testing.assert_array_equal(m.geom_bodyid, ref.geom_bodyid)
    np.testing.assert_array_equal(m.geom_condim, ref.geom_condim)
    np.testing.assert_array_equal(m.geom_contype, ref.geom_contype)
    np.testing.assert_array_equal(m.geom_conaffinity, ref.geom_conaffinity)
    np.testing.assert_allclose(m.geom_friction, ref.geom_friction, atol=1e-12)
    np.testing.assert_allclose(m.geom_margin, ref.geom_margin, atol=1e-12)
    nonmesh = m.geom_type != 7
    np.testing.assert_allclose(m.geom_size[nonmesh], ref.geom_size[nonmesh],
                               atol=1e-12)
    if (~nonmesh).any():
        # principal frames may differ by a signed axis permutation
        # (eigenvector conventions); AABBs then permute. Compare sorted.
        np.testing.assert_allclose(np.sort(m.geom_size[~nonmesh], axis=1),
                                   np.sort(ref.geom_size[~nonmesh], axis=1),
                                   atol=2e-2)
        from deepmimic_mujoco_tpu.utils import hostquat as hq
        for g in np.where(~nonmesh)[0]:
            Rrel = hq.to_mat(m.geom_quat[g]).T @ hq.to_mat(ref.geom_quat[g])
            # near signed permutation: each row ~one +-1 entry
            assert np.allclose(np.abs(Rrel).max(1), 1.0, atol=5e-2), \
                f"geom {g} frame not a signed permutation of oracle"
    np.testing.assert_allclose(m.geom_pos[nonmesh], ref.geom_pos[nonmesh],
                               atol=1e-9)
    # mesh geom centroids: our volume integrals vs engine compiler
    mesh = ~nonmesh
    if mesh.any():
        np.testing.assert_allclose(m.geom_pos[mesh], ref.geom_pos[mesh],
                                   atol=2e-3)


def test_actuators(pair):
    m, ref, _ = pair
    np.testing.assert_array_equal(m.actuator_trnid, ref.actuator_trnid[:, 0])
    np.testing.assert_allclose(m.actuator_gear, ref.actuator_gear[:, 0], atol=1e-12)
    np.testing.assert_allclose(m.actuator_ctrlrange, ref.actuator_ctrlrange, atol=1e-12)


def test_names(pair):
    m, ref, _ = pair
    for i in range(m.nbody):
        assert m.body_names[i] == (mujoco.mj_id2name(ref, mujoco.mjtObj.mjOBJ_BODY, i) or m.body_names[i])
    for i in range(m.ngeom):
        rn = mujoco.mj_id2name(ref, mujoco.mjtObj.mjOBJ_GEOM, i)
        if rn is not None:
            assert m.geom_names[i] == rn


def test_collision_pairs_match_oracle(pair):
    """Our static pair list must cover every pair mujoco ever generates.

    Checked exactly via mujoco's own filtering logic re-evaluated per
    candidate; here we verify our list equals mujoco's broadphase-exempt
    static filter by brute force.
    """
    m, ref, _ = pair
    ours = set(zip(m.pair_geom1.tolist(), m.pair_geom2.tolist()))

    def mj_allowed(g1, g2):
        b1, b2 = ref.geom_bodyid[g1], ref.geom_bodyid[g2]
        if b1 == b2:
            return False
        w1, w2 = ref.body_weldid[b1], ref.body_weldid[b2]
        if w1 == w2:
            return False
        if not ((ref.geom_contype[g1] & ref.geom_conaffinity[g2])
                or (ref.geom_contype[g2] & ref.geom_conaffinity[g1])):
            return False
        # parent filter
        pw1 = ref.body_weldid[ref.body_parentid[w1]]
        pw2 = ref.body_weldid[ref.body_parentid[w2]]
        if w1 != 0 and w2 != 0 and (pw1 == w2 or pw2 == w1):
            return False
        # excludes
        sig = (min(b1, b2), max(b1, b2))
        for k in range(ref.nexclude):
            e1 = ref.exclude_signature[k] >> 16
            e2 = ref.exclude_signature[k] & 0xFFFF
            if (min(e1, e2), max(e1, e2)) == sig:
                return False
        if ref.geom_type[g1] == 0 and ref.geom_type[g2] == 0:
            return False
        return True

    want = set()
    for g1 in range(ref.ngeom):
        for g2 in range(g1 + 1, ref.ngeom):
            if mj_allowed(g1, g2):
                want.add((g1, g2))
    assert ours == want


def test_keyframe(pair):
    m, ref, name = pair
    if name == "unitree_g1":
        assert m.key_qpos is not None
        np.testing.assert_allclose(m.key_qpos[0], ref.key_qpos[0], atol=1e-12)
