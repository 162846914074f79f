"""Env-in-lanes position stage: batched FK + com quantities.

The per-env ``fwd_kinematics``/``com_pos`` (physics/kinematics.py) are
written body-major: under ``vmap`` every intermediate is (B, L, 3) or
(B, L, 4) — the trailing 3/4 lands in the TPU lane dimension and tiles
to (8, 128) blocks that are >95% padding, with layout copies between
almost every op. The round-4 stage profile attributes 7.6 ms of the
21.1 ms G1 step at batch 4096 to fk+com alone — the same
VPU-layout-bound shape the round-3 solve kernel fixed
(ops/fused_solve.py).

This module recomputes the SAME formulas with the env axis LAST
(lanes): every vector/quaternion is component-separated arrays of
shape (rows, B), so all math is dense lane-parallel VPU work, tree
gathers are constant one-hot matmuls on the MXU (HIGHEST precision —
one nonzero per row makes them exact), and only the final outputs are
transposed back to the env-major ``Kin``/``Com`` layout the rest of
the engine consumes (a few layout copies instead of hundreds).

Dispatch follows ops/fused_solve.py: a ``custom_vmap`` single-env
function runs the original per-env path unbatched and the lanes batch
under ``vmap``, so ``Engine.position_stage`` is layout-transparent.

Reference being replaced: the position/com stages inside mujoco200's
``sim.step``/``sim.forward`` (reference: src/deepmimic_env.py:362,489).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import FREE, PhysicsModel
from deepmimic_mujoco_tpu.physics.kinematics import (
    Com, Kin, com_pos, fwd_kinematics, tree_tables,
)
from deepmimic_mujoco_tpu.physics.tree import (
    LINK_FREE, LINK_HINGE,
)

_HI = jax.lax.Precision.HIGHEST


class V3L(NamedTuple):
    """Lanes 3-vector: x/y/z as (rows, B) arrays (consts may be
    (rows, 1) and broadcast)."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(s, o):
        return V3L(s.x + o.x, s.y + o.y, s.z + o.z)

    def __sub__(s, o):
        return V3L(s.x - o.x, s.y - o.y, s.z - o.z)

    def scale(s, a):
        return V3L(s.x * a, s.y * a, s.z * a)

    def cross(s, o):
        return V3L(s.y * o.z - s.z * o.y,
                   s.z * o.x - s.x * o.z,
                   s.x * o.y - s.y * o.x)


class Q4L(NamedTuple):
    """Lanes quaternion (wxyz): components as (rows, B) arrays."""
    w: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def _qmul(a: Q4L, b: Q4L) -> Q4L:
    # exact transcription of quat_core.mul (Hamilton, wxyz)
    return Q4L(
        a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
        a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
        a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
        a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w)


def _qrot(q: Q4L, v: V3L) -> V3L:
    # quat_core.rotate: t = 2 qv x v; v + w t + qv x t
    qv = V3L(q.x, q.y, q.z)
    t = qv.cross(v).scale(2.0)
    return v + t.scale(q.w) + qv.cross(t)


def _qnorm(q: Q4L, eps=1e-12) -> Q4L:
    n = jnp.sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z)
    inv = 1.0 / jnp.maximum(n, eps)
    return Q4L(q.w * inv, q.x * inv, q.y * inv, q.z * inv)


def _tomat(q: Q4L) -> Tuple[jnp.ndarray, ...]:
    """Rotation matrix entries (r00..r22), quat_core.to_mat formulas."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, 1e-12)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return (1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy))


def _oh(idx, n_src) -> np.ndarray:
    """Constant one-hot gather matrix (len(idx), n_src)."""
    idx = np.asarray(idx, np.int64)
    M = np.zeros((len(idx), n_src), np.float32)
    M[np.arange(len(idx)), idx] = 1.0
    return M


def _gat(M: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    # one nonzero (=1.0) per row -> exact at HIGHEST precision
    return jnp.matmul(jnp.asarray(M, x.dtype), x, precision=_HI)


def _gat3(M, v: V3L) -> V3L:
    return V3L(_gat(M, v.x), _gat(M, v.y), _gat(M, v.z))


def _gat4(M, q: Q4L) -> Q4L:
    return Q4L(_gat(M, q.w), _gat(M, q.x), _gat(M, q.y), _gat(M, q.z))


def _cv3(a, dtype) -> V3L:
    """(n, 3) host constants -> V3L of (n, 1) device constants."""
    a = np.asarray(a, np.float64)
    c = lambda j: jnp.asarray(a[:, j:j + 1].astype(np.float32), dtype)
    return V3L(c(0), c(1), c(2))


def _cq4(a, dtype) -> Q4L:
    a = np.asarray(a, np.float64)
    c = lambda j: jnp.asarray(a[:, j:j + 1].astype(np.float32), dtype)
    return Q4L(c(0), c(1), c(2), c(3))


def _vcat(vs) -> V3L:
    if len(vs) == 1:
        return vs[0]
    return V3L(jnp.concatenate([v.x for v in vs]),
               jnp.concatenate([v.y for v in vs]),
               jnp.concatenate([v.z for v in vs]))


def _qcat(qs) -> Q4L:
    if len(qs) == 1:
        return qs[0]
    return Q4L(jnp.concatenate([q.w for q in qs]),
               jnp.concatenate([q.x for q in qs]),
               jnp.concatenate([q.y for q in qs]),
               jnp.concatenate([q.z for q in qs]))


def _env3(v: V3L) -> jnp.ndarray:
    """V3L of (n, B) -> (B, n, 3)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1).transpose(1, 0, 2)


def _env_mat(rows: Tuple[jnp.ndarray, ...], n: int) -> jnp.ndarray:
    """9 entries of (n, B) -> (B, n, 3, 3)."""
    m = jnp.stack(rows, axis=-1).transpose(1, 0, 2)
    return m.reshape(m.shape[0], n, 3, 3)


class _LanesKin(NamedTuple):
    xpos: V3L
    xquat: Q4L
    xipos: V3L
    ximat: tuple
    xanchor: V3L
    xaxis: V3L
    geom_xpos: V3L
    geom_xmat: tuple
    site_xpos: V3L
    site_xmat: tuple


def _fk_lanes(m: PhysicsModel, t, qT: jnp.ndarray) -> _LanesKin:
    """qT: (nq, B). Level loop mirrors kinematics.fwd_kinematics."""
    dtype = qT.dtype
    B = qT.shape[-1]
    one = jnp.ones((1, B), dtype)
    zero = jnp.zeros((1, B), dtype)
    pos_rows = [V3L(zero, zero, zero)]
    quat_rows = [Q4L(one, zero, zero, zero)]
    anchor_rows = [V3L(zero, zero, zero)]
    axis_rows = [V3L(zero, zero, zero)]
    n_done = 1

    for grp in t.groups:
        pos_all = _vcat(pos_rows)
        quat_all = _qcat(quat_rows)
        Mp = _oh(grp.parent_slot + 1, n_done)
        p_pos = _gat3(Mp, pos_all)
        p_quat = _gat4(Mp, quat_all)
        off_p = _cv3(grp.offset_pos, dtype)
        off_q = _cq4(grp.offset_quat, dtype)
        pre_pos = p_pos + _qrot(p_quat, off_p)
        pre_quat = _qmul(p_quat, off_q)

        if grp.link_type == LINK_FREE:
            r = [_gat(_oh(grp.qpos_adr + k, m.nq), qT) for k in range(7)]
            new_pos = V3L(r[0], r[1], r[2])
            new_quat = _qnorm(Q4L(r[3], r[4], r[5], r[6]))
            anchor = new_pos
            axis = _cv3(grp.jnt_axis, dtype)
            L = len(grp.parent_slot)
            axis = V3L(*(jnp.broadcast_to(c, (L, B)) for c in axis))
        elif grp.link_type == LINK_HINGE:
            angle = _gat(_oh(grp.qpos_adr, m.nq), qT)     # (L, B)
            # normalized constant axis (from_axis_angle normalizes)
            ax = np.asarray(grp.jnt_axis, np.float64)
            ax = ax / np.maximum(
                np.sqrt((ax * ax).sum(-1, keepdims=True)), 1e-12)
            axis_l = _cv3(ax, dtype)
            jpos_l = _cv3(grp.jnt_pos, dtype)
            half = angle * 0.5
            sh = jnp.sin(half)
            qj = Q4L(jnp.cos(half), axis_l.x * sh, axis_l.y * sh,
                     axis_l.z * sh)
            anchor = pre_pos + _qrot(pre_quat, jpos_l)
            new_quat = _qmul(pre_quat, qj)
            new_pos = anchor - _qrot(new_quat, jpos_l)
            axis = _qrot(new_quat, axis_l)
        else:  # fixed
            new_pos, new_quat = pre_pos, pre_quat
            anchor = new_pos
            axis = _cv3(grp.jnt_axis, dtype)
            L = len(grp.parent_slot)
            axis = V3L(*(jnp.broadcast_to(c, (L, B)) for c in axis))

        pos_rows.append(new_pos)
        quat_rows.append(new_quat)
        anchor_rows.append(anchor)
        axis_rows.append(axis)
        n_done += len(grp.parent_slot)

    pos_all = _vcat(pos_rows)
    quat_all = _qcat(quat_rows)
    anchor_all = _vcat(anchor_rows)
    axis_all = _vcat(axis_rows)

    Mb = _oh(t.body_slot + 1, n_done)
    Mj = _oh(t.jnt_slot + 1, n_done)
    xpos = _gat3(Mb, pos_all)
    xquat = _gat4(Mb, quat_all)
    xanchor = _gat3(Mj, anchor_all)
    xaxis = _gat3(Mj, axis_all)

    xipos = xpos + _qrot(xquat, _cv3(m.body_ipos, dtype))
    ximat = _tomat(_qmul(xquat, _cq4(m.body_iquat, dtype)))

    Mg = _oh(m.geom_bodyid, m.nbody)
    g_pos = _gat3(Mg, xpos)
    g_quat = _gat4(Mg, xquat)
    geom_xpos = g_pos + _qrot(g_quat, _cv3(m.geom_pos, dtype))
    geom_xmat = _tomat(_qmul(g_quat, _cq4(m.geom_quat, dtype)))

    if m.nsite:
        Ms = _oh(m.site_bodyid, m.nbody)
        s_pos = _gat3(Ms, xpos)
        s_quat = _gat4(Ms, xquat)
        site_xpos = s_pos + _qrot(s_quat, _cv3(m.site_pos, dtype))
        site_xmat = _tomat(_qmul(s_quat, _cq4(m.site_quat, dtype)))
    else:
        e = jnp.zeros((0, B), dtype)
        site_xpos = V3L(e, e, e)
        site_xmat = tuple(e for _ in range(9))

    return _LanesKin(xpos=xpos, xquat=xquat, xipos=xipos, ximat=ximat,
                     xanchor=xanchor, xaxis=xaxis,
                     geom_xpos=geom_xpos, geom_xmat=geom_xmat,
                     site_xpos=site_xpos, site_xmat=site_xmat)


def _com_lanes(m: PhysicsModel, t, lk: _LanesKin):
    """Lanes transcription of kinematics.com_pos. Returns
    (subtree_com V3L, cinert 36-tuple of (nbody, B), cdof 6-tuple of
    (nv, B) in [angular; linear] order)."""
    dtype = lk.xpos.x.dtype
    mass = np.asarray(m.body_mass, np.float64)
    D = np.asarray(t.descendants, np.float64)
    Dm = (D * mass[None, :]).astype(np.float32)
    sub_mass = np.maximum(D @ mass, 1e-12)
    inv_sm = jnp.asarray((1.0 / sub_mass)[:, None].astype(np.float32),
                         dtype)
    mm = lambda x: jnp.matmul(jnp.asarray(Dm, dtype), x, precision=_HI)
    subtree_com = V3L(mm(lk.xipos.x) * inv_sm, mm(lk.xipos.y) * inv_sm,
                      mm(lk.xipos.z) * inv_sm)

    Mr = _oh(m.body_rootid, m.nbody)
    anchor = _gat3(Mr, subtree_com)

    # world-aligned rotational inertia about the body com: R diag R^T
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = lk.ximat
    di = np.asarray(m.body_inertia, np.float64)
    d0 = jnp.asarray(di[:, 0:1].astype(np.float32), dtype)
    d1 = jnp.asarray(di[:, 1:2].astype(np.float32), dtype)
    d2 = jnp.asarray(di[:, 2:3].astype(np.float32), dtype)
    I00 = r00 * d0 * r00 + r01 * d1 * r01 + r02 * d2 * r02
    I01 = r00 * d0 * r10 + r01 * d1 * r11 + r02 * d2 * r12
    I02 = r00 * d0 * r20 + r01 * d1 * r21 + r02 * d2 * r22
    I11 = r10 * d0 * r10 + r11 * d1 * r11 + r12 * d2 * r12
    I12 = r10 * d0 * r20 + r11 * d1 * r21 + r12 * d2 * r22
    I22 = r20 * d0 * r20 + r21 * d1 * r21 + r22 * d2 * r22

    mc = jnp.asarray(mass[:, None].astype(np.float32), dtype)
    r = lk.xipos - anchor
    rx, ry, rz = r.x, r.y, r.z
    r2 = rx * rx + ry * ry + rz * rz
    B = rx.shape[-1]
    zz = jnp.zeros((m.nbody, B), dtype)
    # spatial.inertia_matrix: TL = I_com - m (rx rx) = I + m(r^2 I - rr^T)
    TL = (I00 + mc * (r2 - rx * rx), I01 - mc * rx * ry,
          I02 - mc * rx * rz,
          I01 - mc * rx * ry, I11 + mc * (r2 - ry * ry),
          I12 - mc * ry * rz,
          I02 - mc * rx * rz, I12 - mc * ry * rz,
          I22 + mc * (r2 - rz * rz))
    # TR = m skew(r); BL = -m skew(r); BR = m I
    s01, s02, s10 = -mc * rz, mc * ry, mc * rz
    s12, s20, s21 = -mc * rx, -mc * ry, mc * rx
    s01 = jnp.broadcast_to(s01, (m.nbody, B))
    TR = (zz, s01, jnp.broadcast_to(s02, (m.nbody, B)),
          jnp.broadcast_to(s10, (m.nbody, B)), zz,
          jnp.broadcast_to(s12, (m.nbody, B)),
          jnp.broadcast_to(s20, (m.nbody, B)),
          jnp.broadcast_to(s21, (m.nbody, B)), zz)
    BL = tuple(zz if i in (0, 4, 8) else -TR[i] for i in range(9))
    mrow = jnp.broadcast_to(mc, (m.nbody, B))
    BR = (mrow, zz, zz, zz, mrow, zz, zz, zz, mrow)
    # row-major 6x6: rows 0-2 = [TL row | TR row], rows 3-5 = [BL | BR]
    cin = []
    for i in range(3):
        cin.extend(TL[3 * i:3 * i + 3])
        cin.extend(TR[3 * i:3 * i + 3])
    for i in range(3):
        cin.extend(BL[3 * i:3 * i + 3])
        cin.extend(BR[3 * i:3 * i + 3])
    cinert = tuple(cin)

    # ---- cdof ---------------------------------------------------------
    ang_blocks, lin_blocks = [], []
    hinge_jids = [j for j in range(m.njnt) if m.jnt_type[j] != FREE]
    free_jids = [j for j in range(m.njnt) if m.jnt_type[j] == FREE]
    assert free_jids in ([], [0]), "free joint must be the root joint"
    if free_jids:
        b = int(m.jnt_bodyid[0])
        Mb1 = _oh([b], m.nbody)
        o = _gat3(Mb1, anchor)                      # (1, B)
        bp = _gat3(Mb1, lk.xpos)
        bq = _gat4(Mb1, lk.xquat)
        # translations: angular 0, linear e_k
        e = jnp.zeros((3, B), dtype)
        ang_blocks.append(V3L(e, e, e))
        eye = np.eye(3, dtype=np.float32)
        lin_blocks.append(V3L(
            jnp.broadcast_to(jnp.asarray(eye[:, 0:1], dtype), (3, B)),
            jnp.broadcast_to(jnp.asarray(eye[:, 1:2], dtype), (3, B)),
            jnp.broadcast_to(jnp.asarray(eye[:, 2:3], dtype), (3, B))))
        # rotations: u_k = R[:, k] (body axis k in world)
        R = _tomat(bq)                              # entries (1, B)
        u = V3L(jnp.concatenate([R[0], R[1], R[2]]),
                jnp.concatenate([R[3], R[4], R[5]]),
                jnp.concatenate([R[6], R[7], R[8]]))   # (3, B)
        dvec = o - bp                               # (1, B) broadcasts
        lin = u.cross(V3L(jnp.broadcast_to(dvec.x, (3, B)),
                          jnp.broadcast_to(dvec.y, (3, B)),
                          jnp.broadcast_to(dvec.z, (3, B))))
        ang_blocks.append(u)
        lin_blocks.append(lin)
    if hinge_jids:
        hj = np.asarray(hinge_jids)
        Mh = _oh(hj, m.njnt)
        u = _gat3(Mh, lk.xaxis)
        a = _gat3(Mh, lk.xanchor)
        Mo = _oh(np.asarray(m.jnt_bodyid)[hj], m.nbody)
        o = _gat3(Mo, anchor)
        ang_blocks.append(u)
        lin_blocks.append(u.cross(o - a))
    cdof_ang = _vcat(ang_blocks)
    cdof_lin = _vcat(lin_blocks)
    return subtree_com, cinert, (cdof_ang, cdof_lin)


def _position_batch(m: PhysicsModel, qpos_b: jnp.ndarray):
    """(B, nq) -> env-major (Kin, Com), computed in lanes layout."""
    t = tree_tables(m)
    qT = qpos_b.T
    lk = _fk_lanes(m, t, qT)
    subtree_com, cinert, (cdof_ang, cdof_lin) = _com_lanes(m, t, lk)

    B = qpos_b.shape[0]
    kin = Kin(
        xpos=_env3(lk.xpos), xquat=jnp.stack(
            [lk.xquat.w, lk.xquat.x, lk.xquat.y, lk.xquat.z],
            axis=-1).transpose(1, 0, 2),
        xipos=_env3(lk.xipos), ximat=_env_mat(lk.ximat, m.nbody),
        xanchor=_env3(lk.xanchor), xaxis=_env3(lk.xaxis),
        geom_xpos=_env3(lk.geom_xpos),
        geom_xmat=_env_mat(lk.geom_xmat, m.ngeom),
        site_xpos=(_env3(lk.site_xpos) if m.nsite
                   else jnp.zeros((B, 0, 3), qpos_b.dtype)),
        site_xmat=(_env_mat(lk.site_xmat, m.nsite) if m.nsite
                   else jnp.zeros((B, 0, 3, 3), qpos_b.dtype)))
    cin = jnp.stack(cinert, axis=-1).transpose(1, 0, 2)
    com = Com(
        subtree_com=_env3(subtree_com),
        cinert=cin.reshape(B, m.nbody, 6, 6),
        cdof=jnp.stack([cdof_ang.x, cdof_ang.y, cdof_ang.z,
                        cdof_lin.x, cdof_lin.y, cdof_lin.z],
                       axis=-1).transpose(1, 0, 2))
    return kin, com


def make_position_fn(m: PhysicsModel):
    """custom_vmap position stage: original per-env path unbatched,
    lanes batch under vmap (cf. ops/fused_solve.py dispatch)."""

    @jax.custom_batching.custom_vmap
    def position_single(qpos):
        kin = fwd_kinematics(m, qpos)
        com = com_pos(m, kin)
        return kin, com

    @position_single.def_vmap
    def _position_vmap(axis_size, in_batched, qpos):
        if not in_batched[0]:
            qpos = jnp.broadcast_to(qpos, (axis_size,) + qpos.shape)
        out = _position_batch(m, qpos)
        return out, jax.tree.map(lambda _: True, out)

    return position_single
