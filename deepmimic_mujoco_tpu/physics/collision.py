"""Collision detection: static pair tables -> fixed-size contact set.

TPU-first design: the candidate pair list is enumerated at model-build
time (reference engine does broadphase per step; with <100 bodies the
static table is cheaper and keeps all shapes compile-time constant).
Narrow-phase runs vectorized per pair-type group, producing a
fixed-slot contact buffer; the solver consumes the top-K deepest slots
(all active contacts are kept whenever #active <= K).

Replaces the native engine collision pipeline the reference invokes
inside ``sim.step`` (reference: src/deepmimic_env.py:362, engine
options ``nconmax=200`` at deepmimic_unitree_g1.xml:10). Mesh geoms
collide via their hull-vertex sets against planes (near-exact) and via
PCA capsule proxies against everything else.

Supported exactly: plane-{sphere, capsule, box, mesh}, sphere-sphere,
sphere-capsule, capsule-capsule, sphere-box (point-box), capsule-box
(segment-box), box-box (corner sampling, 4 deepest). Cylinders collide
as capsules of equal radius/half-length (slightly conservative caps).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import (
    BOX, CAPSULE, CYLINDER, MESH, PLANE, SPHERE, PhysicsModel,
)
from deepmimic_mujoco_tpu.physics.kinematics import Kin

_BIG = 1e4  # "far away" distance for empty slots


class Contacts(NamedTuple):
    """Fixed-size contact buffer (single env; vmap for batches)."""
    dist: jnp.ndarray      # (ncon,) signed distance (<0 = penetration)
    pos: jnp.ndarray       # (ncon, 3) world contact point
    frame: jnp.ndarray     # (ncon, 3, 3) rows: normal, tangent1, tangent2
    geom1: jnp.ndarray     # (ncon,) int32 (static per slot)
    geom2: jnp.ndarray     # (ncon,) int32
    includemargin: jnp.ndarray  # (ncon,) margin for activation
    friction: jnp.ndarray  # (ncon, 3)
    solref: jnp.ndarray    # (ncon, 2)
    solimp: jnp.ndarray    # (ncon, 5)
    condim: jnp.ndarray    # (ncon,) int32 (static per slot)


class _PairTables(NamedTuple):
    """Host-side static slot tables (one row per contact SLOT)."""
    kind: np.ndarray       # narrow-phase group id
    g1: np.ndarray
    g2: np.ndarray
    sub: np.ndarray        # slot index within the pair (0..3)
    margin: np.ndarray
    friction: np.ndarray   # (n, 3)
    solref: np.ndarray
    solimp: np.ndarray
    condim: np.ndarray


# narrow-phase group ids
K_PLANE_SPHERE, K_PLANE_CAPSULE, K_PLANE_BOX, K_PLANE_MESH = 0, 1, 2, 3
K_SPHERE_SPHERE, K_SPHERE_CAPSULE, K_CAPSULE_CAPSULE = 4, 5, 6
K_SPHERE_BOX, K_CAPSULE_BOX, K_BOX_BOX = 7, 8, 9

_SLOTS = {K_PLANE_SPHERE: 1, K_PLANE_CAPSULE: 2, K_PLANE_BOX: 4,
          K_PLANE_MESH: 4, K_SPHERE_SPHERE: 1, K_SPHERE_CAPSULE: 1,
          K_CAPSULE_CAPSULE: 1, K_SPHERE_BOX: 1, K_CAPSULE_BOX: 1,
          K_BOX_BOX: 4}


def _as_capsule_kind(t: int) -> int:
    """Effective type for narrow-phase dispatch."""
    if t == CYLINDER:
        return CAPSULE
    return t


def build_pair_tables(m: PhysicsModel) -> _PairTables:
    """Classify candidate pairs into narrow-phase groups + slots."""
    rows = {k: [] for k in _PairTables._fields}

    def emit(kind, g1, g2, nslot):
        a, b = m.geom_type[g1], m.geom_type[g2]
        margin = max(m.geom_margin[g1], m.geom_margin[g2])
        friction = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
        solref = (m.geom_solref[g1] + m.geom_solref[g2]) / 2.0
        solimp = (m.geom_solimp[g1] + m.geom_solimp[g2]) / 2.0
        condim = max(m.geom_condim[g1], m.geom_condim[g2])
        for s in range(nslot):
            rows["kind"].append(kind)
            rows["g1"].append(g1)
            rows["g2"].append(g2)
            rows["sub"].append(s)
            rows["margin"].append(margin)
            rows["friction"].append(friction)
            rows["solref"].append(solref)
            rows["solimp"].append(solimp)
            rows["condim"].append(condim)

    for g1, g2 in zip(m.pair_geom1, m.pair_geom2):
        t1 = _as_capsule_kind(int(m.geom_type[g1]))
        t2 = _as_capsule_kind(int(m.geom_type[g2]))
        # order: plane first, then by type value
        if t2 == PLANE or (t1 != PLANE and t1 > t2):
            g1, g2, t1, t2 = g2, g1, t2, t1
        key = (t1, t2)
        if t1 == PLANE:
            kind = {SPHERE: K_PLANE_SPHERE, CAPSULE: K_PLANE_CAPSULE,
                    BOX: K_PLANE_BOX, MESH: K_PLANE_MESH}.get(t2)
        else:
            kind = {(SPHERE, SPHERE): K_SPHERE_SPHERE,
                    (SPHERE, CAPSULE): K_SPHERE_CAPSULE,
                    (CAPSULE, CAPSULE): K_CAPSULE_CAPSULE,
                    (SPHERE, BOX): K_SPHERE_BOX,
                    (CAPSULE, BOX): K_CAPSULE_BOX,
                    (BOX, BOX): K_BOX_BOX,
                    # mesh pairs via capsule proxies
                    (SPHERE, MESH): K_SPHERE_CAPSULE,
                    (CAPSULE, MESH): K_CAPSULE_CAPSULE,
                    (BOX, MESH): K_CAPSULE_BOX,
                    (MESH, MESH): K_CAPSULE_CAPSULE,
                    }.get(key)
            if key == (BOX, MESH):
                g1, g2 = g2, g1  # capsule(proxy) first, box second
        if kind is None:
            continue  # unsupported combination: skip (logged at build)
        emit(kind, int(g1), int(g2), _SLOTS[kind])

    return _PairTables(**{k: np.asarray(v) for k, v in rows.items()})


# ---------------- geometry helpers (jnp, batched over slots) ----------

def _mesh_capsule_world(m, gids, kin: Kin):
    """World-frame (p0, p1, radius) proxy capsule segment for geoms that
    may be meshes; falls back to the geom's own size for primitives."""
    pos = kin.geom_xpos[gids]
    mat = kin.geom_xmat[gids]
    half = []
    rad = []
    off = []
    qax = []
    for g in np.asarray(gids):
        mid = int(m.geom_meshid[g])
        if mid >= 0:
            mesh = m.meshes[mid]
            rad.append(mesh.capsule_size[0])
            half.append(mesh.capsule_size[1])
            off.append(mesh.capsule_pos)
            from deepmimic_mujoco_tpu.utils import hostquat as hq
            qax.append(hq.to_mat(mesh.capsule_quat)[:, 2])
        else:
            rad.append(m.geom_size[g][0])
            half.append(m.geom_size[g][1])
            off.append(np.zeros(3))
            qax.append(np.array([0.0, 0.0, 1.0]))
    rad = jnp.asarray(np.array(rad), pos.dtype)
    half = jnp.asarray(np.array(half), pos.dtype)
    off = jnp.asarray(np.array(off), pos.dtype)
    qax = jnp.asarray(np.array(qax), pos.dtype)
    center = pos + jnp.einsum("nij,nj->ni", mat, off)
    axis = jnp.einsum("nij,nj->ni", mat, qax)
    p0 = center - axis * half[:, None]
    p1 = center + axis * half[:, None]
    return p0, p1, rad


def _make_frame(n):
    """Orthonormal frame rows (n, t1, t2) from normals n (..., 3)."""
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.99,
                    jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
                    jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape))
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_frame(kin, g1):
    """Plane normal (world z of geom frame) and a point on the plane."""
    n = kin.geom_xmat[g1][..., :, 2]
    p = kin.geom_xpos[g1]
    return n, p


def _seg_seg_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1], [p2,q2] (batched)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, (b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (b * s + f) / jnp.maximum(e, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(a > 1e-12, jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0), 0.0)
    c1 = p1 + d1 * s[..., None]
    c2 = p2 + d2 * t[..., None]
    return c1, c2


def _point_box_closest(p_local, size):
    """Closest point on a box (half-extents ``size``) to p (box frame).
    Returns (closest_local, signed distance to surface)."""
    clamped = jnp.clip(p_local, -size, size)
    outside = jnp.linalg.norm(p_local - clamped, axis=-1)
    # inside: distance to nearest face (negative)
    face_d = size - jnp.abs(p_local)
    inside = -jnp.min(face_d, axis=-1)
    is_out = outside > 1e-12
    # inside: project to nearest face
    ax = jnp.argmin(face_d, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(p_local, ax[..., None], -1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    proj = p_local
    onehot = jax_one_hot(ax, 3, p_local.dtype)
    proj = p_local * (1 - onehot) + (sign * jnp.take_along_axis(size, ax[..., None], -1)[..., 0])[..., None] * onehot
    closest = jnp.where(is_out[..., None], clamped, proj)
    dist = jnp.where(is_out, outside, inside)
    return closest, dist


def jax_one_hot(idx, n, dtype):
    return (idx[..., None] == jnp.arange(n)).astype(dtype)


# ---------------- main entry ------------------------------------------

def collide(m: PhysicsModel, tables: _PairTables, kin: Kin,
            max_contacts: int) -> Contacts:
    """Narrow phase over all slots, then top-K deepest selection."""
    dtype = kin.xpos.dtype
    n = len(tables.kind)
    dist = jnp.full((n,), _BIG, dtype)
    pos = jnp.zeros((n, 3), dtype)
    normal = jnp.zeros((n, 3), dtype).at[:, 2].set(1.0)

    def setg(sel, d, p, nrm):
        nonlocal dist, pos, normal
        idx = jnp.asarray(np.where(sel)[0])
        dist = dist.at[idx].set(d)
        pos = pos.at[idx].set(p)
        normal = normal.at[idx].set(nrm)

    kind = tables.kind
    g1_all, g2_all, sub_all = tables.g1, tables.g2, tables.sub

    # ---- plane-sphere -------------------------------------------------
    sel = kind == K_PLANE_SPHERE
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        pn, pp = _plane_frame(kin, g1)
        c = kin.geom_xpos[g2]
        r = jnp.asarray(m.geom_size[g2, 0], dtype)
        h = jnp.sum((c - pp) * pn, -1)
        d = h - r
        cp = c - pn * (r + d / 2)[:, None]
        setg(sel, d, cp, pn)

    # ---- plane-capsule (2 end-cap slots) ------------------------------
    sel = kind == K_PLANE_CAPSULE
    if sel.any():
        g1, g2, sub = g1_all[sel], g2_all[sel], sub_all[sel]
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        axis = mat[..., :, 2]
        r = jnp.asarray(m.geom_size[g2, 0], dtype)
        hl = jnp.asarray(m.geom_size[g2, 1], dtype)
        side = jnp.asarray(np.where(sub == 0, 1.0, -1.0), dtype)
        e = c + axis * (side * hl)[:, None]
        h = jnp.sum((e - pp) * pn, -1)
        d = h - r
        cp = e - pn * (r + d / 2)[:, None]
        setg(sel, d, cp, pn)

    # ---- plane-box (4 deepest corners) --------------------------------
    sel = kind == K_PLANE_BOX
    if sel.any():
        g1, g2, sub = g1_all[sel], g2_all[sel], sub_all[sel]
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        corners = jnp.asarray(
            np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)]), dtype)  # (8, 3)
        pts = c[:, None] + jnp.einsum("nij,kj,nj->nki", mat, corners, size)
        h = jnp.sum((pts - pp[:, None]) * pn[:, None], -1)  # (n, 8)
        order = jnp.argsort(h, axis=1)
        pick = jnp.take_along_axis(order, jnp.asarray(sub)[:, None], 1)[:, 0]
        d = jnp.take_along_axis(h, pick[:, None], 1)[:, 0]
        cp = jnp.take_along_axis(pts, pick[:, None, None].repeat(3, -1), 1)[:, 0]
        cp = cp - pn * (d / 2)[:, None]
        setg(sel, d, cp, pn)

    # ---- plane-mesh (4 deepest hull verts) ----------------------------
    sel = kind == K_PLANE_MESH
    if sel.any():
        g1, g2, sub = g1_all[sel], g2_all[sel], sub_all[sel]
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        # pad all vert sets to a common K (host-side)
        Kv = max(len(m.meshes[int(m.geom_meshid[g])].verts)
                 for g in np.unique(np.asarray(g2)))
        verts = np.zeros((len(np.asarray(g2)), Kv, 3))
        for i, g in enumerate(np.asarray(g2)):
            v = m.meshes[int(m.geom_meshid[g])].verts
            verts[i, :len(v)] = v
            verts[i, len(v):] = v[0]
        verts = jnp.asarray(verts, dtype)
        pts = c[:, None] + jnp.einsum("nij,nkj->nki", mat, verts)
        h = jnp.sum((pts - pp[:, None]) * pn[:, None], -1)
        order = jnp.argsort(h, axis=1)
        pick = jnp.take_along_axis(order, jnp.asarray(sub)[:, None], 1)[:, 0]
        d = jnp.take_along_axis(h, pick[:, None], 1)[:, 0]
        cp = jnp.take_along_axis(pts, pick[:, None, None].repeat(3, -1), 1)[:, 0]
        cp = cp - pn * (d / 2)[:, None]
        setg(sel, d, cp, pn)

    # ---- sphere-sphere -------------------------------------------------
    sel = kind == K_SPHERE_SPHERE
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        c1, c2 = kin.geom_xpos[g1], kin.geom_xpos[g2]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        r2 = jnp.asarray(m.geom_size[g2, 0], dtype)
        dvec = c2 - c1
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (r1 + r2)
        cp = c1 + nrm * (r1 + d / 2)[:, None]
        setg(sel, d, cp, nrm)

    # ---- sphere-capsule (capsule may be a mesh proxy) ------------------
    sel = kind == K_SPHERE_CAPSULE
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        c1 = kin.geom_xpos[g1]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        p0, p1, r2 = _mesh_capsule_world(m, g2, kin)
        c2a, c2b = _seg_seg_closest(c1, c1, p0, p1)
        dvec = c2b - c1
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (r1 + r2)
        cp = c1 + nrm * (r1 + d / 2)[:, None]
        setg(sel, d, cp, nrm)

    # ---- capsule-capsule (either may be a mesh proxy) -------------------
    sel = kind == K_CAPSULE_CAPSULE
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        p0a, p1a, ra = _mesh_capsule_world(m, g1, kin)
        p0b, p1b, rb = _mesh_capsule_world(m, g2, kin)
        ca, cb = _seg_seg_closest(p0a, p1a, p0b, p1b)
        dvec = cb - ca
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (ra + rb)
        cp = ca + nrm * (ra + d / 2)[:, None]
        setg(sel, d, cp, nrm)

    # ---- sphere-box ------------------------------------------------------
    sel = kind == K_SPHERE_BOX
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        c1 = kin.geom_xpos[g1]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        mat = kin.geom_xmat[g2]
        cb = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        pl = jnp.einsum("nji,nj->ni", mat, c1 - cb)  # world->box frame
        closest, dsurf = _point_box_closest(pl, size)
        cw = cb + jnp.einsum("nij,nj->ni", mat, closest)
        dvec = cw - c1
        nrm = dvec / jnp.maximum(jnp.linalg.norm(dvec, -1, keepdims=True)
                                 if False else
                                 jnp.linalg.norm(dvec, axis=-1, keepdims=True),
                                 1e-9)
        nrm = jnp.where((dsurf < 0)[:, None], -nrm, nrm)
        d = dsurf - r1
        cp = cw - nrm * (d / 2)[:, None]
        setg(sel, d, cp, nrm)

    # ---- capsule-box (segment-box closest) --------------------------------
    sel = kind == K_CAPSULE_BOX
    if sel.any():
        g1, g2 = g1_all[sel], g2_all[sel]
        p0, p1, rc = _mesh_capsule_world(m, g1, kin)
        mat = kin.geom_xmat[g2]
        cb = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        # sample S points along the segment, take deepest point-box
        S = 8
        ts = jnp.linspace(0.0, 1.0, S)
        pts = p0[:, None] + (p1 - p0)[:, None] * ts[None, :, None]
        pl = jnp.einsum("nji,nkj->nki", mat, pts - cb[:, None])
        closest, dsurf = _point_box_closest(pl, size[:, None].repeat(S, 1))
        best = jnp.argmin(dsurf, axis=1)
        pbest = jnp.take_along_axis(pts, best[:, None, None].repeat(3, -1), 1)[:, 0]
        clbest = jnp.take_along_axis(closest, best[:, None, None].repeat(3, -1), 1)[:, 0]
        dbest = jnp.take_along_axis(dsurf, best[:, None], 1)[:, 0]
        cw = cb + jnp.einsum("nij,nj->ni", mat, clbest)
        dvec = cw - pbest
        nrm = dvec / jnp.maximum(jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        nrm = jnp.where((dbest < 0)[:, None], -nrm, nrm)
        d = dbest - rc
        cp = cw - nrm * (d / 2)[:, None]
        setg(sel, d, cp, nrm)

    # ---- box-box (corner sampling, 4 deepest of 16) -----------------------
    sel = kind == K_BOX_BOX
    if sel.any():
        g1, g2, sub = g1_all[sel], g2_all[sel], sub_all[sel]
        corners = jnp.asarray(
            np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)]), dtype)

        def corners_vs_box(ga, gb):
            mata, ca = kin.geom_xmat[ga], kin.geom_xpos[ga]
            matb, cbp = kin.geom_xmat[gb], kin.geom_xpos[gb]
            sa = jnp.asarray(m.geom_size[ga], dtype)
            sb = jnp.asarray(m.geom_size[gb], dtype)
            pts = ca[:, None] + jnp.einsum("nij,kj,nj->nki", mata, corners, sa)
            pl = jnp.einsum("nji,nkj->nki", matb, pts - cbp[:, None])
            closest, dsurf = _point_box_closest(pl, sb[:, None].repeat(8, 1))
            cw = cbp[:, None] + jnp.einsum("nij,nkj->nki", matb, closest)
            return pts, cw, dsurf

        ptsA, cwA, dA = corners_vs_box(g1, g2)
        ptsB, cwB, dB = corners_vs_box(g2, g1)
        allp = jnp.concatenate([ptsA, ptsB], 1)
        allc = jnp.concatenate([cwA, cwB], 1)
        alld = jnp.concatenate([dA, dB], 1)
        flip = jnp.concatenate([jnp.ones((ptsA.shape[0], 8)),
                                -jnp.ones((ptsB.shape[0], 8))], 1)
        order = jnp.argsort(alld, axis=1)
        pick = jnp.take_along_axis(order, jnp.asarray(sub)[:, None], 1)[:, 0]
        d = jnp.take_along_axis(alld, pick[:, None], 1)[:, 0]
        pb = jnp.take_along_axis(allp, pick[:, None, None].repeat(3, -1), 1)[:, 0]
        cb2 = jnp.take_along_axis(allc, pick[:, None, None].repeat(3, -1), 1)[:, 0]
        fl = jnp.take_along_axis(flip, pick[:, None], 1)[:, 0]
        dvec = (cb2 - pb) * fl[:, None]
        nrm = dvec / jnp.maximum(jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        nrm = jnp.where((d < 0)[:, None], -nrm, nrm)
        cp = (pb + cb2) / 2
        setg(sel, d, cp, nrm)

    # ---- top-K selection ------------------------------------------------
    margin = jnp.asarray(tables.margin, dtype)
    score = dist - margin  # active when < 0
    k = min(max_contacts, n)
    neg_score, idx = jax_top_k(-score, k)
    frame = _make_frame(normal[idx])
    return Contacts(
        dist=dist[idx], pos=pos[idx], frame=frame,
        geom1=jnp.asarray(tables.g1, jnp.int32)[idx],
        geom2=jnp.asarray(tables.g2, jnp.int32)[idx],
        includemargin=margin[idx],
        friction=jnp.asarray(tables.friction, dtype)[idx],
        solref=jnp.asarray(tables.solref, dtype)[idx],
        solimp=jnp.asarray(tables.solimp, dtype)[idx],
        condim=jnp.asarray(tables.condim, jnp.int32)[idx],
    )


def jax_top_k(x, k):
    import jax.lax as lax
    return lax.top_k(x, k)


def geom_pair_contact_flags(contacts: Contacts, gid_a, gid_b):
    """1.0 if any active contact touches both geoms in the given sets.

    Replaces the reference's per-contact name-string matching
    (src/deepmimic_env.py:88-101) with static id-set membership.
    """
    active = contacts.dist < contacts.includemargin
    in_a = jnp.isin(contacts.geom1, gid_a) | jnp.isin(contacts.geom2, gid_a)
    in_b = jnp.isin(contacts.geom1, gid_b) | jnp.isin(contacts.geom2, gid_b)
    return (active & in_a & in_b).any().astype(contacts.dist.dtype)
