"""Collision detection: static pair tables -> fixed-size contact set.

TPU-first design: the candidate pair list is enumerated at model-build
time (the reference engine does broadphase per step; with <100 bodies a
static table is cheaper and keeps all shapes compile-time constant).
Narrow-phase runs vectorized per pair-type group over UNIQUE pairs;
each group emits (npair, nslot) contact slots which are concatenated in
a fixed group-major order — no runtime scatters. The solver consumes
the top-K deepest slots (all active contacts are kept whenever
#active <= K).

Replaces the native-engine collision pipeline the reference invokes
inside ``sim.step`` (reference: src/deepmimic_env.py:362, engine option
``nconmax=200`` at deepmimic_unitree_g1.xml:10). Mesh geoms collide via
their hull-vertex sets against planes (near-exact) and via PCA capsule
proxies against everything else.

Supported exactly: plane-{sphere, capsule, box, mesh}, sphere-sphere,
sphere-capsule, capsule-capsule, sphere-box (point-box), capsule-box
(segment-box sampling), box-box (corner sampling, 4 deepest). Cylinders
collide as capsules of equal radius/half-length (conservative caps).
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple

import numpy as np

import jax.lax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import (
    BOX, CAPSULE, CYLINDER, MESH, PLANE, SPHERE, PhysicsModel,
)
from deepmimic_mujoco_tpu.physics.kinematics import Kin

_BIG = 1e4  # "far away" distance for empty slots

# narrow-phase group ids
K_PLANE_SPHERE, K_PLANE_CAPSULE, K_PLANE_BOX, K_PLANE_MESH = 0, 1, 2, 3
K_SPHERE_SPHERE, K_SPHERE_CAPSULE, K_CAPSULE_CAPSULE = 4, 5, 6
K_SPHERE_BOX, K_CAPSULE_BOX, K_BOX_BOX = 7, 8, 9

_SLOTS = {K_PLANE_SPHERE: 1, K_PLANE_CAPSULE: 2, K_PLANE_BOX: 4,
          K_PLANE_MESH: 4, K_SPHERE_SPHERE: 1, K_SPHERE_CAPSULE: 1,
          K_CAPSULE_CAPSULE: 1, K_SPHERE_BOX: 1, K_CAPSULE_BOX: 1,
          K_BOX_BOX: 4}


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
    overflow: jnp.ndarray  # () int32: active contacts dropped by top-K
    #                        selection this step (0 = lossless). Silent
    #                        slot saturation changes dynamics; this
    #                        makes it observable (see envs exposing it
    #                        via info/metrics).


class PairGroup(NamedTuple):
    """Unique pairs of one narrow-phase kind (host-side, static)."""
    kind: int
    g1: np.ndarray         # (npair,)
    g2: np.ndarray
    # per-SLOT metadata, flattened (npair * nslot,)
    margin: np.ndarray
    friction: np.ndarray
    solref: np.ndarray
    solimp: np.ndarray
    condim: np.ndarray
    # distance offset per slot: mesh proxy capsules are fatter than the
    # true hulls, so pairs that falsely overlap at a reference pose get
    # their rest overlap subtracted (see calibrate_proxy_gaps)
    gap: np.ndarray
    is_proxy: np.ndarray   # (npair,) bool: either geom collides via proxy
    # sub-capsule index per pair side (-1 = whole-mesh PCA capsule /
    # primitive); >=0 selects Mesh.sub_capsules[i] (mesh_subcapsules>1)
    sub1: np.ndarray = None
    sub2: np.ndarray = None


def _as_capsule_kind(t: int) -> int:
    return CAPSULE if t == CYLINDER else t


def _n_subs(m: PhysicsModel, g: int, mesh_subcapsules: int) -> int:
    mid = int(m.geom_meshid[g])
    if mesh_subcapsules <= 1 or mid < 0:
        return 0
    return len(m.meshes[mid].sub_capsules) or 0


def build_pair_tables(m: PhysicsModel,
                      mesh_subcapsules: int = 1) -> List[PairGroup]:
    """Classify candidate pairs into narrow-phase groups.

    ``mesh_subcapsules > 1`` expands each mesh-involved (non-plane)
    pair over the meshes' sub-capsule decompositions — tighter
    self-collision for elongated links at the cost of more candidate
    slots. Default 1 keeps the single whole-mesh PCA proxy (and the
    dynamics that round-1/2 policies were trained against).
    """
    groups: Dict[int, dict] = {}
    for g1, g2 in zip(m.pair_geom1, m.pair_geom2):
        t1 = _as_capsule_kind(int(m.geom_type[g1]))
        t2 = _as_capsule_kind(int(m.geom_type[g2]))
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
            continue
        grp = groups.setdefault(kind, {k: [] for k in (
            "g1", "g2", "sub1", "sub2", "margin", "friction", "solref",
            "solimp", "condim")})
        # sub-capsule expansion (proxies only; plane-mesh is exact)
        n1 = _n_subs(m, g1, mesh_subcapsules) if kind != K_PLANE_MESH else 0
        n2 = _n_subs(m, g2, mesh_subcapsules) if kind != K_PLANE_MESH else 0
        for s1 in (range(n1) if n1 else (-1,)):
            for s2 in (range(n2) if n2 else (-1,)):
                grp["g1"].append(int(g1))
                grp["g2"].append(int(g2))
                grp["sub1"].append(s1)
                grp["sub2"].append(s2)
                grp["margin"].append(
                    max(m.geom_margin[g1], m.geom_margin[g2]))
                grp["friction"].append(
                    np.maximum(m.geom_friction[g1], m.geom_friction[g2]))
                grp["solref"].append(
                    (m.geom_solref[g1] + m.geom_solref[g2]) / 2.0)
                grp["solimp"].append(
                    (m.geom_solimp[g1] + m.geom_solimp[g2]) / 2.0)
                grp["condim"].append(
                    max(m.geom_condim[g1], m.geom_condim[g2]))

    out = []
    for kind in sorted(groups):
        g = groups[kind]
        ns = _SLOTS[kind]
        rep = lambda a: np.repeat(np.asarray(a), ns, axis=0)
        g1a, g2a = np.asarray(g["g1"]), np.asarray(g["g2"])
        is_proxy = np.array(
            [kind != K_PLANE_MESH
             and (m.geom_meshid[a] >= 0 or m.geom_meshid[b] >= 0)
             for a, b in zip(g1a, g2a)], dtype=bool)
        out.append(PairGroup(
            kind=kind, g1=g1a, g2=g2a,
            margin=rep(g["margin"]), friction=rep(g["friction"]),
            solref=rep(g["solref"]), solimp=rep(g["solimp"]),
            condim=rep(g["condim"]).astype(np.int32),
            gap=np.zeros(len(g1a) * ns), is_proxy=is_proxy,
            sub1=np.asarray(g["sub1"], np.int64),
            sub2=np.asarray(g["sub2"], np.int64)))
    return out


def calibrate_proxy_gaps(m: PhysicsModel, tables: List[PairGroup],
                         calib_qpos: np.ndarray) -> List[PairGroup]:
    """Zero out false rest-pose overlaps of mesh proxy capsules.

    Runs the narrow phase once at a reference pose (keyframe if the
    model has one) and, for proxy-involved slots that report
    penetration there, subtracts that rest overlap from all future
    distances — the oracle's true hulls do not touch at the reference
    pose, so neither should we (verified against oracle contacts at the
    G1 stand keyframe).
    """
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.physics.kinematics import fwd_kinematics

    kin = jax.jit(lambda q: fwd_kinematics(m, q))(
        jnp.asarray(calib_qpos, jnp.float32))
    out = []
    for grp in tables:
        if not grp.is_proxy.any():
            out.append(grp)
            continue
        d, _, _ = _narrow(m, kin, grp)
        d = np.asarray(d, np.float64)
        ns = _SLOTS[grp.kind]
        proxy_slot = np.repeat(grp.is_proxy, ns)
        gap = np.where(proxy_slot, np.minimum(d - grp.margin, 0.0), 0.0)
        out.append(grp._replace(gap=gap))
    return out


def total_slots(tables: List[PairGroup]) -> int:
    return sum(len(t.g1) * _SLOTS[t.kind] for t in tables)


# ---------------- geometry helpers (jnp, batched over pairs) ----------

def _mesh_capsule_world(m, gids, kin: Kin, subs=None):
    """World (p0, p1, radius) capsule segment; mesh geoms use their PCA
    proxy (or sub-capsule ``subs[i]`` when >=0), primitives their own
    size."""
    pos = kin.geom_xpos[gids]
    mat = kin.geom_xmat[gids]
    rad, half, off, qax = [], [], [], []
    if subs is None:
        subs = np.full(len(np.asarray(gids)), -1)
    for g, s in zip(np.asarray(gids), np.asarray(subs)):
        mid = int(m.geom_meshid[g])
        if mid >= 0:
            mesh = m.meshes[mid]
            from deepmimic_mujoco_tpu.utils import hostquat as hq
            if s >= 0:
                cp, cq, cr, ch = mesh.sub_capsules[int(s)]
                rad.append(cr)
                half.append(ch)
                off.append(cp)
                qax.append(hq.to_mat(cq)[:, 2])
            else:
                rad.append(mesh.capsule_size[0])
                half.append(mesh.capsule_size[1])
                off.append(mesh.capsule_pos)
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
    n = kin.geom_xmat[g1][..., :, 2]
    p = kin.geom_xpos[g1]
    return n, p


def _seg_seg_closest(p1, q1, p2, q2):
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
    s = jnp.where(a > 1e-12,
                  jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0), 0.0)
    return p1 + d1 * s[..., None], p2 + d2 * t[..., None]


def _one_hot(idx, n, dtype):
    return (idx[..., None] == jnp.arange(n)).astype(dtype)


def _point_box_closest(p_local, size):
    """Closest surface point + signed distance, box frame (batched).

    Selection is one-hot/where arithmetic — dynamic gathers
    (take_along_axis) lower to slow scatter/gather fusions on TPU.
    """
    clamped = jnp.clip(p_local, -size, size)
    outside = jnp.linalg.norm(p_local - clamped, axis=-1)
    face_d = size - jnp.abs(p_local)
    dmin = jnp.min(face_d, axis=-1)
    inside = -dmin
    is_out = outside > 1e-12
    onehot = (face_d == dmin[..., None]).astype(p_local.dtype)
    onehot = onehot / jnp.maximum(onehot.sum(-1, keepdims=True), 1.0)
    sign = jnp.where(p_local >= 0, 1.0, -1.0)
    proj = p_local * (1 - onehot) + sign * size * onehot
    closest = jnp.where(is_out[..., None], clamped, proj)
    dist = jnp.where(is_out, outside, inside)
    return closest, dist


def _smallest_k_onehot(vals, k):
    """(n, m) -> (n, k, m) one-hot rows selecting the k smallest values
    per row, via k argmin+mask passes — under vmap a full argsort
    lowers to a TPU sort kernel costing ~0.7 ms/step at batch 4096 for
    what is a pick-4-of-8; iterative argmin is pure elementwise."""
    m_dim = vals.shape[-1]
    iota = jnp.arange(m_dim)
    masked = vals
    sels = []
    for _ in range(k):
        vmin = jnp.min(masked, axis=-1, keepdims=True)
        is_min = masked == vmin
        # break ties toward the lowest index (argsort is stable)
        first = jnp.min(jnp.where(is_min, iota, m_dim), axis=-1,
                        keepdims=True)
        sel = (iota == first).astype(vals.dtype)
        sels.append(sel)
        masked = jnp.where(sel > 0, jnp.inf, masked)
    return jnp.stack(sels, axis=-2)


def _smallest_k(vals, pts, k):
    """(n, m) values + (n, m, 3) points -> k smallest per row,
    gather-free (see _smallest_k_onehot)."""
    sel = _smallest_k_onehot(vals, k)
    d = jnp.einsum("nkm,nm->nk", sel, vals)
    p = jnp.einsum("nkm,nmd->nkd", sel, pts)
    return d, p


def _argmin_pick(vals, *arrays):
    """Select arrays at the per-row argmin of vals via one-hot sums."""
    dmin = jnp.min(vals, axis=-1)
    onehot = (vals == dmin[..., None]).astype(vals.dtype)
    onehot = onehot / jnp.maximum(onehot.sum(-1, keepdims=True), 1.0)
    outs = []
    for a in arrays:
        if a.ndim == vals.ndim:
            outs.append((a * onehot).sum(-1))
        else:
            outs.append((a * onehot[..., None]).sum(-2))
    return (dmin, *outs)


# ---------------- narrow phase per group (unique pairs) ----------------

def _narrow(m, kin, grp: PairGroup):
    """Returns (dist, pos, normal) each (npair*nslot, ...)."""
    dtype = kin.xpos.dtype
    g1 = grp.g1
    g2 = grp.g2
    kind = grp.kind

    if kind == K_PLANE_SPHERE:
        pn, pp = _plane_frame(kin, g1)
        c = kin.geom_xpos[g2]
        r = jnp.asarray(m.geom_size[g2, 0], dtype)
        h = jnp.sum((c - pp) * pn, -1)
        d = h - r
        cp = c - pn * (r + d / 2)[:, None]
        return d, cp, pn

    if kind == K_PLANE_CAPSULE:
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        axis = mat[..., :, 2]
        r = jnp.asarray(m.geom_size[g2, 0], dtype)
        hl = jnp.asarray(m.geom_size[g2, 1], dtype)
        ends = jnp.stack([c + axis * hl[:, None], c - axis * hl[:, None]], 1)
        h = jnp.sum((ends - pp[:, None]) * pn[:, None], -1)  # (n, 2)
        d = h - r[:, None]
        cp = ends - pn[:, None] * (r[:, None] + d / 2)[..., None]
        nrm = jnp.repeat(pn[:, None], 2, 1)
        return d.reshape(-1), cp.reshape(-1, 3), nrm.reshape(-1, 3)

    if kind == K_PLANE_BOX:
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        corners = jnp.asarray(
            np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                      for sz in (-1, 1)]), dtype)
        pts = c[:, None] + jnp.einsum("nij,kj,nj->nki", mat, corners, size)
        h = jnp.sum((pts - pp[:, None]) * pn[:, None], -1)  # (n, 8)
        d4, p4 = _smallest_k(h, pts, 4)
        cp = p4 - pn[:, None] * (d4 / 2)[..., None]
        nrm = jnp.repeat(pn[:, None], 4, 1)
        return d4.reshape(-1), cp.reshape(-1, 3), nrm.reshape(-1, 3)

    if kind == K_PLANE_MESH:
        pn, pp = _plane_frame(kin, g1)
        mat = kin.geom_xmat[g2]
        c = kin.geom_xpos[g2]
        Kv = max(len(m.meshes[int(m.geom_meshid[g])].verts)
                 for g in np.asarray(g2))
        verts = np.zeros((len(np.asarray(g2)), Kv, 3))
        for i, g in enumerate(np.asarray(g2)):
            v = m.meshes[int(m.geom_meshid[g])].verts
            verts[i, :len(v)] = v
            verts[i, len(v):] = v[0]
        verts = jnp.asarray(verts, dtype)
        pts = c[:, None] + jnp.einsum("nij,nkj->nki", mat, verts)
        h = jnp.sum((pts - pp[:, None]) * pn[:, None], -1)
        d4, p4 = _smallest_k(h, pts, 4)
        cp = p4 - pn[:, None] * (d4 / 2)[..., None]
        nrm = jnp.repeat(pn[:, None], 4, 1)
        return d4.reshape(-1), cp.reshape(-1, 3), nrm.reshape(-1, 3)

    if kind == K_SPHERE_SPHERE:
        c1, c2 = kin.geom_xpos[g1], kin.geom_xpos[g2]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        r2 = jnp.asarray(m.geom_size[g2, 0], dtype)
        dvec = c2 - c1
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (r1 + r2)
        cp = c1 + nrm * (r1 + d / 2)[:, None]
        return d, cp, nrm

    if kind == K_SPHERE_CAPSULE:
        c1 = kin.geom_xpos[g1]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        p0, p1, r2 = _mesh_capsule_world(m, g2, kin, grp.sub2)
        _, cb = _seg_seg_closest(c1, c1, p0, p1)
        dvec = cb - c1
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (r1 + r2)
        cp = c1 + nrm * (r1 + d / 2)[:, None]
        return d, cp, nrm

    if kind == K_CAPSULE_CAPSULE:
        p0a, p1a, ra = _mesh_capsule_world(m, g1, kin, grp.sub1)
        p0b, p1b, rb = _mesh_capsule_world(m, g2, kin, grp.sub2)
        ca, cb = _seg_seg_closest(p0a, p1a, p0b, p1b)
        dvec = cb - ca
        L = jnp.linalg.norm(dvec, axis=-1)
        nrm = dvec / jnp.maximum(L, 1e-9)[:, None]
        d = L - (ra + rb)
        cp = ca + nrm * (ra + d / 2)[:, None]
        return d, cp, nrm

    if kind == K_SPHERE_BOX:
        c1 = kin.geom_xpos[g1]
        r1 = jnp.asarray(m.geom_size[g1, 0], dtype)
        mat = kin.geom_xmat[g2]
        cb = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        pl = jnp.einsum("nji,nj->ni", mat, c1 - cb)
        closest, dsurf = _point_box_closest(pl, size)
        cw = cb + jnp.einsum("nij,nj->ni", mat, closest)
        dvec = cw - c1
        nrm = dvec / jnp.maximum(
            jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        nrm = jnp.where((dsurf < 0)[:, None], -nrm, nrm)
        d = dsurf - r1
        cp = cw - nrm * (d / 2)[:, None]
        return d, cp, nrm

    if kind == K_CAPSULE_BOX:
        p0, p1, rc = _mesh_capsule_world(m, g1, kin, grp.sub1)
        mat = kin.geom_xmat[g2]
        cb = kin.geom_xpos[g2]
        size = jnp.asarray(m.geom_size[g2], dtype)
        S = 8
        ts = jnp.linspace(0.0, 1.0, S)
        pts = p0[:, None] + (p1 - p0)[:, None] * ts[None, :, None]
        pl = jnp.einsum("nji,nkj->nki", mat, pts - cb[:, None])
        closest, dsurf = _point_box_closest(pl, size[:, None].repeat(S, 1))
        dbest, pbest, clbest = _argmin_pick(dsurf, pts, closest)
        cw = cb + jnp.einsum("nij,nj->ni", mat, clbest)
        dvec = cw - pbest
        nrm = dvec / jnp.maximum(
            jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        nrm = jnp.where((dbest < 0)[:, None], -nrm, nrm)
        d = dbest - rc
        cp = cw - nrm * (d / 2)[:, None]
        return d, cp, nrm

    if kind == K_BOX_BOX:
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
        flip = jnp.concatenate([jnp.ones_like(dA), -jnp.ones_like(dB)], 1)
        sel = _smallest_k_onehot(alld, 4)
        d4 = jnp.einsum("nkm,nm->nk", sel, alld)
        p4 = jnp.einsum("nkm,nmd->nkd", sel, allp)
        c4 = jnp.einsum("nkm,nmd->nkd", sel, allc)
        f4 = jnp.einsum("nkm,nm->nk", sel, flip)
        dvec = (c4 - p4) * f4[..., None]
        nrm = dvec / jnp.maximum(
            jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-9)
        nrm = jnp.where((d4 < 0)[..., None], -nrm, nrm)
        cp = (p4 + c4) / 2
        return d4.reshape(-1), cp.reshape(-1, 3), nrm.reshape(-1, 3)

    raise NotImplementedError(kind)


# ---------------- main entry ------------------------------------------

def collide(m: PhysicsModel, tables: List[PairGroup], kin: Kin,
            max_contacts: int) -> Contacts:
    """Narrow phase over all groups, then top-K deepest selection."""
    dtype = kin.xpos.dtype
    dists, poss, nrms = [], [], []
    meta = {k: [] for k in ("g1", "g2", "margin", "friction", "solref",
                            "solimp", "condim")}
    for grp in tables:
        d, p, nr = _narrow(m, kin, grp)
        if np.any(grp.gap < 0):
            d = d - jnp.asarray(grp.gap, dtype)  # widen proxy rest gaps
        dists.append(d)
        poss.append(p)
        nrms.append(nr)
        ns = _SLOTS[grp.kind]
        meta["g1"].append(np.repeat(grp.g1, ns))
        meta["g2"].append(np.repeat(grp.g2, ns))
        for k in ("margin", "friction", "solref", "solimp", "condim"):
            meta[k].append(getattr(grp, k))

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    normal = jnp.concatenate(nrms)
    margin_np = np.concatenate(meta["margin"])
    margin = jnp.asarray(margin_np, dtype)

    nslots = dist.shape[0]
    k = min(max_contacts, nslots)
    _, idx = jax.lax.top_k(-(dist - margin), k)
    n_active_all = jnp.sum((dist - margin) < 0.0)
    overflow = jnp.maximum(n_active_all - k, 0).astype(jnp.int32)
    # one-hot selection for ALL fields: dynamic int gathers under vmap
    # lower to ~0.5 ms/step custom fusions at batch 4096 (round-3
    # trace); a one-hot matmul + round is exact for ids < 2^24
    sel = (idx[:, None] == jnp.arange(nslots)).astype(dtype)  # (k, nslots)

    frame = _make_frame(sel @ normal)
    cat = lambda key: np.concatenate(meta[key])
    int_sel = lambda key: (sel @ jnp.asarray(cat(key), dtype)
                           + 0.5).astype(jnp.int32)
    return Contacts(
        dist=sel @ dist, pos=sel @ pos, frame=frame,
        geom1=int_sel("g1"),
        geom2=int_sel("g2"),
        includemargin=sel @ margin,
        friction=sel @ jnp.asarray(cat("friction"), dtype),
        solref=sel @ jnp.asarray(cat("solref"), dtype),
        solimp=sel @ jnp.asarray(cat("solimp"), dtype),
        condim=int_sel("condim"),
        overflow=overflow,
    )


def geom_pair_contact_flags(contacts: Contacts, gid_a, gid_b):
    """1.0 if any active contact touches both geom sets (replaces the
    reference's name-string matching, src/deepmimic_env.py:88-101)."""
    active = contacts.dist < contacts.includemargin
    in_a = jnp.isin(contacts.geom1, gid_a) | jnp.isin(contacts.geom2, gid_a)
    in_b = jnp.isin(contacts.geom1, gid_b) | jnp.isin(contacts.geom2, gid_b)
    return (active & in_a & in_b).any().astype(contacts.dist.dtype)
