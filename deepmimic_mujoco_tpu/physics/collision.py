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
    slot_idx: jnp.ndarray = None  # (ncon,) int32 static pair-slot id
    #                          of each compacted slot; used by the
    #                          engine's PAIR-KEYED solver warm start
    #                          (top-K reorders slots by depth every
    #                          step, so slot-INDEXED forces would be
    #                          applied to the wrong contact whenever
    #                          depth order churns — e.g. G1 run flight
    #                          phases; matching ids lets a persisting
    #                          contact keep its force).


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
        # SAMPLE-MAJOR slot tiling: slot s of all pairs, then slot s+1
        # (matches the flattened layout of the SoA narrow phase)
        rep = lambda a: np.tile(
            np.asarray(a), (ns,) + (1,) * (np.asarray(a).ndim - 1))
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

    # ONE jit over FK + every proxy group's narrow phase: the SoA
    # narrow phase is hundreds of small jnp ops, and dispatching them
    # eagerly through a remote-device tunnel (~60 ms/op) turns this
    # one-time calibration into a multi-minute hang at env init.
    need = [grp for grp in tables if grp.is_proxy.any()]
    if not need:
        return list(tables)
    ds = jax.jit(lambda q: [
        _narrow_groups(m, [grp], fwd_kinematics(m, q))[0][0]
        for grp in need])(jnp.asarray(calib_qpos, jnp.float32))
    gaps = {id(grp): np.asarray(d, np.float64)
            for grp, d in zip(need, ds)}
    out = []
    for grp in tables:
        if id(grp) not in gaps:
            out.append(grp)
            continue
        d = gaps[id(grp)]
        ns = _SLOTS[grp.kind]
        proxy_slot = np.tile(grp.is_proxy, ns)
        gap = np.where(proxy_slot, np.minimum(d - grp.margin, 0.0), 0.0)
        out.append(grp._replace(gap=gap))
    return out


def total_slots(tables: List[PairGroup]) -> int:
    return sum(len(t.g1) * _SLOTS[t.kind] for t in tables)


# ---------------- SoA geometry core -----------------------------------
#
# TPU layout rationale: AoS narrow-phase math carries arrays with tiny
# minor dims ((npair, 8, 3) sample points, (npair, 3, 3) rotations).
# Under vmap those tile to (8,128)/(4,128) blocks that are >90% padding
# and force layout copies between every dot_general — measured ~2.3 ms
# of the 9.3 ms step at batch 4096 (round-3 trace). The rewrite keeps
# every vector as three SEPARATE (npair,) component arrays (struct of
# arrays) so all math is flat elementwise work that XLA fuses into a
# few dense (batch, npairs) kernels. Per-pair constant data (sizes,
# radii, local capsule frames, box corners) stays host-side numpy and
# enters the formulas as compile-time coefficient vectors. Dynamic
# per-pair world data is produced by ONE-HOT MATMULS from per-geom
# arrays (static indices; int/dynamic gathers lower ~100x slower than
# an MXU one-hot on TPU). Sample dimensions (capsule-box S=8 samples,
# box corners, mesh verts) are flattened SAMPLE-MAJOR into the pair
# axis so per-sample views are contiguous static slices and reductions
# over samples are elementwise min-trees, never reshape+reduce.


class V3(NamedTuple):
    """Vector-of-arrays 3-vector: x/y/z as separate (...,) arrays."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(s, o):
        return V3(s.x + o.x, s.y + o.y, s.z + o.z)

    def __sub__(s, o):
        return V3(s.x - o.x, s.y - o.y, s.z - o.z)

    def scale(s, a):
        return V3(s.x * a, s.y * a, s.z * a)

    def dot(s, o):
        return s.x * o.x + s.y * o.y + s.z * o.z

    def cross(s, o):
        return V3(s.y * o.z - s.z * o.y,
                  s.z * o.x - s.x * o.z,
                  s.x * o.y - s.y * o.x)

    def norm(s, eps=0.0):
        return jnp.sqrt(s.dot(s) + eps)

    def where(s, c, o):
        return V3(jnp.where(c, s.x, o.x), jnp.where(c, s.y, o.y),
                  jnp.where(c, s.z, o.z))

    def stack(s):
        return jnp.stack([s.x, s.y, s.z], axis=-1)


def _vsplit(a) -> V3:
    return V3(a[..., 0], a[..., 1], a[..., 2])


def _onehot_take(arr, idx, n_src, dtype):
    """(…, n_src) -> (…, len(idx)) via a constant one-hot matmul."""
    M = np.zeros((n_src, len(idx)), np.float32)
    M[np.asarray(idx), np.arange(len(idx))] = 1.0
    return arr @ jnp.asarray(M, dtype)


def _take_v(v: V3, idx, n_src) -> V3:
    return V3(_onehot_take(v.x, idx, n_src, v.x.dtype),
              _onehot_take(v.y, idx, n_src, v.y.dtype),
              _onehot_take(v.z, idx, n_src, v.z.dtype))


def _tile_s(a, S):
    """(…, n) -> (…, S*n) sample-major tiling (S contiguous blocks)."""
    return jnp.concatenate([a] * S, axis=-1) if S > 1 else a


def _tile_v(v: V3, S) -> V3:
    return V3(_tile_s(v.x, S), _tile_s(v.y, S), _tile_s(v.z, S))


def _const(a, like):
    return jnp.asarray(np.asarray(a), like.dtype)


def _argmin_masks(vals, rounds):
    """k-smallest selection over a SAMPLE-MAJOR list of per-slice value
    arrays. Returns ``rounds`` lists of float 0/1 masks (one mask per
    slice; exactly one mask element set per position per round, ties
    broken toward the lowest slice index, matching a stable argsort)."""
    cur = list(vals)
    out = []
    for _ in range(rounds):
        m = cur[0]
        for v in cur[1:]:
            m = jnp.minimum(m, v)
        taken = None
        masks = []
        for v in cur:
            is_min = v == m
            sel = is_min if taken is None else (is_min & ~taken)
            taken = is_min if taken is None else (taken | is_min)
            masks.append(sel)
        out.append([s.astype(m.dtype) for s in masks])
        cur = [jnp.where(s, jnp.inf, v) for s, v in zip(masks, cur)]
    return out


def _mask_pick(masks, slices):
    """sum_s mask_s * slice_s (elementwise one-hot selection)."""
    acc = masks[0] * slices[0]
    for ms, sl in zip(masks[1:], slices[1:]):
        acc = acc + ms * sl
    return acc


def _mask_pick_v(masks, vslices):
    return V3(_mask_pick(masks, [v.x for v in vslices]),
              _mask_pick(masks, [v.y for v in vslices]),
              _mask_pick(masks, [v.z for v in vslices]))


def _capsule_entity_params(m, g, s):
    """Host-side (offset, local axis, radius, half-length) of the
    capsule entity for geom ``g`` (sub-capsule ``s`` >= 0, whole-mesh
    PCA proxy, or the primitive itself)."""
    mid = int(m.geom_meshid[g])
    if mid >= 0:
        from deepmimic_mujoco_tpu.utils import hostquat as hq

        mesh = m.meshes[mid]
        if s >= 0:
            cp, cq, cr, ch = mesh.sub_capsules[int(s)]
            return np.asarray(cp), hq.to_mat(cq)[:, 2], cr, ch
        return (np.asarray(mesh.capsule_pos),
                hq.to_mat(mesh.capsule_quat)[:, 2],
                mesh.capsule_size[0], mesh.capsule_size[1])
    return (np.zeros(3), np.array([0.0, 0.0, 1.0]),
            float(m.geom_size[g][0]), float(m.geom_size[g][1]))


class _Soa(NamedTuple):
    """Per-step SoA world-frame tables shared by all groups."""
    P: V3              # geom positions, components (ngeom,)
    cols: tuple        # 3 x V3: rotation columns R[:, :, j]

    def rot(self, local: V3) -> V3:
        """R @ local for per-geom/entity column sets."""
        c0, c1, c2 = self.cols
        return (c0.scale(local.x) + c1.scale(local.y)
                + c2.scale(local.z))


def _soa_from_kin(kin: Kin) -> _Soa:
    P = _vsplit(kin.geom_xpos)
    R = kin.geom_xmat
    cols = tuple(V3(R[..., 0, j], R[..., 1, j], R[..., 2, j])
                 for j in range(3))
    return _Soa(P=P, cols=cols)


class _FrameSide(NamedTuple):
    """Pair-side world frames taken to pair level (box/plane sides)."""
    p: V3
    cols: tuple        # 3 x V3

    def rot(self, local: V3) -> V3:
        c0, c1, c2 = self.cols
        return c0.scale(local.x) + c1.scale(local.y) + c2.scale(local.z)

    def rot_t(self, world: V3) -> V3:
        c0, c1, c2 = self.cols
        return V3(c0.dot(world), c1.dot(world), c2.dot(world))


def _frame_side(soa: _Soa, gids, ngeom) -> _FrameSide:
    return _FrameSide(
        p=_take_v(soa.P, gids, ngeom),
        cols=tuple(_take_v(c, gids, ngeom) for c in soa.cols))


class _CapSide(NamedTuple):
    """Pair-side capsule segments: world endpoints + static radius."""
    p0: V3
    p1: V3
    rad: np.ndarray    # static (npair,)


def _make_frame(n):
    """Orthonormal frame rows (n, t1, t2) from normals n (..., 3)."""
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.99,
                    jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
                    jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape))
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _seg_seg_soa(p1: V3, q1: V3, p2: V3, q2: V3):
    """Closest points between two segments (SoA transcription of the
    standard clamped-parameter form)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = d1.dot(d1)
    e = d2.dot(d2)
    f = d2.dot(r)
    c = d1.dot(r)
    b = d1.dot(d2)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12,
                  (b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > 1e-12, (b * s + f) / jnp.maximum(e, 1e-12), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(a > 1e-12,
                  jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0),
                  0.0)
    return p1 + d1.scale(s), p2 + d2.scale(t)


def _point_box_soa(pl: V3, sx, sy, sz):
    """Closest surface point + signed distance in the box frame; sizes
    are static per-pair arrays. All selection is where/one-hot
    arithmetic (tie faces averaged, matching the AoS original)."""
    cl = V3(jnp.clip(pl.x, -sx, sx), jnp.clip(pl.y, -sy, sy),
            jnp.clip(pl.z, -sz, sz))
    out_d = (pl - cl).norm()
    fx = sx - jnp.abs(pl.x)
    fy = sy - jnp.abs(pl.y)
    fz = sz - jnp.abs(pl.z)
    dmin = jnp.minimum(fx, jnp.minimum(fy, fz))
    is_out = out_d > 1e-12
    ox = (fx == dmin).astype(pl.x.dtype)
    oy = (fy == dmin).astype(pl.x.dtype)
    oz = (fz == dmin).astype(pl.x.dtype)
    cnt = jnp.maximum(ox + oy + oz, 1.0)
    ox, oy, oz = ox / cnt, oy / cnt, oz / cnt
    proj = V3(pl.x * (1 - ox) + jnp.where(pl.x >= 0, sx, -sx) * ox,
              pl.y * (1 - oy) + jnp.where(pl.y >= 0, sy, -sy) * oy,
              pl.z * (1 - oz) + jnp.where(pl.z >= 0, sz, -sz) * oz)
    closest = cl.where(is_out, proj)
    dist = jnp.where(is_out, out_d, -dmin)
    return closest, dist


def _normalized(dvec: V3, eps=1e-9) -> V3:
    return dvec.scale(1.0 / jnp.maximum(dvec.norm(), eps))


# ---------------- narrow phase (SoA, all groups) -----------------------

def _narrow_groups(m, tables: List[PairGroup], kin: Kin):
    """Returns a list of per-group (dist, pos V3, nrm V3), each
    flattened (nslot_grp * npair,) SAMPLE-MAJOR (slot-major blocks of
    npair, matching the metadata tiling in build_pair_tables)."""
    dtype = kin.xpos.dtype
    ngeom = kin.geom_xpos.shape[-2]
    soa = _soa_from_kin(kin)
    cst = lambda a: jnp.asarray(np.asarray(a, np.float32), dtype)

    # ---- capsule entity table shared across groups -------------------
    ent_index: Dict[tuple, int] = {}
    ent_keys = []

    def ent_ids(gids, subs):
        ids = []
        for g, s in zip(np.asarray(gids), np.asarray(subs)):
            k = (int(g), int(s))
            if k not in ent_index:
                ent_index[k] = len(ent_keys)
                ent_keys.append(k)
            ids.append(ent_index[k])
        return np.asarray(ids)

    cap_roles = {}
    for gi, grp in enumerate(tables):
        none = np.full(len(grp.g1), -1)
        if grp.kind == K_PLANE_CAPSULE:
            cap_roles[(gi, 2)] = ent_ids(grp.g2, none)
        elif grp.kind == K_SPHERE_CAPSULE:
            cap_roles[(gi, 2)] = ent_ids(grp.g2, grp.sub2)
        elif grp.kind == K_CAPSULE_CAPSULE:
            cap_roles[(gi, 1)] = ent_ids(grp.g1, grp.sub1)
            cap_roles[(gi, 2)] = ent_ids(grp.g2, grp.sub2)
        elif grp.kind == K_CAPSULE_BOX:
            cap_roles[(gi, 1)] = ent_ids(grp.g1, grp.sub1)

    if ent_keys:
        egids = [g for g, _ in ent_keys]
        pr = [_capsule_entity_params(m, g, s) for g, s in ent_keys]
        off = np.array([p[0] for p in pr])
        ax = np.array([p[1] for p in pr])
        erad = np.array([p[2] for p in pr])
        half = np.array([p[3] for p in pr])
        Pe = _take_v(soa.P, egids, ngeom)
        es = _Soa(P=Pe, cols=tuple(_take_v(c, egids, ngeom)
                                   for c in soa.cols))
        center = Pe + es.rot(V3(cst(off[:, 0]), cst(off[:, 1]),
                                cst(off[:, 2])))
        axis = es.rot(V3(cst(ax[:, 0]), cst(ax[:, 1]), cst(ax[:, 2])))
        hl = cst(half)
        ep0 = center - axis.scale(hl)
        ep1 = center + axis.scale(hl)
        nent = len(ent_keys)

    def cap_side(gi, side) -> _CapSide:
        ids = cap_roles[(gi, side)]
        return _CapSide(p0=_take_v(ep0, ids, nent),
                        p1=_take_v(ep1, ids, nent), rad=erad[ids])

    def plane_side(g1):
        return (_take_v(soa.cols[2], g1, ngeom),
                _take_v(soa.P, g1, ngeom))

    def vcat(vs):
        return V3(jnp.concatenate([v.x for v in vs], -1),
                  jnp.concatenate([v.y for v in vs], -1),
                  jnp.concatenate([v.z for v in vs], -1))

    out = []
    for gi, grp in enumerate(tables):
        kind, g1, g2 = grp.kind, grp.g1, grp.g2

        if kind == K_PLANE_SPHERE:
            n, pp = plane_side(g1)
            c = _take_v(soa.P, g2, ngeom)
            r = cst(m.geom_size[np.asarray(g2), 0])
            d = (c - pp).dot(n) - r
            cp = c - n.scale(r + d / 2)
            out.append((d, cp, n))
            continue

        if kind == K_PLANE_CAPSULE:
            n, pp = plane_side(g1)
            cs = cap_side(gi, 2)
            r = cst(cs.rad)
            ds, cps = [], []
            for end in (cs.p1, cs.p0):   # (+axis, -axis) end order
                dk = (end - pp).dot(n) - r
                ds.append(dk)
                cps.append(end - n.scale(r + dk / 2))
            out.append((jnp.concatenate(ds, -1), vcat(cps),
                        _tile_v(n, 2)))
            continue

        if kind in (K_PLANE_BOX, K_PLANE_MESH):
            n, pp = plane_side(g1)
            fb = _frame_side(soa, g2, ngeom)
            if kind == K_PLANE_BOX:
                s = np.asarray(m.geom_size[np.asarray(g2)])
                locs = [(sx * s[:, 0], sy * s[:, 1], sz * s[:, 2])
                        for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)]
            else:
                Kv = max(len(m.meshes[int(m.geom_meshid[g])].verts)
                         for g in np.asarray(g2))
                verts = np.zeros((len(np.asarray(g2)), Kv, 3))
                for i, g in enumerate(np.asarray(g2)):
                    v = m.meshes[int(m.geom_meshid[g])].verts
                    verts[i, :len(v)] = v
                    verts[i, len(v):] = v[0]
                locs = [(verts[:, k, 0], verts[:, k, 1], verts[:, k, 2])
                        for k in range(Kv)]
            # h = (c - pp)·n + v·(R^T n): pair-level base + static verts
            base = (fb.p - pp).dot(n)
            w = fb.rot_t(n)
            hs, pts = [], []
            for lx, ly, lz in locs:
                lv = V3(cst(lx), cst(ly), cst(lz))
                hs.append(base + lv.dot(w))
                pts.append(fb.p + fb.rot(lv))
            masks = _argmin_masks(hs, 4)
            ds, cps = [], []
            for mk in masks:
                dj = _mask_pick(mk, hs)
                pj = _mask_pick_v(mk, pts)
                ds.append(dj)
                cps.append(pj - n.scale(dj / 2))
            out.append((jnp.concatenate(ds, -1), vcat(cps),
                        _tile_v(n, 4)))
            continue

        if kind == K_SPHERE_SPHERE:
            c1 = _take_v(soa.P, g1, ngeom)
            c2 = _take_v(soa.P, g2, ngeom)
            r1 = cst(m.geom_size[np.asarray(g1), 0])
            r2 = cst(m.geom_size[np.asarray(g2), 0])
            dvec = c2 - c1
            nrm = _normalized(dvec)
            d = dvec.norm() - (r1 + r2)
            out.append((d, c1 + nrm.scale(r1 + d / 2), nrm))
            continue

        if kind == K_SPHERE_CAPSULE:
            c1 = _take_v(soa.P, g1, ngeom)
            r1 = cst(m.geom_size[np.asarray(g1), 0])
            cs = cap_side(gi, 2)
            seg = cs.p1 - cs.p0
            e = seg.dot(seg)
            t = jnp.clip(jnp.where(
                e > 1e-12, (c1 - cs.p0).dot(seg) / jnp.maximum(e, 1e-12),
                0.0), 0.0, 1.0)
            cb = cs.p0 + seg.scale(t)
            dvec = cb - c1
            nrm = _normalized(dvec)
            d = dvec.norm() - (r1 + cst(cs.rad))
            out.append((d, c1 + nrm.scale(r1 + d / 2), nrm))
            continue

        if kind == K_CAPSULE_CAPSULE:
            ca_s = cap_side(gi, 1)
            cb_s = cap_side(gi, 2)
            ca, cb = _seg_seg_soa(ca_s.p0, ca_s.p1, cb_s.p0, cb_s.p1)
            dvec = cb - ca
            nrm = _normalized(dvec)
            ra, rb = cst(ca_s.rad), cst(cb_s.rad)
            d = dvec.norm() - (ra + rb)
            out.append((d, ca + nrm.scale(ra + d / 2), nrm))
            continue

        if kind == K_SPHERE_BOX:
            c1 = _take_v(soa.P, g1, ngeom)
            r1 = cst(m.geom_size[np.asarray(g1), 0])
            fb = _frame_side(soa, g2, ngeom)
            s = np.asarray(m.geom_size[np.asarray(g2)])
            pl = fb.rot_t(c1 - fb.p)
            closest, dsurf = _point_box_soa(
                pl, cst(s[:, 0]), cst(s[:, 1]), cst(s[:, 2]))
            cw = fb.p + fb.rot(closest)
            nrm = _normalized(cw - c1)
            nrm = nrm.scale(jnp.where(dsurf < 0, -1.0, 1.0))
            d = dsurf - r1
            out.append((d, cw - nrm.scale(d / 2), nrm))
            continue

        if kind == K_CAPSULE_BOX:
            cs = cap_side(gi, 1)
            fb = _frame_side(soa, g2, ngeom)
            s = np.asarray(m.geom_size[np.asarray(g2)])
            sx, sy, sz = cst(s[:, 0]), cst(s[:, 1]), cst(s[:, 2])
            p0l = fb.rot_t(cs.p0 - fb.p)
            dl = fb.rot_t(cs.p1 - cs.p0)
            S = 8
            dsurfs, closests, tvals = [], [], []
            for k in range(S):
                t = k / (S - 1.0)
                plk = p0l + dl.scale(t)
                ck, dk = _point_box_soa(plk, sx, sy, sz)
                dsurfs.append(dk)
                closests.append(ck)
                tvals.append(jnp.full_like(dk, t))
            mk = _argmin_masks(dsurfs, 1)[0]
            dbest = _mask_pick(mk, dsurfs)
            clbest = _mask_pick_v(mk, closests)
            tbest = _mask_pick(mk, tvals)
            pbest = cs.p0 + (cs.p1 - cs.p0).scale(tbest)
            cw = fb.p + fb.rot(clbest)
            nrm = _normalized(cw - pbest)
            nrm = nrm.scale(jnp.where(dbest < 0, -1.0, 1.0))
            d = dbest - cst(cs.rad)
            out.append((d, cw - nrm.scale(d / 2), nrm))
            continue

        if kind == K_BOX_BOX:
            fa = _frame_side(soa, g1, ngeom)
            fb = _frame_side(soa, g2, ngeom)
            sa = np.asarray(m.geom_size[np.asarray(g1)])
            sb = np.asarray(m.geom_size[np.asarray(g2)])

            def corners_vs(fsrc, ssrc, fdst, sdst):
                pts, cws, dss = [], [], []
                for cx in (-1, 1):
                    for cy in (-1, 1):
                        for cz in (-1, 1):
                            lv = V3(cst(cx * ssrc[:, 0]),
                                    cst(cy * ssrc[:, 1]),
                                    cst(cz * ssrc[:, 2]))
                            pw = fsrc.p + fsrc.rot(lv)
                            pl = fdst.rot_t(pw - fdst.p)
                            ck, dk = _point_box_soa(
                                pl, cst(sdst[:, 0]), cst(sdst[:, 1]),
                                cst(sdst[:, 2]))
                            pts.append(pw)
                            cws.append(fdst.p + fdst.rot(ck))
                            dss.append(dk)
                return pts, cws, dss

            ptsA, cwA, dA = corners_vs(fa, sa, fb, sb)
            ptsB, cwB, dB = corners_vs(fb, sb, fa, sa)
            pts = ptsA + ptsB
            cws = cwA + cwB
            dss = dA + dB
            flips = ([jnp.ones_like(dA[0])] * 8
                     + [-jnp.ones_like(dA[0])] * 8)
            masks = _argmin_masks(dss, 4)
            ds, cps, nrs = [], [], []
            for mk in masks:
                dj = _mask_pick(mk, dss)
                pj = _mask_pick_v(mk, pts)
                cj = _mask_pick_v(mk, cws)
                fj = _mask_pick(mk, flips)
                nrm = _normalized((cj - pj).scale(fj))
                nrm = nrm.scale(jnp.where(dj < 0, -1.0, 1.0))
                ds.append(dj)
                cps.append((pj + cj).scale(0.5))
                nrs.append(nrm)
            out.append((jnp.concatenate(ds, -1), vcat(cps), vcat(nrs)))
            continue

        raise NotImplementedError(kind)
    return out


# ---------------- main entry ------------------------------------------

def collide(m: PhysicsModel, tables: List[PairGroup], kin: Kin,
            max_contacts: int) -> Contacts:
    """Narrow phase over all groups, then top-K deepest selection."""
    dtype = kin.xpos.dtype
    dists, pxs, nxs = [], [], []
    meta = {k: [] for k in ("g1", "g2", "margin", "friction", "solref",
                            "solimp", "condim")}
    for grp, (d, p, nr) in zip(tables, _narrow_groups(m, tables, kin)):
        if np.any(grp.gap < 0):
            d = d - jnp.asarray(grp.gap, dtype)  # widen proxy rest gaps
        dists.append(d)
        pxs.append(p)
        nxs.append(nr)
        ns = _SLOTS[grp.kind]
        meta["g1"].append(np.tile(grp.g1, ns))
        meta["g2"].append(np.tile(grp.g2, ns))
        for k in ("margin", "friction", "solref", "solimp", "condim"):
            meta[k].append(getattr(grp, k))

    dist = jnp.concatenate(dists, -1)
    pos = V3(jnp.concatenate([v.x for v in pxs], -1),
             jnp.concatenate([v.y for v in pxs], -1),
             jnp.concatenate([v.z for v in pxs], -1))
    normal = V3(jnp.concatenate([v.x for v in nxs], -1),
                jnp.concatenate([v.y for v in nxs], -1),
                jnp.concatenate([v.z for v in nxs], -1))
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

    frame = _make_frame(jnp.stack(
        [sel @ normal.x, sel @ normal.y, sel @ normal.z], axis=-1))
    cat = lambda key: np.concatenate(meta[key])
    int_sel = lambda key: (sel @ jnp.asarray(cat(key), dtype)
                           + 0.5).astype(jnp.int32)
    return Contacts(
        dist=sel @ dist,
        pos=jnp.stack([sel @ pos.x, sel @ pos.y, sel @ pos.z], axis=-1),
        frame=frame,
        geom1=int_sel("g1"),
        geom2=int_sel("g2"),
        includemargin=sel @ margin,
        friction=sel @ jnp.asarray(cat("friction"), dtype),
        solref=sel @ jnp.asarray(cat("solref"), dtype),
        solimp=sel @ jnp.asarray(cat("solimp"), dtype),
        condim=int_sel("condim"),
        overflow=overflow,
        slot_idx=idx.astype(jnp.int32),
    )


def geom_pair_contact_flags(contacts: Contacts, gid_a, gid_b):
    """1.0 if any active contact touches both geom sets (replaces the
    reference's name-string matching, src/deepmimic_env.py:88-101)."""
    active = contacts.dist < contacts.includemargin
    in_a = jnp.isin(contacts.geom1, gid_a) | jnp.isin(contacts.geom2, gid_a)
    in_b = jnp.isin(contacts.geom1, gid_b) | jnp.isin(contacts.geom2, gid_b)
    return (active & in_a & in_b).any().astype(contacts.dist.dtype)
