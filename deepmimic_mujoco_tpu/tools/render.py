"""Host-side visualization (not on the TPU hot path).

Replaces the reference's native OpenGL viewer (reference:
src/deepmimic_env.py:527-538) with this framework's own native C++
ray-traced renderer (deepmimic_mujoco_tpu/native/rasterizer.cpp, built
on demand, loaded via ctypes) — no GL context required, suitable for
headless eval videos. Mesh geoms are ray-traced as their decimated
convex hulls (~60 triangles each, AABB-culled), so G1 eval videos show
real link geometry; if scipy's hull is unavailable they degrade to the
PCA proxy capsules. Falls back to a matplotlib sketch without a C++
toolchain.
``mode="rgb_array"`` returns an HxWx3 uint8 frame with the reference's
episode-length/reward overlay (cv2.putText, like src/deepmimic_env.py:536).
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from deepmimic_mujoco_tpu.models.physics_model import (
    BOX, CAPSULE, CYLINDER, MESH, PLANE, SPHERE,
)

_SCENE_CACHE = {}


def _mesh_hull_tris(mesh):
    """(nt, 3, 3) triangle soup of the mesh's decimated hull vertex set
    (already in the geom frame). None if scipy is unavailable."""
    try:
        from scipy.spatial import ConvexHull

        hull = ConvexHull(np.asarray(mesh.verts, np.float64))
        return np.asarray(mesh.verts, np.float32)[hull.simplices]
    except Exception:
        return None


def _scene_tables(model):
    """Static per-geom (type, size, rgba, proxy transforms, hull-
    triangle tables for mesh geoms)."""
    key = id(model)
    if key in _SCENE_CACHE:
        return _SCENE_CACHE[key]
    ngeom = model.ngeom
    gtype = np.zeros(ngeom, np.int32)
    size = np.asarray(model.geom_size, np.float32).copy()
    rgba = np.zeros((ngeom, 4), np.float32)
    proxy_pos = np.zeros((ngeom, 3), np.float32)
    proxy_quat = np.tile(np.array([1, 0, 0, 0], np.float32), (ngeom, 1))
    tri_off = np.zeros(ngeom, np.int32)
    tri_cnt = np.zeros(ngeom, np.int32)
    mesh_aabb = np.zeros((ngeom, 3), np.float32)
    tri_chunks = []
    ntri_total = 0
    palette = np.array([
        [0.76, 0.60, 0.42, 1.0],  # body tan
        [0.55, 0.55, 0.62, 1.0],  # metal
    ], np.float32)
    hull_cache = {}
    for g in range(ngeom):
        t = int(model.geom_type[g])
        if t == MESH:
            mid = int(model.geom_meshid[g])
            mesh = model.meshes[mid]
            if mid not in hull_cache:
                hull_cache[mid] = _mesh_hull_tris(mesh)
            tris = hull_cache[mid]
            if tris is not None:
                # true hull rendering (geom-frame tris; geom frame ==
                # mesh principal frame after MJCF compilation)
                gtype[g] = MESH
                tri_off[g] = ntri_total
                tri_cnt[g] = len(tris)
                mesh_aabb[g] = np.abs(
                    np.asarray(mesh.verts)).max(0) * 1.02 + 1e-3
                tri_chunks.append(tris.reshape(-1, 9))
                ntri_total += len(tris)
            else:  # scipy-less fallback: PCA proxy capsule
                gtype[g] = CAPSULE
                size[g, 0] = mesh.capsule_size[0]
                size[g, 1] = mesh.capsule_size[1]
                proxy_pos[g] = mesh.capsule_pos
                proxy_quat[g] = mesh.capsule_quat
            rgba[g] = palette[1]
        else:
            gtype[g] = t
            rgba[g] = palette[0] if t != PLANE else np.array(
                [0.45, 0.62, 0.45, 1.0], np.float32)
    tri_verts = (np.concatenate(tri_chunks, axis=0) if tri_chunks
                 else np.zeros((1, 9), np.float32))
    tables = (gtype, size, rgba, proxy_pos, proxy_quat,
              np.ascontiguousarray(tri_verts, np.float32), tri_off,
              tri_cnt, mesh_aabb)
    _SCENE_CACHE[key] = tables
    return tables


def render_state(model, qpos, mode: Optional[str] = None,
                 overlay: str = "", width: int = 480, height: int = 480,
                 azimuth_deg: float = 155.0, distance: float = 3.0):
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.physics import fwd_kinematics
    from deepmimic_mujoco_tpu.utils import hostquat as hq

    key = ("fk", id(model))
    if key not in _SCENE_CACHE:
        _SCENE_CACHE[key] = jax.jit(lambda q: fwd_kinematics(model, q))
    kin = _SCENE_CACHE[key](jnp.asarray(np.asarray(qpos, np.float32)))
    gx = np.asarray(kin.geom_xpos, np.float32)
    gm = np.asarray(kin.geom_xmat, np.float32)

    (gtype, size, rgba, proxy_pos, proxy_quat, tri_verts, tri_off,
     tri_cnt, mesh_aabb) = _scene_tables(model)
    # fold mesh proxy transforms into world frames (identity for
    # hull-rendered mesh geoms and primitives)
    pos = gx + np.einsum("nij,nj->ni", gm, proxy_pos)
    mats = gm @ hq.to_mat(proxy_quat.astype(np.float64)).astype(np.float32)

    root = np.asarray(qpos[:3], np.float32) if model.nq >= 3 else np.zeros(3)
    az = np.deg2rad(azimuth_deg)
    cam = (root + np.array([np.cos(az) * distance, np.sin(az) * distance,
                            1.0], np.float32)).astype(np.float32)
    tgt = (root + np.array([0, 0, 0.2], np.float32)).astype(np.float32)

    from deepmimic_mujoco_tpu.native import rasterizer_lib

    lib = rasterizer_lib()
    if lib:
        out = np.zeros((height, width, 3), np.uint8)
        fp = lambda a: np.ascontiguousarray(a, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float))
        ip = lambda a: np.ascontiguousarray(a, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32))
        lib.render_scene_mesh(
            fp(pos), fp(mats), ip(gtype),
            fp(size), fp(rgba), ctypes.c_int(model.ngeom),
            fp(tri_verts), ip(tri_off), ip(tri_cnt), fp(mesh_aabb),
            fp(cam), fp(tgt), ctypes.c_float(55.0),
            ctypes.c_int(width), ctypes.c_int(height),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        frame = out
    else:  # matplotlib fallback sketch
        frame = _matplotlib_fallback(model, pos, mats, gtype, size,
                                     root, width, height)

    if overlay:
        import cv2

        frame = frame.copy()
        cv2.putText(frame, overlay, (16, 28), cv2.FONT_HERSHEY_SIMPLEX,
                    0.7, (255, 255, 255), 2, cv2.LINE_AA)
    if mode in ("rgb_array", None):
        return frame
    if mode == "human":  # pragma: no cover - interactive
        import matplotlib.pyplot as plt

        plt.imshow(frame)
        plt.pause(0.001)
        return None
    raise ValueError(f"unknown render mode {mode}")


def _matplotlib_fallback(model, pos, mats, gtype, size, root,
                         width, height):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    for g in range(model.ngeom):
        if gtype[g] == PLANE:
            continue
        c = pos[g]
        if gtype[g] == SPHERE:
            ax.scatter(*c, s=(size[g, 0] * 400) ** 2 * 0.25,
                       color="tab:brown")
        elif gtype[g] in (CAPSULE, CYLINDER):
            axis = mats[g][:, 2] * size[g, 1]
            ax.plot(*zip(c - axis, c + axis), lw=max(1, size[g, 0] * 90),
                    color="tab:brown", solid_capstyle="round")
        elif gtype[g] == BOX:
            ax.scatter(*c, s=40, color="tab:orange", marker="s")
    ax.set_xlim(root[0] - 1.2, root[0] + 1.2)
    ax.set_ylim(root[1] - 1.2, root[1] + 1.2)
    ax.set_zlim(0, 2.2)
    ax.set_axis_off()
    fig.canvas.draw()
    buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
    w, h = fig.canvas.get_width_height()
    plt.close(fig)
    return buf.reshape(h, w, 4)[..., :3].copy()


def frames_to_video(frames, path, fps: int = 24):
    """Assemble frames into an mp4 (the reference uses OpenCV for the
    eval dashboard videos, src/sb3_ppo.py:86-99)."""
    import cv2

    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                          fps if len(frames) > 10 else 1, (w, h))
    for f in frames:
        out.write(f[..., ::-1])  # rgb -> bgr
    out.release()
    return path
