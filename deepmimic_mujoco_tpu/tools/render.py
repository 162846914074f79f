"""Host-side visualization (not on the TPU hot path).

Replaces the reference's native OpenGL viewer (reference:
src/deepmimic_env.py:527-538) with a dependency-light matplotlib
rasterizer over the framework's own FK: primitives are drawn as
projected discs/segments, good enough for eval dashboards and clip
inspection videos. ``mode="rgb_array"`` returns an HxWx3 uint8 frame
with the reference's episode-length/reward overlay.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from deepmimic_mujoco_tpu.models.physics_model import (
    BOX, CAPSULE, CYLINDER, MESH, PLANE, SPHERE,
)

_FIG_CACHE = {}


def render_state(model, qpos, mode: Optional[str] = None,
                 overlay: str = "", width: int = 480, height: int = 480,
                 azimuth: float = 35.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.physics import fwd_kinematics

    kin = fwd_kinematics(model, jnp.asarray(np.asarray(qpos, np.float32)))
    gx = np.asarray(kin.geom_xpos)
    gm = np.asarray(kin.geom_xmat)

    key = (width, height)
    if key not in _FIG_CACHE:
        fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
        ax = fig.add_subplot(111, projection="3d")
        _FIG_CACHE[key] = (fig, ax)
    fig, ax = _FIG_CACHE[key]
    ax.clear()

    root = gx[1] if model.ngeom > 1 else np.zeros(3)
    for g in range(model.ngeom):
        t = int(model.geom_type[g])
        size = model.geom_size[g]
        c = gx[g]
        if t == PLANE:
            xx, yy = np.meshgrid(np.linspace(root[0] - 2, root[0] + 2, 2),
                                 np.linspace(root[1] - 2, root[1] + 2, 2))
            ax.plot_surface(xx, yy, np.zeros_like(xx), alpha=0.15,
                            color="green")
        elif t == SPHERE:
            ax.scatter(*c, s=(size[0] * 400) ** 2 * 0.25, color="tab:brown",
                       alpha=0.8)
        elif t in (CAPSULE, CYLINDER):
            axis = gm[g][:, 2] * size[1]
            p0, p1 = c - axis, c + axis
            ax.plot(*zip(p0, p1), lw=max(1, size[0] * 100),
                    color="tab:brown", solid_capstyle="round", alpha=0.9)
        elif t == BOX:
            corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                                for sy in (-1, 1) for sz in (-1, 1)])
            pts = c + corners * size @ gm[g].T
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=4,
                       color="tab:orange")
        elif t == MESH:
            ax.scatter(*c, s=16, color="tab:gray", alpha=0.5)

    ax.set_xlim(root[0] - 1.2, root[0] + 1.2)
    ax.set_ylim(root[1] - 1.2, root[1] + 1.2)
    ax.set_zlim(0, 2.2)
    ax.view_init(elev=12, azim=azimuth)
    ax.set_axis_off()
    if overlay:
        ax.text2D(0.05, 0.95, overlay, transform=ax.transAxes,
                  color="black", fontsize=10, family="monospace")

    if mode == "rgb_array" or mode is None:
        fig.canvas.draw()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        w, h = fig.canvas.get_width_height()
        return buf.reshape(h, w, 4)[..., :3].copy()
    if mode == "human":
        import matplotlib.pyplot as plt  # pragma: no cover
        plt.pause(0.001)
        return None
    raise ValueError(f"unknown render mode {mode}")


def frames_to_video(frames, path, fps: int = 24):
    """Assemble frames into an mp4 (reference uses OpenCV for the eval
    dashboard videos, src/sb3_ppo.py:86-99)."""
    import cv2

    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                          fps if len(frames) > 10 else 1, (w, h))
    for f in frames:
        out.write(f[..., ::-1])  # rgb -> bgr
    out.release()
    return path
