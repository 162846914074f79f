"""Interactive viewer: live mocap playback and policy rollouts.

The reference inspects every behavior through a live MjViewer/GLFW
window (reference: src/deepmimic_env.py:527-538, used by
``loop_motion`` in src/mujoco/mocap_v2.py and every play_* script).
This is that capability for this framework, without requiring a GL
context: frames come from the native ray tracer
(``tools/render.py``) and are presented through a matplotlib window
with keyboard control. It works with any interactive matplotlib
backend (TkAgg/QtAgg/macosx); under a headless Agg backend the same
loop runs without a window, which is how the test suite drives it.

Usage::

    python -m deepmimic_mujoco_tpu.tools.view --motion walk
    python -m deepmimic_mujoco_tpu.tools.view --motion run \
        --robot unitree_g1 --checkpoint runs/..._best

Keys: space pause/resume - left/right step one frame while paused -
a/d orbit camera - w/s zoom - up/down playback speed - q quit.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


class Viewer:
    """Frame loop + camera/playback state.

    ``source`` is a callable ``(frame_idx) -> qpos`` (host numpy);
    the viewer owns azimuth/distance/pause/speed and renders through
    ``render_state``. Split from the window so tests can drive
    ``step_once``/``handle_key`` headless.
    """

    def __init__(self, model, source, overlay=None, width=480,
                 height=480, fps=30.0):
        self.model = model
        self.source = source
        self.overlay = overlay or (lambda i: f"frame {i}")
        self.width, self.height = width, height
        self.fps = fps
        self.azimuth = 155.0
        self.distance = 3.0
        self.paused = False
        self.speed = 1.0
        self.frame_idx = 0
        self.quit = False

    # ---- input ------------------------------------------------------
    def handle_key(self, key: str):
        if key == " ":
            self.paused = not self.paused
        elif key == "left" and self.paused:
            self.frame_idx = max(self.frame_idx - 1, 0)
        elif key == "right" and self.paused:
            self.frame_idx += 1
        elif key == "a":
            self.azimuth -= 10.0
        elif key == "d":
            self.azimuth += 10.0
        elif key == "w":
            self.distance = max(self.distance - 0.25, 0.75)
        elif key == "s":
            self.distance += 0.25
        elif key == "up":
            self.speed = min(self.speed * 1.5, 8.0)
        elif key == "down":
            self.speed = max(self.speed / 1.5, 0.125)
        elif key == "q":
            self.quit = True

    # ---- rendering --------------------------------------------------
    def step_once(self):
        """Advance (unless paused) and return the rendered frame."""
        from deepmimic_mujoco_tpu.tools.render import render_state

        qpos = self.source(self.frame_idx)
        frame = render_state(
            self.model, qpos, mode="rgb_array",
            overlay=self.overlay(self.frame_idx),
            width=self.width, height=self.height,
            azimuth_deg=self.azimuth, distance=self.distance)
        if not self.paused:
            self.frame_idx += 1
        return frame

    def run(self):  # pragma: no cover - needs an interactive backend
        import matplotlib
        import matplotlib.pyplot as plt

        interactive = matplotlib.get_backend().lower() not in (
            "agg", "pdf", "svg", "ps", "template")
        fig, ax = plt.subplots(figsize=(6, 6))
        fig.canvas.manager.set_window_title("deepmimic_mujoco_tpu")
        im = ax.imshow(self.step_once())
        ax.axis("off")
        fig.canvas.mpl_connect(
            "key_press_event", lambda ev: self.handle_key(ev.key))
        fig.canvas.mpl_connect(
            "close_event", lambda ev: setattr(self, "quit", True))
        while not self.quit:
            t0 = time.time()
            im.set_data(self.step_once())
            fig.canvas.draw_idle()
            if interactive:
                plt.pause(max(1.0 / (self.fps * self.speed)
                              - (time.time() - t0), 1e-3))
            else:
                break  # headless: single frame, no event loop
        plt.close(fig)


def mocap_source(env):
    """loop_motion equivalent (reference: src/mujoco/mocap_v2.py
    ``play`` / src/ani_mimic.py loop): cycle the clip's mocap qpos."""
    qpos = np.asarray(env.mocap_qpos)
    n = len(qpos)
    return lambda i: qpos[i % n], n


def policy_source(env, ckpt):
    """Live policy rollout (the reference's play_* scripts with
    render=True): deterministic actions, host-stepped one env."""
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(ckpt, tmpl)

    @jax.jit
    def step(state, obs):
        mean, _, _ = net.apply(params, obs)
        nstate, out = env.step_auto_reset(state, mean)
        return nstate, out

    state = {"s": None, "o": None}

    def src(i):
        if state["s"] is None or i == 0:
            state["s"], state["o"] = jax.jit(env.reset)(
                jax.random.PRNGKey(0))
        state["s"], out = step(state["s"], state["o"])
        state["o"] = out.obs
        return np.asarray(state["s"].qpos)

    return src


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--robot", default="humanoid3d")
    p.add_argument("--checkpoint", default=None,
                   help="policy checkpoint; omit for mocap playback")
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--fps", type=float, default=30.0)
    args = p.parse_args(argv)

    from deepmimic_mujoco_tpu.envs import DPEnv

    env = DPEnv(motion=args.motion, robot=args.robot)
    if args.checkpoint:
        src = policy_source(env, args.checkpoint)
        overlay = lambda i: f"{args.motion} policy step {i}"
    else:
        src, n = mocap_source(env)
        overlay = lambda i: f"{args.motion} frame {i % n}/{n}"
    Viewer(env.model, src, overlay, args.width, args.height,
           args.fps).run()


if __name__ == "__main__":
    main()
