"""Crash-log replay: inspect a divergence dump.

Loads a ``/tmp/deepmimic_episode_*.json`` debug dump written by the env
wrapper on divergence, replays the recorded qpos trajectory (optional
video) and plots actions and root velocities (reference:
src/check_debug_log.py:1-47).

Usage: python -m deepmimic_mujoco_tpu.tools.check_debug_log <dump.json>
           [--video out.mp4] [--robot unitree_g1]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dump")
    p.add_argument("--video", default=None)
    p.add_argument("--plot", default="/tmp/debug_log_plots.png")
    args = p.parse_args(argv)

    with open(args.dump) as f:
        log = json.load(f)
    qpos = np.asarray(log["qpos"])
    actions = np.asarray(log.get("action", []))
    rewards = np.asarray(log.get("reward", []))
    robot = log.get("robot", "humanoid3d")
    print(f"dump: robot={robot} motion={log.get('motion')} "
          f"steps={len(qpos)}")
    print("traceback:", log.get("full_traceback", "")[:200])

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(3, 1, figsize=(10, 9))
    if len(actions):
        axs[0].plot(actions)
        axs[0].set_title("actions")
    axs[1].plot(qpos[:, :3])
    axs[1].set_title("root xyz")
    if len(rewards):
        axs[2].plot(rewards)
        axs[2].set_title("reward")
    fig.savefig(args.plot)
    print("plots saved to", args.plot)

    if args.video:
        from deepmimic_mujoco_tpu.models import assets, load_model
        from deepmimic_mujoco_tpu.tools.render import (
            frames_to_video, render_state,
        )

        model = load_model(assets.xml_path(robot))
        frames = [render_state(model, q, mode="rgb_array",
                               overlay=f"{i}")
                  for i, q in enumerate(qpos[::2])]
        print("Saved", frames_to_video(frames, args.video))


if __name__ == "__main__":
    main()
