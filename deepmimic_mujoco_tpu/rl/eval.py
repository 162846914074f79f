"""Eval dashboard: deterministic rollout -> 2x2 figure video + CSV.

Mirrors the reference's eval pipeline (reference: src/sb3_ppo.py:25-140):
per-step panel of (actions, rendered frame, reward/value curves, obs),
mp4 assembly, CSV episode log with reward/length plots, and best-
checkpoint saving. The rollout itself is one jitted scan on device; only
figure drawing is host-side. A threaded wrapper mirrors the reference's
EvalDashboardCallbackThreaded (src/sb3_ppo.py:160-230) for training
loops that want eval off the critical path.
"""
from __future__ import annotations

import os
import queue
import threading
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.rl import networks


def eval_rollout(ppo, params, env=None, max_steps: int = 1000, seed: int = 0,
                 idx_init: Optional[int] = None):
    """Deterministic episode; returns dict of stacked host arrays.

    ``idx_init=None`` uses reference-state initialization like the
    reference's eval (a pinned frame 0 is a standing start the policy
    never trains from and badly underestimates performance).

    The whole episode is ONE jitted ``lax.scan`` (single device
    dispatch): the per-step host round-trips of a Python loop made each
    eval steal seconds of device time from the training stream. After
    ``done`` the carry is frozen and the remaining steps are no-ops;
    the host slices the trajectory to the episode length.
    """
    env = env or ppo.env
    episode = _episode_fn(ppo, env, idx_init, max_steps)
    traj = jax.tree.map(np.asarray, episode(params, jax.random.PRNGKey(seed)))
    ep_len = int(traj.pop("alive").sum())
    out = {k: v[:ep_len] for k, v in traj.items()}
    out["ep_rew"] = float(traj["reward"].sum())
    out["ep_len"] = ep_len
    return out


def _episode_fn(ppo, env, idx_init, max_steps: int):
    """jit the episode ONCE per (env, net, idx_init, max_steps) with
    params as an argument — re-jitting per eval paid a full 1000-step
    trace+compile (with params baked in as constants) every call."""
    cache = getattr(env, "_eval_episode_cache", None)
    if cache is None:
        cache = {}
        try:
            env._eval_episode_cache = cache
        except AttributeError:
            pass
    key = (id(ppo.net), idx_init, max_steps)
    if key in cache:
        return cache[key]

    if idx_init is None or not hasattr(env, "mocap_data_len"):
        reset = env.reset
    else:
        reset = lambda k: env.reset(k, idx_init=idx_init)  # noqa: E731

    @jax.jit
    def episode(params, key):
        state0, obs0 = reset(key)

        def scan_step(carry, _):
            state, obs, alive = carry
            mean, _, value = ppo.net.apply(params, obs)
            mean = networks.env_action(ppo.net, obs, mean)
            nstate, out = env.step(state, mean)
            alive_f = alive.astype(out.reward.dtype)
            rec = dict(obs=obs, action=mean, reward=out.reward * alive_f,
                       value=value, qpos=nstate.qpos,
                       done_reason=out.done_reason, alive=alive)
            next_alive = alive & ~out.done
            # freeze the carry once the episode has ended
            state = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, next_alive), rec

        _, traj = jax.lax.scan(
            scan_step, (state0, obs0, jnp.ones((), bool)), None,
            length=max_steps)
        return traj

    cache[key] = episode
    return episode


def eval_dashboard_rollout(ppo, params, n: int, run_name: str,
                           out_dir: str = "~/deep_mimic",
                           render: bool = True, max_steps: int = 1000,
                           metrics_cb=None):
    """Rollout + dashboard video + CSV + best-checkpoint, like the
    reference's eval_dashboard_rollout."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepmimic_mujoco_tpu.rl import checkpoint
    from deepmimic_mujoco_tpu.tools.render import frames_to_video, render_state

    # Acyclic (getup) clips: evaluate from frame 0 like the reference's
    # play scripts (src/play_g1_facedown_slow_pretty_totem.py:26-27) —
    # an RSI eval start lands mid-clip, truncates at the acyclic end,
    # and wildly underreports (observed: the round-3 getup run's best
    # checkpoint scored 9.7 under RSI eval but 58.5 from frame 0).
    # Cyclic motions keep RSI starts (frame 0 is never trained from).
    idx0 = 0 if getattr(ppo.env, "is_acyclical", False) else None
    tr = eval_rollout(ppo, params, max_steps=max_steps, idx_init=idx0)
    video_dir = os.path.expanduser(os.path.join(out_dir, run_name + "_videos"))
    os.makedirs(video_dir, exist_ok=True)

    if render:
        frames = []
        T = tr["ep_len"]
        rng = range(0, T, max(1, T // 240))  # bound video length
        cum = np.cumsum(tr["reward"])
        for i in rng:
            # 320x240 keeps the single-core ray tracer at ~0.3 s/frame
            # (the dashboard subplot shows it small anyway)
            frame = render_state(ppo.env.model, tr["qpos"][i],
                                 mode="rgb_array", width=320, height=240,
                                 overlay=f"{i:>5} {cum[i]:>8.2f}")
            fig, ax = plt.subplots(2, 2, num="eval", figsize=(8, 6))
            ax[0, 0].axhline(0, color="black", lw=1)
            ax[0, 0].step(np.arange(tr["action"].shape[1]), tr["action"][i],
                          where="mid")
            ax[0, 0].set_title("actions")
            ax[0, 1].imshow(frame)
            ax[0, 1].axis("off")
            ax[1, 0].plot(cum[:i + 1], label="ep_rew")
            ax[1, 0].plot(tr["reward"][:i + 1], label="r")
            ax[1, 0].plot(tr["value"][:i + 1], label="V")
            ax[1, 0].legend(fontsize=6)
            ax[1, 1].step(np.arange(tr["obs"].shape[1]), tr["obs"][i],
                          where="mid")
            ax[1, 1].set_title("obs")
            fig.canvas.draw()
            buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
            w, h = fig.canvas.get_width_height()
            frames.append(buf.reshape(h, w, 4)[..., :3].copy())
            plt.close(fig)
        video_path = os.path.join(video_dir, f"global_step_{n}.mp4")
        frames_to_video(frames, video_path)
        print("Saved video to", video_path)

    # CSV episode log + plots (reference: src/sb3_ppo.py:101-126)
    log_path = os.path.join(video_dir, "log.csv")
    if not os.path.exists(log_path):
        with open(log_path, "w") as f:
            f.write("global_step,ep_len,ep_rew\n")
    with open(log_path, "a") as f:
        f.write(f"{n},{tr['ep_len']},{tr['ep_rew']}\n")
    log = np.loadtxt(log_path, delimiter=",", skiprows=1).reshape(-1, 3)
    for col, name in [(2, "rew_plot.png"), (1, "len_plot.png")]:
        fig, ax = plt.subplots(1, 1)
        ax.plot(log[:, 0], log[:, col])
        ax.set_xlabel("Global Step")
        fig.savefig(os.path.join(video_dir, name))
        plt.close(fig)

    if metrics_cb is not None:
        metrics_cb({
            "eval_episode_length": tr["ep_len"],
            "eval_episode_reward": tr["ep_rew"],
            "eval_global_step": n,
            "eval_best_episode_reward": float(log[:, 2].max()),
        })

    # best-checkpoint saving (reference: src/sb3_ppo.py:137-138), plus
    # an always-current snapshot so mid-run policies can be probed or
    # warm-started without waiting for the final save
    if log[:, 2].max() == log[-1, 2]:
        checkpoint.save_params(
            os.path.join(video_dir, run_name + "_best"), params)
    checkpoint.save_params(
        os.path.join(video_dir, run_name + "_latest"), params)
    print(f"Eval: LEN {tr['ep_len']}, EP_REW {tr['ep_rew']:.2f}")
    return tr


class ThreadedEvaluator:
    """Runs eval jobs on a daemon worker thread against a frozen params
    copy (reference's EvalDashboardCallbackThreaded)."""

    def __init__(self, ppo, run_name: str, out_dir: str = "~/deep_mimic",
                 render: bool = True, metrics_cb=None):
        self.ppo = ppo
        self.run_name = run_name
        self.out_dir = out_dir
        self.render = render
        self.metrics_cb = metrics_cb
        self._q = queue.Queue(maxsize=1)
        self._busy = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            job = self._q.get()
            if job is None:       # shutdown sentinel (see stop())
                return
            params, n, render = job
            self._busy.set()
            try:
                eval_dashboard_rollout(self.ppo, params, n, self.run_name,
                                       out_dir=self.out_dir,
                                       render=render,
                                       metrics_cb=self.metrics_cb)
            except Exception as e:  # eval must never kill training
                print("Eval worker error:", e)
            finally:
                self._busy.clear()

    def queue_eval(self, params, n: int, wait: bool = True,
                   render: Optional[bool] = None):
        """``render=None`` -> the evaluator's default. Dashboard-video
        drawing is host-side but GIL-heavy (matplotlib); callers on a
        tight training loop should render only a subset of evals."""
        if wait:
            while self._busy.is_set():
                time.sleep(0.2)
        frozen = jax.tree.map(lambda x: np.asarray(x), params)
        self._q.put((frozen, n, self.render if render is None else render))

    def stop(self, wait: bool = True):
        """Drain and join the worker: killing the daemon thread at
        interpreter exit aborts an in-flight eval mid-video (observed
        as 'FATAL: exception not rethrown' from matplotlib teardown)."""
        if wait:
            while self._busy.is_set():
                time.sleep(0.2)
        self._q.put(None)
        self._thread.join(timeout=600)
