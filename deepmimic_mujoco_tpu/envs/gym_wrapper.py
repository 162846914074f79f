"""Host-facing single-env wrapper with the reference's gym-style API.

Gives a user of the reference's DPEnv the familiar surface —
``reset()``, ``reset_model(idx_init)``, ``step(action,
force_state=None)`` returning ``(obs, reward, done, info)`` with reward
components and ``done_reason`` in ``info`` (reference:
src/deepmimic_env.py:273-538) — on top of the functional TPU env. Also
maintains the episode debug log and writes the JSON crash dump on
divergence, mirroring src/deepmimic_env.py:366-378, :457-476.

This wrapper is for interactive use, playback and tools; training runs
on the functional API (vmap + scan) instead.
"""
from __future__ import annotations

import json
import time
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs.dp_env import DONE_REASON_NAMES, DPEnv


class Box(NamedTuple):
    low: np.ndarray
    high: np.ndarray

    @property
    def shape(self):
        return self.low.shape

    def sample(self, rng=np.random):
        return rng.uniform(self.low, self.high)


class GymDPEnv:
    def __init__(self, motion: Optional[str] = None,
                 robot: str = "humanoid3d", seed: int = 0,
                 crash_dump_dir: str = "/tmp", **kwargs):
        self.env = DPEnv(motion=motion, robot=robot, **kwargs)
        self.version = self.env.version
        self.ENV_CFG = self.env.ENV_CFG
        self.model = self.env.model
        self.mocap = self.env.clip
        self.mocap_data_len = self.env.mocap_data_len
        self.crash_dump_dir = crash_dump_dir

        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._jit_step = jax.jit(self.env.step)
        self._jit_step_force = jax.jit(
            lambda s, a, q, v: self.env.step(s, a, force_state=(q, v)))
        self._jit_reset_idx = jax.jit(
            lambda k, i: self.env.reset(k, idx_init=i))
        self._jit_reset = jax.jit(self.env.reset)

        # reference DPEnv: raw ctrlrange of the first N motors (hand
        # motors dropped), NOT scaled (src/deepmimic_env.py:305-307)
        n = self.env.action_size
        cr = np.asarray(self.model.actuator_ctrlrange, np.float32)[:n]
        self.action_space = Box(low=cr[:, 0].copy(), high=cr[:, 1].copy())
        self.observation_space = Box(
            low=np.full(self.env.obs_size, -np.inf, np.float32),
            high=np.full(self.env.obs_size, np.inf, np.float32))

        self.episode_debug_log = {}

    # ---- reference-compatible properties -------------------------------
    @property
    def idx_curr(self):
        return int(self._state.idx_curr) if self._state is not None else -1

    @property
    def episode_reward(self):
        return float(self._state.episode_reward) if self._state is not None else 0.0

    @property
    def episode_length(self):
        return int(self._state.episode_length) if self._state is not None else 0

    @property
    def sim_qpos(self):
        return np.asarray(self._state.qpos)

    @property
    def sim_qvel(self):
        return np.asarray(self._state.qvel)

    # ---- API ------------------------------------------------------------
    def reset(self):
        self.episode_debug_log = {}
        return self.reset_model()

    def reset_model(self, idx_init: Optional[int] = None):
        self._key, sub = jax.random.split(self._key)
        if idx_init is None:
            self._state, obs = self._jit_reset(sub)
        else:
            self._state, obs = self._jit_reset_idx(
                sub, jnp.asarray(idx_init, jnp.int32))
        return np.asarray(obs)

    def step(self, action, force_state=None):
        a = jnp.asarray(np.asarray(action, np.float32))
        if force_state is not None:
            q, v = force_state
            self._state, out = self._jit_step_force(
                self._state, a, jnp.asarray(np.asarray(q, np.float32)),
                jnp.asarray(np.asarray(v, np.float32)))
        else:
            self._state, out = self._jit_step(self._state, a)
        obs = np.asarray(out.obs)
        reward = float(out.reward)
        done = bool(out.done)
        ri = out.reward_info
        info = {
            "reward_config": float(ri.reward_config),
            "reward_qvel": float(ri.reward_qvel),
            "reward_end_eff": float(ri.reward_end_eff),
            "reward_com": float(ri.reward_com),
            "reward_joint_limit": float(ri.reward_joint_limit),
        }
        reason = DONE_REASON_NAMES[int(out.done_reason)]
        if reason:
            info["done_reason"] = reason

        # episode debug log (reference: src/deepmimic_env.py:457-463)
        log = self.episode_debug_log
        log.setdefault("action", []).append(np.asarray(action).tolist())
        log.setdefault("qpos", []).append(self.sim_qpos.tolist())
        log.setdefault("qvel", []).append(self.sim_qvel.tolist())
        log.setdefault("reward", []).append(reward)

        if reason == "obs_out_of_bounds":
            self._write_crash_dump("Observation out of bounds or "
                                   "simulation divergence")
        return obs, reward, done, info

    def goto(self, qpos):
        """Force qpos with zero velocity (reference: src/deepmimic_env.py:489)."""
        q = jnp.asarray(np.asarray(qpos, np.float32))
        v = jnp.zeros(self.model.nv, jnp.float32)
        self._state = self._state._replace(qpos=q, qvel=v)

    def get_time(self):
        return self.episode_length * self.env.engine.dt

    def close(self):
        pass

    def render(self, mode=None):
        from deepmimic_mujoco_tpu.tools.render import render_state
        return render_state(self.model, self.sim_qpos, mode=mode,
                            overlay=f"{self.episode_length:>5} "
                                    f"{self.episode_reward:>7.2f}")

    # ---- crash forensics -------------------------------------------------
    def _write_crash_dump(self, message):
        path = "{}/deepmimic_episode_{}.json".format(
            self.crash_dump_dir, time.strftime("%Y%m%d-%H%M_%S"))
        self.episode_debug_log["full_traceback"] = message
        self.episode_debug_log["motion"] = self.env.motion_config.motion
        self.episode_debug_log["robot"] = self.env.robot_config.robot
        with open(path, "w") as f:
            json.dump(self.episode_debug_log, f, indent=4)
        print(f"Divergence detected, debug log written to {path}")
        return path


class GymDPCombinedEnv:
    """Host-facing wrapper for the combined env, mirroring the
    reference's DPCombinedEnv gym surface (reset/step/render,
    imitation/task rewards in info; src/combined_env.py:102-533)."""

    def __init__(self, seed: int = 0, **kwargs):
        from deepmimic_mujoco_tpu.envs.combined_env import (
            DPCombinedEnv, MOTION_NAMES,
        )

        self.env = DPCombinedEnv(**kwargs)
        self.version = self.env.version
        self.ENV_CFG = self.env.ENV_CFG
        self.model = self.env.model
        self._motion_names = MOTION_NAMES
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._jit_reset = jax.jit(self.env.reset)
        self._jit_step = jax.jit(self.env.step)
        self._jit_step_force = jax.jit(
            lambda s, a, q, v: self.env.step(s, a, force_state=(q, v)))
        # reference combined env: ctrlrange / ACT_SCALE
        # (src/combined_env.py:196-200)
        n = self.env.action_size
        cr = np.asarray(self.model.actuator_ctrlrange, np.float32)[:n]
        s = self.ENV_CFG.ACT_SCALE
        self.action_space = Box(low=cr[:, 0] / s, high=cr[:, 1] / s)
        self.observation_space = Box(
            low=np.full(self.env.obs_size, -np.inf, np.float32),
            high=np.full(self.env.obs_size, np.inf, np.float32))

    @property
    def current_motion_name(self):
        return self._motion_names[int(self._state.motion_id)]

    @property
    def episode_reward(self):
        return float(self._state.episode_reward) if self._state else 0.0

    @property
    def episode_length(self):
        return int(self._state.episode_length) if self._state else 0

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._jit_reset(sub)
        return np.asarray(obs)

    def get_current_motion_state(self):
        q, v = self.env.get_current_motion_state(self._state)
        return np.asarray(q), np.asarray(v)

    def step(self, action, force_state=None):
        a = jnp.asarray(np.asarray(action, np.float32))
        if force_state is not None:
            q, v = force_state
            self._state, out = self._jit_step_force(
                self._state, a, jnp.asarray(np.asarray(q, np.float32)),
                jnp.asarray(np.asarray(v, np.float32)))
        else:
            self._state, out = self._jit_step(self._state, a)
        info = {
            "imitation_reward": float(out.imitation_reward),
            "task_reward": float(out.task_reward),
        }
        reason = DONE_REASON_NAMES.get(int(out.done_reason))
        if int(out.done_reason) == 10:
            reason = "fallen without amnesty"
        if reason:
            info["done_reason"] = reason
        return (np.asarray(out.obs), float(out.reward), bool(out.done),
                info)

    def render(self, mode=None):
        from deepmimic_mujoco_tpu.tools.render import render_state

        return render_state(
            self.model, np.asarray(self._state.qpos), mode=mode,
            overlay=f"{self.current_motion_name[-8:]} "
                    f"{self.episode_length:>5} {self.episode_reward:>7.2f}")

    def close(self):
        pass
