"""Single-motion imitation env (DPEnv), TPU-native.

Functionally equivalent to the reference's DPEnv (reference:
src/deepmimic_env.py:273-538) — torque control with action scaling,
DeepMimic imitation reward, reference-state initialization (RSI), early
termination, divergence/obs-out-of-bounds guards — but redesigned as a
pure function of an explicit state:

    state' , out = env.step(state, action)

so that thousands of envs run under ``vmap``, the whole step is one
XLA program, and auto-reset happens on device (no gym loop, no
subprocess workers). Host-facing gym-style wrappers live in
``envs.gym_wrapper``.

Divergence handling: the reference catches native-engine exceptions and
writes a JSON dump (src/deepmimic_env.py:366-378). Inside jit nothing
raises; non-finite state or |obs|>100 zeroes the observation and
terminates with a machine-readable done_reason, and the host-side crash
logger (envs/gym_wrapper.py `_dump_crash_log`) mirrors the JSON dump
behavior; tools/check_debug_log.py replays the dumps.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import obs as obs_lib
from deepmimic_mujoco_tpu.envs import reward as reward_lib
from deepmimic_mujoco_tpu.envs.config import DPEnvConfig, MotionConfig, RobotConfig
from deepmimic_mujoco_tpu.envs.spec import RobotSpec
from deepmimic_mujoco_tpu.mocap import load_clip
from deepmimic_mujoco_tpu.models import load_model
from deepmimic_mujoco_tpu.physics.kinematics import com_pos, com_vel, fwd_kinematics
from deepmimic_mujoco_tpu.physics.collision import collide
from deepmimic_mujoco_tpu.physics.step import Engine, EngineData

# done_reason codes (info["done_reason"] strings in the reference)
DONE_NONE = 0
DONE_LOW_Z = 1
DONE_HIGH_Z = 2
DONE_RUN_ROLL = 3
DONE_RUN_PITCH = 4
DONE_MAX_EP_LEN = 5
DONE_ACYCLICAL_END = 6
DONE_OBS_OOB = 7

DONE_REASON_NAMES = {
    DONE_NONE: "", DONE_LOW_Z: "low_z", DONE_HIGH_Z: "high_z",
    DONE_RUN_ROLL: "run roll limit", DONE_RUN_PITCH: "run pitch limit",
    DONE_MAX_EP_LEN: "max_ep_len", DONE_ACYCLICAL_END: "acyclical_end",
    DONE_OBS_OOB: "obs_out_of_bounds",
}


class DPEnvState(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    idx_curr: jnp.ndarray        # i32 current mocap frame
    episode_length: jnp.ndarray  # i32
    episode_reward: jnp.ndarray  # f32
    key: jnp.ndarray             # PRNG for RSI auto-reset
    lam: jnp.ndarray             # warm-start constraint forces


class StepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    done_reason: jnp.ndarray     # i32 code
    reward_info: reward_lib.RewardInfo
    # Root planar-velocity match vs the mocap frame, exp(-|dv_xy|),
    # NOT part of the reference reward (its CoM weight wc=0). Exposed
    # for training-only shaping on hard-exploration clips: the alive
    # bonus alone admits a "stand still" optimum; weighting this term
    # into GAE rewards moving like the clip. Same formula as the
    # combined env's walk/run task reward (reference:
    # src/combined_env.py:340-347) with gain 1 instead of 10.
    vel_match: jnp.ndarray
    # active contacts dropped by the fixed-slot top-K selection this
    # step (0 = lossless). Slot saturation silently changes dynamics;
    # trainers log max/mean of this so it is observable.
    contact_overflow: jnp.ndarray = None


class DPEnv:
    version = "v1.0"

    def __init__(self, motion: Optional[str] = None,
                 robot: str = "humanoid3d",
                 cfg: Optional[DPEnvConfig] = None,
                 max_contacts: Optional[int] = None,
                 iterations: Optional[int] = None,
                 integrator: Optional[int] = None,
                 speed: float = 1.0,
                 warm_start_lam: Optional[bool] = None,
                 mesh_subcapsules: Optional[int] = None,
                 cone: Optional[str] = None):
        # Training default: semi-implicit Euler with implicit joint
        # damping (1 forward/step). The reference's MJCF requests RK4
        # (4 forwards); pass integrator=RK4 for strict parity runs.
        if integrator is None:
            from deepmimic_mujoco_tpu.models.physics_model import EULER
            integrator = EULER
        self.ENV_CFG = cfg or DPEnvConfig()
        self.motion_config = MotionConfig(motion=motion, robot=robot)
        self.robot_config = RobotConfig(robot=robot)
        self.model = load_model(self.robot_config.xml_path)
        if max_contacts is None:
            # sized to measured worst-case active contacts (+margin):
            # humanoid3d peaks at ~11 (falls), G1 at ~23 (prone getup);
            # solver cost scales with (3*max_contacts + nlimit)^2
            max_contacts = 16 if robot == "humanoid3d" else 24
        eng_kw = {k: v for k, v in dict(
            warm_start_lam=warm_start_lam,
            mesh_subcapsules=mesh_subcapsules,
            cone=cone).items() if v is not None}
        self.engine = Engine(self.model, max_contacts=max_contacts,
                             iterations=iterations, integrator=integrator,
                             **eng_kw)
        self.spec = RobotSpec.build(self.model, self.robot_config)
        self.reward_tables = reward_lib.make_reward_tables(self.model, self.spec)

        clip = load_clip(self.motion_config.mocap_path, self.model)
        if speed != 1.0:
            from deepmimic_mujoco_tpu.mocap.loader import resample_clip_speed

            clip = resample_clip_speed(clip, speed)
        self.speed = speed
        self.clip = clip
        self.mocap_qpos = jnp.asarray(clip.qpos, jnp.float32)
        self.mocap_qvel = jnp.asarray(clip.qvel, jnp.float32)
        self.mocap_body_xpos = jnp.asarray(clip.body_xpos, jnp.float32)
        self.mocap_geom_xpos = jnp.asarray(clip.geom_xpos, jnp.float32)
        self.mocap_data_len = len(clip)
        self.mocap_dt = clip.dt

        motion_name = self.motion_config.motion
        self.is_floor_motion = motion_name in self.motion_config.floor_motions
        self.is_acyclical = motion_name in self.motion_config.acyclical_motions
        self.check_run_angles = (motion_name == "run" and robot == "unitree_g1")

        self.action_size = self.model.nu - self.spec.n_hand_actions
        self.obs_size = obs_lib.obs_size(self.model, self.spec, self.ENV_CFG)

    # ---- helpers -------------------------------------------------------
    def _kinematic_data(self, qpos, qvel) -> EngineData:
        """Position+velocity stages only (the post-step obs view)."""
        kin = fwd_kinematics(self.model, qpos)
        com = com_pos(self.model, kin)
        contacts = collide(self.model, self.engine.tables, kin,
                           self.engine.max_contacts)
        cvel, _ = com_vel(self.model, com, qvel)
        z = jnp.zeros(self.model.nv, qpos.dtype)
        return EngineData(kin=kin, com=com, cvel=cvel, contacts=contacts,
                          qacc=z, qfrc_smooth=z, qfrc_constraint=z,
                          lam=self.engine.empty_lam(qpos.dtype))

    def _obs(self, data, qpos, qvel, idx_curr):
        return obs_lib.get_obs(self.model, self.spec, self.ENV_CFG, data,
                               qpos, qvel, idx_curr, self.mocap_data_len)

    def _mujoco_action(self, action):
        ctrl = action * self.spec.act_scale
        if self.spec.n_hand_actions:
            ctrl = jnp.concatenate(
                [ctrl, jnp.zeros(self.spec.n_hand_actions, ctrl.dtype)])
        return ctrl

    # ---- functional API --------------------------------------------------
    def reset(self, key, idx_init: Optional[int] = None
              ) -> Tuple[DPEnvState, jnp.ndarray]:
        """Reference-state initialization: random clip frame
        (reference: src/deepmimic_env.py:312-316, :502-510)."""
        key, sub = jax.random.split(key)
        if idx_init is None:
            idx = jax.random.randint(sub, (), 0, self.mocap_data_len)
        else:
            idx = jnp.asarray(idx_init, jnp.int32)
        qpos = self.mocap_qpos[idx]
        qvel = self.mocap_qvel[idx]
        state = DPEnvState(
            qpos=qpos, qvel=qvel, idx_curr=idx.astype(jnp.int32),
            episode_length=jnp.zeros((), jnp.int32),
            episode_reward=jnp.zeros((), jnp.float32),
            key=key,
            lam=self.engine.empty_lam())
        data = self._kinematic_data(qpos, qvel)
        return state, self._obs(data, qpos, qvel, state.idx_curr)

    def step(self, state: DPEnvState, action: jnp.ndarray,
             force_state=None) -> Tuple[DPEnvState, StepOut]:
        m = self.model
        if force_state is not None:
            # bypass dynamics: fields are FRESH at the forced state,
            # like the reference's set_state + forward
            qpos, qvel = force_state
            data = self._kinematic_data(qpos, qvel)
        else:
            # derived fields (FK, contacts, cvel, forces) come from the
            # step's own forward pass at the PRE-integration state —
            # exactly the reference's post-``mj_step`` staleness
            # semantics, and it saves a second FK+collision per step
            ctrl = self._mujoco_action(action)
            qpos, qvel, data = self.engine.step(state.qpos, state.qvel, ctrl,
                                               lam0=state.lam)

        obs = self._obs(data, qpos, qvel, state.idx_curr)

        idx = state.idx_curr
        rew = reward_lib.calc_imitation_reward(
            self.reward_tables, qpos, qvel, data.kin.geom_xpos, data.kin.xpos,
            self.mocap_qpos[idx], self.mocap_qvel[idx],
            self.mocap_geom_xpos[idx], self.mocap_body_xpos[idx])

        # ---- termination (reference: src/deepmimic_env.py:418-442) ----
        done = jnp.zeros((), bool)
        reason = jnp.zeros((), jnp.int32)
        if not self.is_floor_motion:
            mass = jnp.asarray(m.body_mass, qpos.dtype)[:, None]
            z_com = ((data.kin.xipos * mass).sum(0) / mass.sum())[2]
            low = z_com < self.spec.low_z
            high = z_com > 2.0
            done = done | low | high
            reason = jnp.where(low, DONE_LOW_Z,
                               jnp.where(high, DONE_HIGH_Z, reason))
        if self.check_run_angles:
            max_angle = jnp.deg2rad(60.0)
            roll_bad = jnp.abs(rew.curr_root_roll - rew.target_root_roll) > max_angle
            pitch_bad = jnp.abs(rew.curr_root_pitch - rew.target_root_pitch) > max_angle
            reason = jnp.where(roll_bad & ~done, DONE_RUN_ROLL, reason)
            reason = jnp.where(pitch_bad & ~done & ~roll_bad, DONE_RUN_PITCH, reason)
            done = done | roll_bad | pitch_bad
        if self.ENV_CFG.MAX_EP_LENGTH:
            over = state.episode_length >= self.ENV_CFG.MAX_EP_LENGTH
            reason = jnp.where(over & ~done, DONE_MAX_EP_LEN, reason)
            done = done | over
        if self.is_acyclical:
            end = (idx + 1) == self.mocap_data_len
            reason = jnp.where(end & ~done, DONE_ACYCLICAL_END, reason)
            done = done | end

        # divergence / obs out of bounds guard (reference :465-476)
        bad = (~jnp.isfinite(obs).all()) | (jnp.abs(obs).max() > 100.0) \
            | (~jnp.isfinite(qpos).all()) | (~jnp.isfinite(qvel).all())
        obs = jnp.where(bad, jnp.zeros_like(obs), obs)
        reward = jnp.where(bad, 0.0, rew.reward)
        reason = jnp.where(bad, DONE_OBS_OOB, reason)
        done = done | bad

        # guard state against NaN poisoning the episode after auto-reset
        qpos = jnp.where(jnp.isfinite(qpos), qpos, 0.0)
        qvel = jnp.where(jnp.isfinite(qvel), qvel, 0.0)

        new_state = DPEnvState(
            qpos=qpos, qvel=qvel,
            idx_curr=(idx + 1) % self.mocap_data_len,
            episode_length=state.episode_length + 1,
            episode_reward=state.episode_reward + reward,
            key=state.key, lam=data.lam)
        dv = qvel[:2] - self.mocap_qvel[idx][:2]
        vel_match = jnp.exp(-jnp.sqrt((dv * dv).sum() + 1e-12))
        out = StepOut(obs=obs, reward=reward, done=done,
                      done_reason=reason, reward_info=rew,
                      vel_match=vel_match,
                      contact_overflow=data.contacts.overflow)
        return new_state, out

    def step_auto_reset(self, state: DPEnvState, action: jnp.ndarray
                        ) -> Tuple[DPEnvState, StepOut]:
        """Training step: on done, the next state is a fresh RSI reset
        (obs returned is the terminal obs, matching SB3 vec-env
        accounting)."""
        new_state, out = self.step(state, action)
        key, sub = jax.random.split(new_state.key)
        idx = jax.random.randint(sub, (), 0, self.mocap_data_len)
        reset_state = DPEnvState(
            qpos=self.mocap_qpos[idx], qvel=self.mocap_qvel[idx],
            idx_curr=idx.astype(jnp.int32),
            episode_length=jnp.zeros((), jnp.int32),
            episode_reward=jnp.zeros((), jnp.float32),
            key=key,
            lam=self.engine.empty_lam())
        picked = jax.tree.map(
            lambda a, b: jnp.where(out.done, a, b), reset_state,
            new_state._replace(key=key))
        return picked, out
