"""Multi-motion combined env (DPCombinedEnv), TPU-native.

Functional re-design of the reference's walk/run/getup/to-getup state
machine with player commands (reference: src/combined_env.py:102-533).
The per-env "current mocap object" becomes an integer ``motion_id``
indexing stacked, length-padded clip tensors; transitions are
``jnp.where`` updates, so the whole state machine vmaps.

Motion ids: WALK=0, RUN=1, GETUP=2, TO_GETUP=3. TO_GETUP is the
reference's MTToGetup pseudo-clip: a constant target pose (getup clip
frame 1) with nominal length 180 (src/combined_env.py:95-99).

Reference quirk preserved: the getup-timeout branch compares the player
action with ``== PAWalk()`` which is always False for the identity-
comparing reference classes, so a finished getup always transitions to
RUN (src/combined_env.py:402). Set ``getup_timeout_to_walk=True`` for
the evidently intended behavior.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import obs as obs_lib
from deepmimic_mujoco_tpu.envs import reward as reward_lib
from deepmimic_mujoco_tpu.envs.config import (
    DPCombinedEnvConfig, MotionConfig, RobotConfig,
)
from deepmimic_mujoco_tpu.envs.dp_env import (
    DONE_MAX_EP_LEN, DONE_OBS_OOB,
)
from deepmimic_mujoco_tpu.envs.obs import PlayerActionObs
from deepmimic_mujoco_tpu.envs.spec import RobotSpec
from deepmimic_mujoco_tpu.mocap import load_clip
from deepmimic_mujoco_tpu.models import load_model
from deepmimic_mujoco_tpu.physics.collision import collide
from deepmimic_mujoco_tpu.physics.kinematics import com_pos, com_vel, fwd_kinematics
from deepmimic_mujoco_tpu.physics.step import Engine, EngineData

WALK, RUN, GETUP, TO_GETUP = 0, 1, 2, 3
MOTION_NAMES = ("walk", "run", "getup", "to_getup")

# player action table (reference: PAWalk vx=1, PARun vx=3)
PA_WALK, PA_RUN = 0, 1
_PA_HEADINGS = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])

DONE_FALLEN_NO_AMNESTY = 10


class HandoffBuffer(NamedTuple):
    """Ring buffer of physical states captured at GETUP -> locomotion
    transitions, shared across the vmapped env batch (it lives in the
    trainer's carry, not per-env state). Resets draw from it with
    probability ``cfg.HANDOFF_BUFFER_FRAC`` so the handoff is practiced
    from the exact state distribution the current policy reaches —
    late-getup MOCAP resets (HANDOFF_RSI_FRAC) miss the off-clip drift
    that kills the round-2/4 policies at the second fall's handoff."""
    qpos: jnp.ndarray    # (C, nq)
    qvel: jnp.ndarray    # (C, nv)
    pa: jnp.ndarray      # (C,) i32 player action at the transition
    motion: jnp.ndarray  # (C,) i32 motion entered (WALK or RUN)
    head: jnp.ndarray    # () i32 next write slot
    count: jnp.ndarray   # () i32 valid rows (<= C)


class CombinedEnvState(NamedTuple):
    qpos: jnp.ndarray
    qvel: jnp.ndarray
    motion_id: jnp.ndarray       # i32 in {WALK, RUN, GETUP, TO_GETUP}
    n_steps: jnp.ndarray         # i32 steps in current motion
    player_action: jnp.ndarray   # i32 in {PA_WALK, PA_RUN}
    episode_length: jnp.ndarray
    episode_reward: jnp.ndarray
    key: jnp.ndarray
    lam: jnp.ndarray             # warm-start constraint forces


class CombinedStepOut(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    done_reason: jnp.ndarray
    imitation_reward: jnp.ndarray
    task_reward: jnp.ndarray
    reward_info: reward_lib.RewardInfo
    motion_id: jnp.ndarray


class DPCombinedEnv:
    version = "v0.2.up"

    def __init__(self, cfg: Optional[DPCombinedEnvConfig] = None,
                 getup_timeout_to_walk: bool = False,
                 max_contacts: int = 24,
                 iterations: Optional[int] = None,
                 integrator: Optional[int] = None,
                 warm_start_lam: Optional[bool] = None,
                 mesh_subcapsules: Optional[int] = None):
        # Training default: Euler (see DPEnv); RK4 available for parity.
        if integrator is None:
            from deepmimic_mujoco_tpu.models.physics_model import EULER
            integrator = EULER
        self.ENV_CFG = cfg or DPCombinedEnvConfig()
        self.robot = "unitree_g1"
        self.robot_config = RobotConfig(robot=self.robot)
        self.model = load_model(self.robot_config.xml_path)
        eng_kw = {k: v for k, v in dict(
            warm_start_lam=warm_start_lam,
            mesh_subcapsules=mesh_subcapsules).items() if v is not None}
        self.engine = Engine(self.model, max_contacts=max_contacts,
                             iterations=iterations, integrator=integrator,
                             **eng_kw)
        self.spec = RobotSpec.build(self.model, self.robot_config)
        self.reward_tables = reward_lib.make_reward_tables(self.model, self.spec)
        self.getup_timeout_to_walk = getup_timeout_to_walk

        clips = {
            WALK: load_clip(MotionConfig("walk", self.robot).mocap_path,
                            self.model),
            RUN: load_clip(MotionConfig("run", self.robot).mocap_path,
                           self.model),
            GETUP: load_clip(
                MotionConfig("getup_facedown_towalk", self.robot).mocap_path,
                self.model),
        }
        self.clips = clips
        to_getup_len = 180  # MTToGetup length (src/combined_env.py:99)
        lengths = [len(clips[WALK]), len(clips[RUN]), len(clips[GETUP]),
                   to_getup_len]
        Tmax = max(max(lengths), to_getup_len)

        def padstack(field):
            rows = []
            for mid in (WALK, RUN, GETUP):
                arr = getattr(clips[mid], field)
                pad = np.repeat(arr[-1:], Tmax - len(arr), axis=0)
                rows.append(np.concatenate([arr, pad]))
            # TO_GETUP: constant target = getup clip frame 1
            const = getattr(clips[GETUP], field)[1]
            rows.append(np.repeat(const[None], Tmax, axis=0))
            return jnp.asarray(np.stack(rows), jnp.float32)

        self.mocap_qpos = padstack("qpos")
        self.mocap_qvel = padstack("qvel")
        self.mocap_body_xpos = padstack("body_xpos")
        self.mocap_geom_xpos = padstack("geom_xpos")
        self.motion_lengths = jnp.asarray(lengths, jnp.int32)

        self.action_size = self.model.nu - self.spec.n_hand_actions
        self.obs_size = obs_lib.obs_size(self.model, self.spec, self.ENV_CFG)

    # ---- helpers --------------------------------------------------------
    def _kinematic_data(self, qpos, qvel) -> EngineData:
        kin = fwd_kinematics(self.model, qpos)
        com = com_pos(self.model, kin)
        contacts = collide(self.model, self.engine.tables, kin,
                           self.engine.max_contacts)
        cvel, _ = com_vel(self.model, com, qvel)
        z = jnp.zeros(self.model.nv, qpos.dtype)
        return EngineData(kin=kin, com=com, cvel=cvel, contacts=contacts,
                          qacc=z, qfrc_smooth=z, qfrc_constraint=z,
                          lam=self.engine.empty_lam(qpos.dtype))

    def _mocap_at(self, motion_id, idx):
        return (self.mocap_qpos[motion_id, idx],
                self.mocap_qvel[motion_id, idx],
                self.mocap_body_xpos[motion_id, idx],
                self.mocap_geom_xpos[motion_id, idx])

    def _pa_obs(self, player_action):
        onehot = (jnp.arange(self.ENV_CFG.MAX_PLAYER_ACTIONS)
                  == player_action).astype(jnp.float32)
        heading = jnp.asarray(_PA_HEADINGS, jnp.float32)[player_action]
        return PlayerActionObs(onehot=onehot, heading_world=heading)

    def _obs(self, data, qpos, qvel, motion_id, n_steps, player_action):
        mlen = self.motion_lengths[motion_id]
        idx = n_steps % mlen
        pa_getup_state = jnp.stack([
            (motion_id == TO_GETUP).astype(jnp.float32),
            (motion_id == GETUP).astype(jnp.float32)])
        return obs_lib.get_obs(self.model, self.spec, self.ENV_CFG, data,
                               qpos, qvel, idx, mlen,
                               player_action=self._pa_obs(player_action),
                               pa_getup_state=pa_getup_state)

    def _mujoco_action(self, action):
        ctrl = action * self.ENV_CFG.ACT_SCALE
        if self.spec.n_hand_actions:
            ctrl = jnp.concatenate(
                [ctrl, jnp.zeros(self.spec.n_hand_actions, ctrl.dtype)])
        return ctrl

    # ---- on-policy handoff buffer ---------------------------------------
    def make_handoff_buffer(self, capacity: int = 4096) -> HandoffBuffer:
        nq, nv = self.model.nq, self.model.nv
        return HandoffBuffer(
            qpos=jnp.zeros((capacity, nq), jnp.float32),
            qvel=jnp.zeros((capacity, nv), jnp.float32),
            pa=jnp.zeros((capacity,), jnp.int32),
            motion=jnp.full((capacity,), RUN, jnp.int32),
            head=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32))

    @staticmethod
    def handoff_capture_mask(prev_motion_id, out):
        """Batch mask of envs that just exited GETUP into locomotion
        (and did not terminate on the same step)."""
        entered_loco = (out.motion_id == WALK) | (out.motion_id == RUN)
        return (prev_motion_id == GETUP) & entered_loco & ~out.done

    @staticmethod
    def update_handoff_buffer(buf: HandoffBuffer, mask, qpos, qvel, pa,
                              motion) -> HandoffBuffer:
        """Scatter the masked batch rows into the ring buffer. Static
        shapes throughout: write positions for unmasked rows land at
        index C and are dropped (XLA scatter mode='drop')."""
        C = buf.qpos.shape[0]
        mask_i = mask.astype(jnp.int32)
        offs = jnp.cumsum(mask_i) - 1                     # (N,)
        pos = (buf.head + offs) % C
        pos = jnp.where(mask, pos, C)                     # drop lane
        new = HandoffBuffer(
            qpos=buf.qpos.at[pos].set(qpos, mode="drop"),
            qvel=buf.qvel.at[pos].set(qvel, mode="drop"),
            pa=buf.pa.at[pos].set(pa.astype(jnp.int32), mode="drop"),
            motion=buf.motion.at[pos].set(motion.astype(jnp.int32),
                                          mode="drop"),
            head=(buf.head + mask_i.sum()) % C,
            count=jnp.minimum(buf.count + mask_i.sum(), C))
        return new

    # ---- API --------------------------------------------------------------
    def _reset_state(self, key,
                     handoff_buf: Optional[HandoffBuffer] = None
                     ) -> CombinedEnvState:
        """50/50 walk (past the amnesty window) or getup at a random
        frame (reference: src/combined_env.py:208-244). Training-only
        extensions (cfg, default off): a HANDOFF_RSI_FRAC share of
        resets lands in the last quarter of the getup clip, and
        RSI_RANDOM_PA randomizes the commanded locomotion, so the
        getup -> walk|run handoff is actually practiced from resets."""
        cfg = self.ENV_CFG
        key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
        pick_walk = jax.random.bernoulli(k1)
        walk_steps = (cfg.AMNESTY_STEPS + 10
                      + jax.random.randint(k2, (), 0,
                                           self.motion_lengths[WALK]))
        getup_steps = jax.random.randint(k3, (), 0,
                                         self.motion_lengths[GETUP])
        motion_id = jnp.where(pick_walk, WALK, GETUP).astype(jnp.int32)
        n_steps = jnp.where(pick_walk, walk_steps, getup_steps)
        if cfg.HANDOFF_RSI_FRAC > 0.0:
            glen = self.motion_lengths[GETUP]
            pick_handoff = jax.random.bernoulli(k4, cfg.HANDOFF_RSI_FRAC)
            handoff_steps = glen - 1 - jax.random.randint(
                k5, (), 0, jnp.maximum(glen // 4, 1))
            motion_id = jnp.where(pick_handoff, GETUP, motion_id
                                  ).astype(jnp.int32)
            n_steps = jnp.where(pick_handoff, handoff_steps, n_steps)
        if cfg.FACEDOWN_RSI_FRAC > 0.0:
            k7, _ = jax.random.split(k4)
            pick_fd = jax.random.bernoulli(k7, cfg.FACEDOWN_RSI_FRAC)
            motion_id = jnp.where(pick_fd, GETUP, motion_id
                                  ).astype(jnp.int32)
            n_steps = jnp.where(pick_fd, 0, n_steps)
        pa = jnp.asarray(PA_WALK, jnp.int32)
        if cfg.RSI_RANDOM_PA:
            pa = jnp.where(jax.random.bernoulli(k6), PA_RUN, PA_WALK
                           ).astype(jnp.int32)
        idx = n_steps.astype(jnp.int32) % self.motion_lengths[motion_id]
        qpos, qvel, _, _ = self._mocap_at(motion_id, idx)
        if cfg.FACEDOWN_RSI_FRAC > 0.0:
            # the fall state is motionless: zero the clip velocity
            qvel = jnp.where(pick_fd, jnp.zeros_like(qvel), qvel)
        n_steps = n_steps.astype(jnp.int32)
        if handoff_buf is not None and cfg.HANDOFF_BUFFER_FRAC > 0.0:
            kb1, kb2 = jax.random.split(key)
            use = (jax.random.bernoulli(kb1, cfg.HANDOFF_BUFFER_FRAC)
                   & (handoff_buf.count > 0))
            i = jax.random.randint(kb2, (), 0,
                                   jnp.maximum(handoff_buf.count, 1))
            qpos = jnp.where(use, handoff_buf.qpos[i], qpos)
            qvel = jnp.where(use, handoff_buf.qvel[i], qvel)
            motion_id = jnp.where(use, handoff_buf.motion[i], motion_id)
            pa = jnp.where(use, handoff_buf.pa[i], pa)
            # the buffered state is the step AFTER the transition set
            # n_steps=0 (new_steps + 1), so resume the clip at frame 1
            n_steps = jnp.where(use, 1, n_steps)
        return CombinedEnvState(
            qpos=qpos, qvel=qvel, motion_id=motion_id,
            n_steps=n_steps,
            player_action=pa,
            episode_length=jnp.zeros((), jnp.int32),
            episode_reward=jnp.zeros((), jnp.float32), key=key,
            lam=self.engine.empty_lam())

    def reset(self, key) -> Tuple[CombinedEnvState, jnp.ndarray]:
        state = self._reset_state(key)
        data = self._kinematic_data(state.qpos, state.qvel)
        obs = self._obs(data, state.qpos, state.qvel, state.motion_id,
                        state.n_steps, state.player_action)
        return state, obs

    def step(self, state: CombinedEnvState, action, force_state=None
             ) -> Tuple[CombinedEnvState, CombinedStepOut]:
        m = self.model
        cfg = self.ENV_CFG
        if force_state is not None:
            qpos, qvel = force_state
            data = self._kinematic_data(qpos, qvel)
        else:
            # stale-field semantics: see dp_env.step
            ctrl = self._mujoco_action(action)
            qpos, qvel, data = self.engine.step(state.qpos, state.qvel, ctrl,
                                               lam0=state.lam)

        motion_id = state.motion_id
        n_steps = state.n_steps
        mlen = self.motion_lengths[motion_id]
        idx = n_steps % mlen

        obs = self._obs(data, qpos, qvel, motion_id, n_steps,
                        state.player_action)

        # ---- reward (src/combined_env.py:321-355) ----------------------
        mq, mv, mb, mg = self._mocap_at(motion_id, idx)
        rew = reward_lib.calc_imitation_reward(
            self.reward_tables, qpos, qvel, data.kin.geom_xpos,
            data.kin.xpos, mq, mv, mg, mb)
        imitation = rew.reward
        is_locomotion = (motion_id == WALK) | (motion_id == RUN)
        vel_err = jnp.linalg.norm(mv[:2] - qvel[:2])
        task_locomotion = jnp.exp(-10.0 * vel_err)
        config_error = (jnp.abs(rew.config_angle_diffs).sum()
                        + jnp.abs(rew.curr_root_pitch - rew.target_root_pitch)
                        + jnp.abs(rew.curr_root_roll - rew.target_root_roll))
        task_getup = jnp.exp(-config_error / 5.0) / 3.0
        is_to_getup = motion_id == TO_GETUP
        imitation = jnp.where(is_to_getup, 0.0, imitation)
        task = jnp.where(is_locomotion, task_locomotion,
                         jnp.where(is_to_getup, task_getup, 0.0))
        reward = 0.7 * imitation + 0.3 * task

        # ---- transitions (src/combined_env.py:398-445) ------------------
        done = jnp.zeros((), bool)
        reason = jnp.zeros((), jnp.int32)
        new_motion = motion_id
        new_steps = n_steps

        # timer end
        out_of_time = n_steps >= (mlen - 1)
        getup_next = jnp.asarray(
            WALK if self.getup_timeout_to_walk else RUN, jnp.int32)
        # (reference quirk: PAWalk()==PAWalk() is False -> RUN)
        new_motion = jnp.where(out_of_time & (motion_id == GETUP),
                               getup_next, new_motion)
        new_motion = jnp.where(out_of_time & (motion_id == TO_GETUP),
                               GETUP, new_motion)

        # success: to_getup pose reached -> getup
        alim = jnp.deg2rad(15.0)
        is_success = ((jnp.abs(rew.config_angle_diffs) < alim).all()
                      & (jnp.abs(rew.curr_root_pitch - rew.target_root_pitch) < alim)
                      & (jnp.abs(rew.curr_root_roll - rew.target_root_roll) < alim))
        new_motion = jnp.where(is_success & (motion_id == TO_GETUP),
                               GETUP, new_motion)

        # fallen (walk/run only)
        mass = jnp.asarray(m.body_mass, qpos.dtype)[:, None]
        z_com = ((data.kin.xipos * mass).sum(0) / mass.sum())[2]
        max_angle = jnp.deg2rad(60.0)
        fallen = ((z_com < self.spec.low_z) | (z_com > 2.0)
                  | (jnp.abs(rew.curr_root_roll - rew.target_root_roll) > max_angle)
                  | (jnp.abs(rew.curr_root_pitch - rew.target_root_pitch) > max_angle))
        fallen = fallen & is_locomotion
        has_amnesty = n_steps > cfg.AMNESTY_STEPS
        done = done | (fallen & ~has_amnesty)
        reason = jnp.where(fallen & ~has_amnesty, DONE_FALLEN_NO_AMNESTY,
                           reason)
        new_motion = jnp.where(fallen, TO_GETUP, new_motion)

        changed = new_motion != motion_id
        new_steps = jnp.where(changed, 0, new_steps)

        # max episode length
        over = state.episode_length >= cfg.MAX_EP_LENGTH
        reason = jnp.where(over & ~done, DONE_MAX_EP_LEN, reason)
        done = done | over

        # obs guard (src/combined_env.py:474-485)
        bad = (~jnp.isfinite(obs).all()) | (jnp.abs(obs).max() > 100.0) \
            | (~jnp.isfinite(qpos).all()) | (~jnp.isfinite(qvel).all())
        obs = jnp.where(bad, jnp.zeros_like(obs), obs)
        reward = jnp.where(bad, 0.0, reward)
        reason = jnp.where(bad, DONE_OBS_OOB, reason)
        done = done | bad
        qpos = jnp.where(jnp.isfinite(qpos), qpos, 0.0)
        qvel = jnp.where(jnp.isfinite(qvel), qvel, 0.0)

        new_state = CombinedEnvState(
            qpos=qpos, qvel=qvel, motion_id=new_motion,
            n_steps=new_steps + 1,
            player_action=state.player_action,
            episode_length=state.episode_length + 1,
            episode_reward=state.episode_reward + reward,
            key=state.key, lam=data.lam)
        out = CombinedStepOut(
            obs=obs, reward=reward, done=done, done_reason=reason,
            imitation_reward=imitation, task_reward=task,
            reward_info=rew, motion_id=new_motion)
        return new_state, out

    def step_auto_reset(self, state: CombinedEnvState, action,
                        handoff_buf: Optional[HandoffBuffer] = None):
        new_state, out = self.step(state, action)
        key, sub = jax.random.split(new_state.key)
        reset_state = self._reset_state(sub, handoff_buf)
        picked = jax.tree.map(
            lambda a, b: jnp.where(out.done, a, b),
            reset_state._replace(key=key), new_state._replace(key=key))
        return picked, out

    def get_current_motion_state(self, state: CombinedEnvState):
        """(qpos, qvel) of the current motion target (reference:
        src/combined_env.py:202-206)."""
        idx = state.n_steps % self.motion_lengths[state.motion_id]
        q, v, _, _ = self._mocap_at(state.motion_id, idx)
        return q, v
