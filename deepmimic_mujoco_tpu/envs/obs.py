"""Observation library (pure jnp, fused into the env step).

Mirrors the reference's observation composition exactly (reference:
src/deepmimic_env.py:33-191): qpos[7:], scaled qvel[6:], torso RPY +
yaw-aligned body-frame velocities, foot/extra floor-contact flags,
joint forces, absolute geom positions, phase, player-action encoding.
All toggles come from the config dataclass; the composition (and the
obs size) is static at trace time.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs.spec import RobotSpec
from deepmimic_mujoco_tpu.physics.collision import Contacts
from deepmimic_mujoco_tpu.physics.step import EngineData
from deepmimic_mujoco_tpu.utils import quat as jq


class PlayerActionObs(NamedTuple):
    """Device encoding of the reference's PlayerAction object
    (src/combined_env.py:38-64): a onehot index and a world heading."""
    onehot: jnp.ndarray           # (MAX_PLAYER_ACTIONS,)
    heading_world: jnp.ndarray    # (3,)


def _contact_flag(contacts: Contacts, geom_ids, floor_geom: int):
    """1.0 when any active contact joins one of geom_ids to the floor
    (replaces per-step name matching, src/deepmimic_env.py:88-101)."""
    active = contacts.dist < contacts.includemargin
    ids = jnp.asarray(np.asarray(geom_ids, np.int32))
    in_set1 = jnp.isin(contacts.geom1, ids)
    in_set2 = jnp.isin(contacts.geom2, ids)
    floor1 = contacts.geom1 == floor_geom
    floor2 = contacts.geom2 == floor_geom
    hit = active & ((in_set1 & floor2) | (in_set2 & floor1))
    return hit.any().astype(contacts.dist.dtype)


def get_torso_obs(spec: RobotSpec, data: EngineData, scale: float):
    b = spec.torso_body
    torso_quat = data.kin.xquat[b]
    rpy = jq.to_rpy(torso_quat)
    vel_lin = data.cvel[b, 3:]
    vel_rot = data.cvel[b, :3]
    yaw = rpy[2]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    vx = c * vel_lin[0] - s * vel_lin[1]
    vy = s * vel_lin[0] + c * vel_lin[1]
    vz = vel_lin[2]
    return jnp.stack([rpy[0], rpy[1], vx, vy, vz,
                      vel_rot[0], vel_rot[1], vel_rot[2]]) * scale


def get_player_action_obs(spec: RobotSpec, data: EngineData,
                          pa: PlayerActionObs, pa_getup_state):
    """[heading-in-root-frame(2), onehot, pa_getup_state(2)]
    (reference: src/deepmimic_env.py:145-173)."""
    qw = data.kin.xquat[spec.torso_body]
    root_yaw = jq.to_rpy(qw)[2]
    c, s = jnp.cos(-root_yaw), jnp.sin(-root_yaw)
    hx = pa.heading_world[0] * c - pa.heading_world[1] * s
    hy = pa.heading_world[0] * s + pa.heading_world[1] * c
    return jnp.concatenate([jnp.stack([hx, hy]), pa.onehot, pa_getup_state])


def get_obs(m, spec: RobotSpec, cfg, data: EngineData, qpos, qvel,
            idx_curr, motion_len,
            player_action: Optional[PlayerActionObs] = None,
            pa_getup_state=None) -> jnp.ndarray:
    dtype = qpos.dtype
    parts = [qpos[7:], qvel[6:] * cfg.VEL_OBS_SCALE]
    if cfg.ADD_TORSO_OBS:
        parts.append(get_torso_obs(spec, data, cfg.VEL_OBS_SCALE))
    if cfg.ADD_FOOT_CONTACT_OBS:
        parts.append(jnp.stack([
            _contact_flag(data.contacts, [spec.rfoot_geom], spec.floor_geom),
            _contact_flag(data.contacts, [spec.lfoot_geom], spec.floor_geom),
        ]))
    if cfg.ADD_EXTRA_CONTACT_OBS:
        parts.append(jnp.stack([
            _contact_flag(data.contacts, [g], spec.floor_geom)
            for g in spec.extra_contact_geoms]))
    if cfg.ADD_JOINT_FORCE_OBS:
        parts.append((data.qfrc_smooth + data.qfrc_constraint)
                     * cfg.FRC_OBS_SCALE)
    if cfg.ADD_ABSPOS_OBS:
        parts.append(data.kin.geom_xpos.reshape(-1))
    if cfg.ADD_PHASE_OBS:
        phase = jnp.clip(idx_curr.astype(dtype) / motion_len, 0.0, 1.0)
        parts.append(phase[None])
    if cfg.ADD_PLAYER_ACTION_OBS:
        if player_action is None:
            player_action = PlayerActionObs(
                onehot=jnp.zeros(cfg.MAX_PLAYER_ACTIONS, dtype),
                heading_world=jnp.zeros(3, dtype))
        if pa_getup_state is None:
            pa_getup_state = jnp.zeros(2, dtype)
        parts.append(get_player_action_obs(spec, data, player_action,
                                           pa_getup_state))
    return jnp.concatenate(parts)


def obs_size(m, spec: RobotSpec, cfg) -> int:
    n = (m.nq - 7) + (m.nv - 6)
    if cfg.ADD_TORSO_OBS:
        n += 8
    if cfg.ADD_FOOT_CONTACT_OBS:
        n += 2
    if cfg.ADD_EXTRA_CONTACT_OBS:
        n += len(spec.extra_contact_geoms)
    if cfg.ADD_JOINT_FORCE_OBS:
        n += m.nv
    if cfg.ADD_ABSPOS_OBS:
        n += 3 * m.ngeom
    if cfg.ADD_PHASE_OBS:
        n += 1
    if cfg.ADD_PLAYER_ACTION_OBS:
        n += 2 + cfg.MAX_PLAYER_ACTIONS + 2
    return n
