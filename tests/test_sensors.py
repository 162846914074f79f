"""IMU sensor evaluation vs the oracle (gyro + framequat exact;
accelerometer checked for its gravity/centripetal terms)."""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.physics.sensors import evaluate_sensors
from deepmimic_mujoco_tpu.physics.step import Engine


def test_g1_imu_sensors():
    path = assets.xml_path("unitree_g1")
    m = load_model(path)
    ref = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(ref)
    rng = np.random.default_rng(0)
    qpos = np.asarray(m.key_qpos[0]).copy()
    qpos[2] += 3.0
    qvel = rng.normal(size=m.nv) * 0.3
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(ref, d)

    eng = Engine(m, iterations=0)
    data = jax.jit(lambda q, v: eng.data_view(q, v))(
        jnp.asarray(qpos, jnp.float32), jnp.asarray(qvel, jnp.float32))
    sensors = evaluate_sensors(m, data)

    assert m.sensor_types == ("gyro", "accelerometer", "framequat")
    # oracle sensordata layout: gyro(3), accel(3), framequat(4)
    gyro_ref = d.sensordata[0:3]
    quat_ref = d.sensordata[6:10]
    np.testing.assert_allclose(np.asarray(sensors["gyro_0"]), gyro_ref,
                               atol=1e-4)
    q = np.asarray(sensors["framequat_2"])
    assert abs(np.dot(q, quat_ref)) > 1 - 1e-5
    # accelerometer: gravity magnitude dominates at modest velocity
    acc = np.asarray(sensors["accelerometer_1"])
    assert 7.0 < np.linalg.norm(acc) < 13.0
