"""Quantify the friction-cone approximation (VERDICT r3 'Next' #8).

The reference runs mujoco200 PGS, whose friction cone is PYRAMIDAL;
this engine's default projection is the ELLIPTIC cone. This tool puts
a number on the deviation by rolling the contact-parity segments under
every (engine, cone) combination:

    ours(elliptic)   vs ours(pyramidal)    <- the cone effect in OUR solver
    oracle(elliptic) vs oracle(pyramidal)  <- the cone effect in MuJoCo 3.10
    ours(c)          vs oracle(c)          <- engine gap at matched cone

Divergence metric matches tests/test_contact_parity.py: max |root pos|
delta and max per-hinge |angle| delta over a 30-step (0.5 s) zero-ctrl
rollout from a contact-rich mocap state.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/diag_cone.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mujoco
import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.models import assets, load_model
from deepmimic_mujoco_tpu.models.physics_model import EULER
from deepmimic_mujoco_tpu.physics.step import Engine

STEPS = 30

SEGMENTS = [
    ("humanoid3d", "walk", 20),
    ("humanoid3d", "spinkick", 10),
    ("unitree_g1", "getup_facedown_slow_FSI", 0),
]


def ours(robot, cone, q0, v0):
    m = load_model(assets.xml_path(robot))
    eng = Engine(m, integrator=EULER, cone=cone)
    step = jax.jit(lambda q, v: eng.step(q, v, jnp.zeros(m.nu, jnp.float32))[:2])
    q = jnp.asarray(q0, jnp.float32)
    v = jnp.asarray(v0, jnp.float32)
    qs = []
    for _ in range(STEPS):
        q, v = step(q, v)
        qs.append(np.asarray(q))
    return np.stack(qs)


def oracle(robot, cone, q0, v0):
    ref = mujoco.MjModel.from_xml_path(assets.xml_path(robot))
    ref.opt.integrator = 0  # Euler
    ref.opt.cone = (mujoco.mjtCone.mjCONE_PYRAMIDAL if cone == "pyramidal"
                    else mujoco.mjtCone.mjCONE_ELLIPTIC)
    d = mujoco.MjData(ref)
    d.qpos[:] = q0
    d.qvel[:] = v0
    qs = []
    for _ in range(STEPS):
        mujoco.mj_step(ref, d)
        qs.append(d.qpos.copy())
    return np.stack(qs)


def div(a, b):
    droot = np.abs(a[:, :3] - b[:, :3]).max()
    djnt = np.abs(a[:, 7:] - b[:, 7:]).max()
    return droot, djnt


if __name__ == "__main__":
    for robot, motion, frame in SEGMENTS:
        env = DPEnv(motion=motion, robot=robot)
        q0 = np.asarray(env.mocap_qpos[frame], np.float64)
        v0 = np.asarray(env.mocap_qvel[frame], np.float64)
        tr = {}
        for cone in ("elliptic", "pyramidal"):
            tr[("ours", cone)] = ours(robot, cone, q0, v0)
            tr[("oracle", cone)] = oracle(robot, cone, q0, v0)
        print(f"== {robot}/{motion} frame {frame} ({STEPS} steps, Euler)")
        for name, a, b in [
            ("ours ell vs ours pyr   ", tr[("ours", "elliptic")], tr[("ours", "pyramidal")]),
            ("oracle ell vs oracle pyr", tr[("oracle", "elliptic")], tr[("oracle", "pyramidal")]),
            ("ours ell vs oracle ell  ", tr[("ours", "elliptic")], tr[("oracle", "elliptic")]),
            ("ours pyr vs oracle pyr  ", tr[("ours", "pyramidal")], tr[("oracle", "pyramidal")]),
            ("ours ell vs oracle pyr  ", tr[("ours", "elliptic")], tr[("oracle", "pyramidal")]),
        ]:
            droot, djnt = div(a, b)
            print(f"   {name}: root {droot:.4f} m   joints {djnt:.4f} rad")
