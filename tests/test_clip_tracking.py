"""Perfect-tracking reward across the clip library (BASELINE configs:
walk, spinkick/dance_b dynamic-contact clips, getup, G1 clips).

Mirrors the reference's check_rewards_and_joint_limits acceptance check
(src/deepmimic_env.py:570-653): forcing the state along the clip must
earn near-maximal imitation reward on every frame.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnv


# Full loadable clip library (reference: src/mujoco/mocap_v2.py:40-77
# loads all 15 humanoid3d + 6 G1 clips; see
# test_unloadable_clips_match_reference for the 2 that neither loads).
# Termination during forced tracking is expected for some clips and
# matches the reference's semantics: crawl/roll are NOT in the
# reference's floor_motions list (src/config.py:37) so their low com
# trips low_z, and jump's apex trips the z>2 check
# (src/deepmimic_env.py:418-442).
@pytest.mark.parametrize("motion,robot,min_mean,dones_ok", [
    ("cartwheel", "humanoid3d", 0.95, False),
    ("crawl", "humanoid3d", 0.95, True),      # low_z: not a floor motion
    ("dance_a", "humanoid3d", 0.95, False),
    ("dance_b", "humanoid3d", 0.95, False),
    ("getup_facedown", "humanoid3d", 0.95, False),
    ("getup_faceup", "humanoid3d", 0.95, False),
    ("jump", "humanoid3d", 0.95, True),       # apex trips z_com > 2.0
    ("kick", "humanoid3d", 0.90, False),
    ("punch", "humanoid3d", 0.90, False),
    ("roll", "humanoid3d", 0.95, True),       # low_z: not a floor motion
    ("run", "humanoid3d", 0.95, False),
    ("spinkick", "humanoid3d", 0.95, False),
    ("walk", "humanoid3d", 0.95, False),
    ("getup_facedown", "unitree_g1", 0.90, False),
    ("getup_facedown_slow", "unitree_g1", 0.90, False),
    ("getup_facedown_slow_FSI", "unitree_g1", 0.90, False),
    ("getup_facedown_towalk", "unitree_g1", 0.90, False),
    ("run", "unitree_g1", 0.95, False),
    ("walk", "unitree_g1", 0.95, False),
])
def test_perfect_tracking(motion, robot, min_mean, dones_ok):
    env = DPEnv(motion=motion, robot=robot, iterations=0)
    step = jax.jit(lambda s, q, v: env.step(
        s, jnp.zeros(env.action_size, jnp.float32), force_state=(q, v)))
    state, _ = env.reset(jax.random.PRNGKey(0), idx_init=0)
    rews = []
    n_done = 0
    for _ in range(min(env.mocap_data_len - 1, 160)):
        i = int(state.idx_curr)
        state, out = step(state, env.mocap_qpos[i], env.mocap_qvel[i])
        rews.append(float(out.reward))
        n_done += int(out.done)
    rews = np.asarray(rews)
    assert rews.mean() > min_mean, (motion, robot, rews.mean(), rews.min())
    if not dones_ok:
        assert n_done == 0, (motion, robot, n_done)


@pytest.mark.parametrize("motion", ["backflip", "spin"])
def test_unloadable_clips_match_reference(motion):
    """backflip (dt 0.0625) and spin (dt 0.0417) have non-integer
    dt ratios vs the 60 Hz sim; the reference's loader raises on them
    too (src/mujoco/mocap_v2.py:312-317, 10% integer-ratio tolerance).
    Capability parity = same clips load, same clips are rejected."""
    with pytest.raises(ValueError, match="integer multiple"):
        DPEnv(motion=motion, robot="humanoid3d", iterations=0)
