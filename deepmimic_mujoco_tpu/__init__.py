"""deepmimic_mujoco_tpu: a TPU-native motion-imitation RL framework.

A from-scratch rebuild of the capabilities of DeepMimic_mujoco
(single-motion imitation + multi-motion combined envs over a rigid-body
physics engine, trained with on-device PPO) designed TPU-first:

- physics, mocap sampling, observation, reward, termination, and RSI
  auto-reset are fused into ONE jitted step function,
- thousands of envs run per chip under ``vmap``,
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives (no subprocess env workers, no MPI),
- the policy update (PPO/GAE) is resident on device.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
