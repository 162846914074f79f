from deepmimic_mujoco_tpu.rl.networks import ActorCritic  # noqa: F401
from deepmimic_mujoco_tpu.rl.ppo import PPO, PPOConfig  # noqa: F401
