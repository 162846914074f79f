from deepmimic_mujoco_tpu.envs.config import (  # noqa: F401
    DPCombinedEnvConfig, DPEnvConfig, MotionConfig, RobotConfig,
)
from deepmimic_mujoco_tpu.envs.combined_env import (  # noqa: F401
    DPCombinedEnv, CombinedEnvState,
)
from deepmimic_mujoco_tpu.envs.dp_env import (  # noqa: F401
    DONE_REASON_NAMES, DPEnv, DPEnvState, StepOut,
)
from deepmimic_mujoco_tpu.envs.gym_wrapper import (  # noqa: F401
    GymDPCombinedEnv, GymDPEnv,
)
