from deepmimic_mujoco_tpu.mocap.loader import (  # noqa: F401
    MocapClip, align_position, align_rotation, load_clip, SIM_DT,
)
