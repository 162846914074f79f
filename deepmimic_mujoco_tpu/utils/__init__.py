from deepmimic_mujoco_tpu.utils.quat_core import make_quat_module  # noqa: F401
