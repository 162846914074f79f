"""Asset path resolution (MJCF robot models + mocap clips).

The framework treats robot MJCF files, STL meshes and mocap clips as
user data; it does not vendor them. Paths resolve under
``DM_TPU_ASSET_ROOT`` (a directory laid out like the reference's
``src/mujoco``: ``humanoid_deepmimic/envs/asset/*.xml`` and
``motions/*.txt``; reference: src/config.py:26-48).
"""
import os

_DEFAULT_ROOTS = (
    os.environ.get("DM_TPU_ASSET_ROOT", ""),
    "/root/reference/src/mujoco",
    os.path.expanduser("~/Code/DeepMimic_mujoco/src/mujoco"),
)


def asset_root() -> str:
    for root in _DEFAULT_ROOTS:
        if root and os.path.isdir(root):
            return root
    raise FileNotFoundError(
        "No asset root found; set DM_TPU_ASSET_ROOT to a directory with "
        "humanoid_deepmimic/envs/asset/*.xml and motions/*.txt")


def xml_path(robot: str) -> str:
    return os.path.join(asset_root(), "humanoid_deepmimic", "envs", "asset",
                        f"deepmimic_{robot}.xml")


def mocap_path(robot: str, motion: str) -> str:
    return os.path.join(asset_root(), "motions", f"{robot}_{motion}.txt")
