"""Asset path resolution (MJCF robot models + mocap clips).

Robot MJCF files, STL meshes and the 21 mocap clips are vendored under
``deepmimic_mujoco_tpu/assets`` (same layout as the reference's
``src/mujoco``: ``humanoid_deepmimic/envs/asset/*.xml`` and
``motions/*.txt``; reference: src/config.py:26-48) so the framework is
fully self-contained. ``DM_TPU_ASSET_ROOT`` overrides the vendored
root, e.g. to point at a user's own robot/clip library.
"""
import os

_VENDORED_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")

_DEFAULT_ROOTS = (
    os.environ.get("DM_TPU_ASSET_ROOT", ""),
    _VENDORED_ROOT,
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
