"""End-to-end retargeting: humanoid walk -> a fresh G1 direct_qpos clip
that loads and earns high perfect-tracking reward (the reference's
acceptance flow, src/retarget.py:176-192)."""
import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture()
def sandbox_assets(tmp_path, monkeypatch):
    """Asset root where motions/ is writable (symlinked clips except the
    retarget target), everything else linked to the real root."""
    from deepmimic_mujoco_tpu.models import assets

    real = assets.asset_root()
    root = tmp_path / "mujoco"
    root.mkdir()
    os.symlink(os.path.join(real, "humanoid_deepmimic"),
               root / "humanoid_deepmimic")
    motions = root / "motions"
    motions.mkdir()
    for f in os.listdir(os.path.join(real, "motions")):
        if f == "unitree_g1_walk.txt":
            continue  # the file the tool will create
        os.symlink(os.path.join(real, "motions", f), motions / f)
    monkeypatch.setenv("DM_TPU_ASSET_ROOT", str(root))
    monkeypatch.setattr(assets, "_DEFAULT_ROOTS", (str(root),))
    return root


def test_retarget_walk_to_g1(sandbox_assets):
    from deepmimic_mujoco_tpu.tools.retarget import (
        retarget_motion_humanoid_to_unitree_g1, validate_clip,
    )

    out = retarget_motion_humanoid_to_unitree_g1("walk", validate=False)
    data = json.load(open(out))
    assert data["Format"] == "direct_qpos"
    assert len(data["Frames"][0]) == 1 + 44  # dt + G1 qpos
    assert data["Loop"] == "wrap"

    # refuses overwrite (reference: src/retarget.py:184-186)
    with pytest.raises(FileExistsError):
        retarget_motion_humanoid_to_unitree_g1("walk", validate=False)

    rews = validate_clip("walk")
    assert rews.mean() > 0.9, rews.mean()
