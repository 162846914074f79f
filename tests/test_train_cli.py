"""Training CLI: run-reason guard (reference: src/sb3_ppo.py:232-242)
and preset resolution."""
import pytest

from deepmimic_mujoco_tpu.rl.train import parse_reason


def test_reason_required():
    with pytest.raises(ValueError, match="reason"):
        parse_reason([])


def test_reason_accepted():
    args = parse_reason(["testing the guard"])
    assert args.reason == "testing the guard"


def test_no_wandb_waives_reason():
    args = parse_reason(["--no-wandb"])
    assert args.no_wandb


def test_legacy_preset_flag():
    args = parse_reason(["why not", "--preset", "legacy-ppo2"])
    assert args.preset == "legacy-ppo2"


def test_legacy_ppo2_preset_trains(tmp_path):
    """The legacy-ppo2 preset must actually train, not just parse
    (reference: src/ppo.py:16-42 — SB2 PPO2, horizon 128, 4 epochs)."""
    from deepmimic_mujoco_tpu.rl.train import main

    ts = main(["smoke", "--preset", "legacy-ppo2", "--env",
               "deep_mimic_mujoco", "--motion", "walk", "--robot",
               "humanoid3d", "--n-envs", "4", "--minibatch", "64",
               "--total", "1024", "--eval-every", "10000000",
               "--no-wandb", "--no-render", "--out", str(tmp_path)])
    assert int(ts.global_step) >= 1024
    import json, glob
    logs = glob.glob(str(tmp_path / "*_metrics.jsonl"))
    rows = [json.loads(l) for l in open(logs[0])]
    assert rows[0]["config"]["epochs"] == 4
    assert rows[0]["config"]["horizon"] == 128
