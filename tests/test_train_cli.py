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
