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


def test_cross_env_warm_start_adapts_obs_width(tmp_path):
    """DPEnv checkpoint warm-starts the combined-env trainer: the
    combined obs appends player-action dims, so the first-layer kernels
    are zero-padded (rl/checkpoint.py:adapt_params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepmimic_mujoco_tpu.rl import checkpoint, networks

    net = networks.ActorCritic(5)
    src = net.init(jax.random.PRNGKey(0), jnp.zeros(10))
    tgt = net.init(jax.random.PRNGKey(1), jnp.zeros(17))
    out = checkpoint.adapt_params(src, tgt)
    k = out["params"]["Dense_0"]["kernel"]
    assert k.shape == (17, 256)
    np.testing.assert_array_equal(
        k[:10], np.asarray(src["params"]["Dense_0"]["kernel"]))
    assert (k[10:] == 0).all()
    # identical behavior on zero-extended inputs
    o = jnp.ones(10)
    o_ext = jnp.concatenate([o, jnp.zeros(7)])
    a0, ls0, v0 = net.apply(src, o)
    a1, ls1, v1 = net.apply(out, o_ext)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-6)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
