"""Trained-checkpoint behavioral regression gates.

The reference's only behavior-level regression test is
play_g1_run_polar_breeze.py:50 (`assert ep_rew > 90` on a trained
checkpoint). These tests formalize that pattern against checkpoints
committed in runs/: any engine/env change that breaks a trained
policy's dynamics contract fails here (observed failure mode: solver
warm-start moved the walk gate from 339 to 27).

Episodes run as one jitted scan; ~1-2 min each on CPU.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.models.physics_model import RK4
from deepmimic_mujoco_tpu.rl import networks
from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = [
    # (checkpoint dir, motion, robot, idx_init, min reward, env kwargs)
    # Round-3 new-DEFAULT-semantics policies (warm-started solver
    # lambda + G1 mesh sub-capsules): empty kwargs = engine defaults.
    ("runs/walk_test20260817-1649_40_videos/walk_test20260817-1649_40_best",
     "walk", "humanoid3d", 20, 90.0, {}),       # replay 615.6
    ("runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best",
     "walk", "unitree_g1", 20, 90.0, {}),       # replay 324.3
    # Trained AND gated under the reference MJCF integrator (RK4):
    # certifies reference-semantics dynamics, not just Euler
    # self-consistency.
    ("runs/walk_test20260817-1918_14_videos/walk_test20260817-1918_14_best",
     "walk", "humanoid3d", 20, 90.0, {"integrator": RK4}),  # 655.2
    # G1 run gate (reference: src/play_g1_run_polar_breeze.py:50):
    # EMPTY kwargs = current engine defaults (pair-keyed warm start +
    # mesh_subcapsules=2). Round-5 contact-dynamics curriculum: the
    # round-2 gait (trained under cold-start/1-subcapsule semantics,
    # replays 2.3 under the new defaults) fine-tuned for ~170M steps
    # under the default engine — replay 123.79 at commit, above the
    # old-semantics 116.4 (runs/q_r5_replay_newft.log; leg log
    # q_r5_run_default_ft.log).
    ("runs/run_r5_default_gate",
     "run", "unitree_g1", 20, 90.0, {}),
    # G1 facedown getup — the third behavior the reference demonstrates
    # from a committed checkpoint ("PRETTY TOTEM 70",
    # src/play_g1_facedown_slow_pretty_totem.py:9-28, idx_init=0).
    # Round-4 continuation of the round-3 checkpoint (whose "eval 9.7"
    # was an RSI-start eval artifact — it replayed 58.5 from frame 0;
    # see tools/diag_getup.py): best frame-0 eval 69.4 over the full
    # 333-step clip under default engine semantics, matching the
    # reference's ~70.
    ("runs/getup_facedown_slow_FSI_test20260819-1856_58_videos/"
     "getup_facedown_slow_FSI_test20260819-1856_58_best",
     "getup_facedown_slow_FSI", "unitree_g1", 0, 60.0, {}),
]


def _episode_reward(ckpt, motion, robot, idx_init, max_steps=1000,
                    env_kwargs=None):
    env = DPEnv(motion=motion, robot=robot, **(env_kwargs or {}))
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(ckpt, tmpl)

    @jax.jit
    def episode(key):
        state0, obs0 = env.reset(key, idx_init=idx_init)

        def body(carry, _):
            state, obs, alive = carry
            mean, _, _ = net.apply(params, obs)
            nstate, out = env.step(state, mean)
            alive_f = alive.astype(out.reward.dtype)
            r = out.reward * alive_f
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            # contact-slot saturation while the policy is alive: top-K
            # dropping an active contact silently changes dynamics, so
            # a gate replay must also certify the episode ran lossless
            ov = out.contact_overflow * alive.astype(jnp.int32)
            return (state, obs, nalive), (r, ov)

        _, (rews, ovs) = jax.lax.scan(
            body, (state0, obs0, jnp.ones((), bool)), None,
            length=max_steps)
        return rews.sum(), ovs.max()

    rew, ov = episode(jax.random.PRNGKey(0))
    return float(rew), int(ov)


@pytest.mark.parametrize("ckpt,motion,robot,idx,min_rew,env_kwargs",
                         GATES)
def test_checkpoint_gate(ckpt, motion, robot, idx, min_rew, env_kwargs):
    path = os.path.join(_REPO, ckpt)
    if not os.path.isdir(path):
        pytest.skip(f"checkpoint not committed yet: {ckpt}")
    rew, overflow = _episode_reward(path, motion, robot, idx,
                                    env_kwargs=env_kwargs)
    assert rew > min_rew, (
        f"{motion}/{robot} gate failed: ep_rew {rew:.2f} <= {min_rew}")
    assert overflow == 0, (
        f"{motion}/{robot} gate episode dropped {overflow} active "
        "contacts (top-K slot saturation) — raise max_contacts or fix "
        "collision compaction; the replayed dynamics were lossy")


# Combined-env gate checkpoints, most-preferred first: (path, min
# reward, min episode length, min recovery cycles). Episodes run 2000
# steps (the combined env's MAX_EP_LENGTH).
#
# Cycle accounting is HONEST as of round 5: the getup->loco switch
# fires on a timer, so a completed cycle additionally requires the
# robot to actually be up at the switch (root z > 0.5) — round-4's
# "1 recovery cycle" was a policy lying flat through the getup window
# being credited by the timeout (runs/q_r5_handoff_diag.log). Under
# honest accounting the round-4 checkpoint measures clean 92.6 /
# len 1692 / 0 real cycles (runs/q_r5_cycles_honest.log); the cycle
# bar arms (target >= 2) once the facedown-curriculum leg
# (--facedown-rsi, runs/q_r5_combined_facedown.log) produces a policy
# that genuinely gets up after an injected fall.
_COMBINED_GATES = [
    # round-5 hbuf policy (on-policy handoff buffer leg): clean 154.2
    # over the FULL 2000-step cap (the round-4 in-train eval that
    # reported 91 capped episodes at 1000 steps and undersold it);
    # measured in runs/q_r5_cycles_honest.log.
    ("runs/combined_r5_best", 100.0, 1900, 0),
    ("runs/combined_r4_best", 70.0, 1500, 0),
    ("runs/walk_test20260817-0951_50_videos/"
     "walk_test20260817-0951_50_best", 40.0, 900, 0),
]


def test_combined_env_gate():
    """Combined-env (the reference's flagship training workload,
    src/sb3_ppo.py:277-313) behavioral gate under current engine
    defaults: episode reward/length on a clean episode, plus — for
    checkpoints trained for it — completed fall -> to_getup -> getup ->
    locomotion recovery cycles under periodic forced facedown falls
    (reference transitions: src/combined_env.py:398-445). Episodes run
    as one jitted scan; falls are injected by force-state every 300
    steps once the robot is in locomotion past amnesty."""
    from deepmimic_mujoco_tpu.envs import DPCombinedEnv
    from deepmimic_mujoco_tpu.envs.combined_env import (
        GETUP, RUN, TO_GETUP, WALK,
    )

    for path, min_rew, min_len, min_cycles in _COMBINED_GATES:
        ckpt = os.path.join(_REPO, path)
        if os.path.isdir(ckpt):
            break
    else:
        pytest.skip("no combined checkpoint committed")
    env = DPCombinedEnv()
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(ckpt, tmpl)
    fall_qpos = env.mocap_qpos[GETUP, 0]
    fall_qvel = jnp.zeros_like(env.mocap_qvel[GETUP, 0])
    amnesty = env.ENV_CFG.AMNESTY_STEPS

    @jax.jit
    def episode(key, inject_every):
        state0, obs0 = env.reset(key)

        def body(carry, i):
            state, obs, alive, armed, saw_tg, cycles = carry
            mean, _, _ = net.apply(params, obs)
            armed = armed | (inject_every & (i % 300 == 0) & (i > 0))
            in_loco = ((state.motion_id == WALK)
                       | (state.motion_id == RUN))
            inject = armed & in_loco & (state.n_steps > amnesty) & alive
            nstate_f, out_f = env.step(state, mean,
                                       force_state=(fall_qpos, fall_qvel))
            nstate_d, out_d = env.step(state, mean)
            nstate = jax.tree.map(
                lambda a, b: jnp.where(inject, a, b), nstate_f, nstate_d)
            out = jax.tree.map(
                lambda a, b: jnp.where(inject, a, b), out_f, out_d)
            armed = armed & ~inject
            # recovery-cycle accounting on motion_id transitions
            prev, cur = state.motion_id, nstate.motion_id
            changed = (cur != prev) & alive
            saw_tg = saw_tg | (changed & (cur == TO_GETUP))
            # a REAL recovery requires the robot to actually be up at
            # the getup -> locomotion switch: the switch itself fires
            # on a TIMER (reference quirk, src/combined_env.py:400-403)
            # and round-5 instrumentation (runs/q_r5_handoff_diag.log)
            # caught a policy lying flat through the whole getup window
            # being credited with a "completed cycle" by the timeout.
            # Root z: G1 standing ~0.79, lying ~0.1.
            is_up = nstate.qpos[2] > 0.5
            completed = (changed & (prev == GETUP)
                         & ((cur == WALK) | (cur == RUN)) & saw_tg
                         & is_up)
            cycles = cycles + completed.astype(jnp.int32)
            saw_tg = saw_tg & ~completed
            r = out.reward * alive.astype(out.reward.dtype)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive, armed, saw_tg, cycles), (r, alive)

        init = (state0, obs0, jnp.ones((), bool), jnp.zeros((), bool),
                jnp.zeros((), bool), jnp.zeros((), jnp.int32))
        (_, _, _, _, _, cycles), (rews, alives) = jax.lax.scan(
            body, init, jnp.arange(2000))
        return rews.sum(), alives.sum(), cycles

    # clean episode: reward/length (the reference's replay protocol)
    rew, length, _ = episode(jax.random.PRNGKey(0), jnp.asarray(False))
    assert float(rew) > min_rew, f"combined gate: ep_rew {float(rew):.2f}"
    assert int(length) >= min_len, f"combined gate: ep_len {int(length)}"
    if min_cycles:
        # injected episode: recovery-cycle robustness
        _, _, cycles = episode(jax.random.PRNGKey(0), jnp.asarray(True))
        assert int(cycles) >= min_cycles, (
            f"combined gate: {int(cycles)} recovery cycles < {min_cycles}")


def test_extracted_policy_gate():
    """The numpy deployment artifact (reference pattern:
    src/extracted_policy.py + src/play_extracted.py) must pass the
    same reward gate as its source checkpoint: golden-vector
    self-test, then a full 1000-step episode with the artifact's
    weights under default engine semantics (reference gate:
    src/play_g1_run_polar_breeze.py:50)."""
    from deepmimic_mujoco_tpu.rl.extracted_policy import ExtractedPolicy

    path = os.path.join(_REPO, "runs/run_extracted.npz")
    if not os.path.exists(path):
        pytest.skip("no extracted artifact committed")
    pol = ExtractedPolicy(path)
    assert pol.test()
    assert pol.pd is None  # run policy is a torque policy

    env = DPEnv(motion="run", robot="unitree_g1")
    layers = [(jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
              for w, b in pol.layers]

    def act(obs):
        x = obs
        for i, (w, b) in enumerate(layers):
            x = x @ w + b
            if i < len(layers) - 1:
                x = jnp.tanh(x)
        return x

    @jax.jit
    def episode(key):
        state0, obs0 = env.reset(key, idx_init=20)

        def body(carry, _):
            state, obs, alive = carry
            nstate, out = env.step(state, act(obs))
            r = out.reward * alive.astype(out.reward.dtype)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive), r

        _, rews = jax.lax.scan(body, (state0, obs0, jnp.ones((), bool)),
                               None, length=1000)
        return rews.sum()

    rew = float(episode(jax.random.PRNGKey(0)))
    assert rew > 90.0, f"extracted run gate: ep_rew {rew:.2f}"


def test_sac_gate():
    """SAC-trained walk policy gate (reference SAC script:
    src/sac_sb3.py). Activates once a gated SAC actor is committed at
    the canonical path."""
    from deepmimic_mujoco_tpu.rl.sac import Actor

    ckpt = os.path.join(_REPO, "runs/sac_walk_best_actor")
    if not os.path.isdir(ckpt):
        pytest.skip("no gated SAC actor committed yet")
    env = DPEnv(motion="walk", robot="humanoid3d")
    actor = Actor(env.action_size, (1024, 512))
    tmpl = actor.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(ckpt, tmpl)

    @jax.jit
    def episode(key):
        state0, obs0 = env.reset(key, idx_init=20)

        def body(carry, _):
            state, obs, alive = carry
            mean, _ = actor.apply(params, obs)
            a = jnp.tanh(mean)
            nstate, out = env.step(state, a)
            r = out.reward * alive.astype(out.reward.dtype)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda x, y: jnp.where(alive, x, y), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive), r

        _, rews = jax.lax.scan(body, (state0, obs0, jnp.ones((), bool)),
                               None, length=1000)
        return rews.sum()

    rew = float(episode(jax.random.PRNGKey(0)))
    assert rew > 50.0, f"SAC walk gate: ep_rew {rew:.2f}"
