"""Combined-env demo / playback (reference: src/combined_env.py:536-550).

Warm-starts the state machine by force-tracking the current motion for
the first N steps, then hands control to a policy (checkpoint params)
or small random actions; prints transitions and the episode reward.

Robustness probe (VERDICT r2 item 3): ``--inject-fall-every N``
force-sets a facedown pose every N steps (only while the policy is in
locomotion with amnesty earned), driving the fallen -> to_getup ->
getup -> walk|run state-machine path; completed recovery cycles are
counted and printed, and ``--assert-cycles K`` turns the run into a
regression gate.

Usage: python -m deepmimic_mujoco_tpu.tools.play_combined
           [--checkpoint params_dir] [--steps 2000] [--video out.mp4]
           [--inject-fall-every 400] [--assert-cycles 2]
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    """Returns ``(ep_rew, cycles)`` — episode reward and completed
    recovery-cycle count (a tuple since the --assert-cycles probe)."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--warmstart", type=int, default=500)
    p.add_argument("--video", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--inject-fall-every", type=int, default=0,
                   help="force a facedown pose every N steps (0 = off)")
    p.add_argument("--assert-cycles", type=int, default=0,
                   help="require >= K completed fall->getup->locomotion "
                        "recovery cycles")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPCombinedEnv
    from deepmimic_mujoco_tpu.envs.combined_env import (
        GETUP, MOTION_NAMES, RUN, TO_GETUP, WALK)

    env = DPCombinedEnv()
    if args.checkpoint:
        from deepmimic_mujoco_tpu.rl import networks
        from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

        net = networks.ActorCritic(env.action_size)
        tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
        params = restore_params(args.checkpoint, tmpl)
        fwd = jax.jit(lambda o: net.apply(params, o)[0])
        policy = lambda o, rng: np.asarray(fwd(jnp.asarray(o, jnp.float32)))
    else:
        policy = lambda o, rng: rng.uniform(
            -0.1, 0.1, env.action_size).astype(np.float32)
        print("No checkpoint: playing small random actions")

    rng = np.random.default_rng(args.seed)
    step = jax.jit(env.step)
    step_force = jax.jit(lambda s, a, q, v: env.step(s, a, force_state=(q, v)))
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(args.seed))
    # Facedown pose for fall injection: getup clip frame 0, zero vel.
    fall_qpos = env.mocap_qpos[GETUP, 0]
    fall_qvel = jnp.zeros_like(env.mocap_qvel[GETUP, 0])
    ep_rew = 0.0
    frames = []
    cycles = 0          # completed to_getup -> getup -> walk|run paths
    saw_to_getup = False
    inject_armed = False
    last_motion = int(state.motion_id)
    print("start motion:", MOTION_NAMES[last_motion])
    for i in range(args.steps):
        a = jnp.asarray(policy(np.asarray(obs), rng))
        # Arm on the schedule tick; fire at the first step the robot is
        # actually in locomotion with amnesty earned — a tick that lands
        # mid-recovery is deferred, not dropped (an N small relative to
        # AMNESTY_STEPS + getup duration would otherwise silently skip
        # injections and fail --assert-cycles for scheduling reasons).
        if (args.inject_fall_every and i >= args.warmstart
                and i % args.inject_fall_every == 0):
            inject_armed = True
        inject = (inject_armed
                  and int(state.motion_id) in (WALK, RUN)
                  and int(state.n_steps) > env.ENV_CFG.AMNESTY_STEPS)
        if inject:
            inject_armed = False
            print(f"step {i}: injecting fall (facedown force-state)")
            state, out = step_force(state, a, fall_qpos, fall_qvel)
        elif i < args.warmstart:
            q, v = env.get_current_motion_state(state)
            state, out = step_force(state, a, q, v)
        else:
            state, out = step(state, a)
        obs = out.obs
        ep_rew += float(out.reward)
        mid = int(state.motion_id)
        if mid != last_motion:
            print(f"step {i}: changing to motion: {MOTION_NAMES[mid]}")
            if mid == TO_GETUP:
                saw_to_getup = True
            elif mid in (WALK, RUN) and last_motion == GETUP and saw_to_getup:
                # the getup->loco switch fires on a TIMER; only count a
                # recovery if the robot is actually up (root z: G1
                # standing ~0.79, lying ~0.1 — see the honest-cycle fix
                # in tests/test_checkpoint_gates.py, round 5)
                if float(state.qpos[2]) > 0.5:
                    cycles += 1
                    saw_to_getup = False
                    print(f"step {i}: recovery cycle #{cycles} complete")
                else:
                    print(f"step {i}: getup timer expired NOT up "
                          f"(root z {float(state.qpos[2]):.2f}) — "
                          "not counted as a recovery")
            last_motion = mid
        if args.video and i % 4 == 0:
            from deepmimic_mujoco_tpu.tools.render import render_state

            frames.append(render_state(
                env.model, np.asarray(state.qpos), mode="rgb_array",
                overlay=f"{MOTION_NAMES[mid][-8:]} {i:>5} {ep_rew:>8.2f}"))
        if bool(out.done):
            print("done at", i, "reason code", int(out.done_reason))
            break
    print(f"Episode reward: {ep_rew:.2f}  recovery cycles: {cycles}")
    if args.video and frames:
        from deepmimic_mujoco_tpu.tools.render import frames_to_video

        print("Saved", frames_to_video(frames, args.video))
    if args.assert_cycles and cycles < args.assert_cycles:
        # SystemExit, not assert: the gate must survive python -O
        raise SystemExit(
            f"combined robustness gate: {cycles} < {args.assert_cycles} "
            "recovery cycles")
    return ep_rew, cycles


if __name__ == "__main__":
    main()
