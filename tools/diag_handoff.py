"""Instrumented combined-env handoff probe.

Round-5 question: the hbuf policy completes a forced-fall recovery
cycle and then is marked FALLEN one step after the getup->RUN handoff
(runs/q_r5_cycles_hbuf.log).  A standing robot cannot physically fall
in one 16 ms step, so either (a) the policy exits getup badly behind
the clip (still bent over when the timer fires), or (b) the fallen
check's pitch/roll deviation vs the run-clip target trips for a
protocol reason.  This probe replays the same injected-fall episode
and prints, for every step near a motion transition, the quantities
the fallen check actually sees: curr/target root pitch+roll, z_com,
and the config-angle error.

Reference semantics under test: src/combined_env.py:398-445 (fallen,
amnesty) and :421-445 (transition ordering).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--inject-at", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--window", type=int, default=12,
                   help="steps of detail printed around each transition")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPCombinedEnv
    from deepmimic_mujoco_tpu.envs.combined_env import (
        GETUP, MOTION_NAMES)
    from deepmimic_mujoco_tpu.envs import reward as reward_lib
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

    env = DPCombinedEnv()
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(args.checkpoint, tmpl)
    fwd = jax.jit(lambda o: net.apply(params, o)[0])
    step = jax.jit(env.step)
    step_force = jax.jit(
        lambda s, a, q, v: env.step(s, a, force_state=(q, v)))

    @jax.jit
    def inspect(qpos, qvel, motion_id, n_steps):
        data = env._kinematic_data(qpos, qvel)
        idx = n_steps % env.motion_lengths[motion_id]
        mq, mv, mb, mg = env._mocap_at(motion_id, idx)
        rew = reward_lib.calc_imitation_reward(
            env.reward_tables, qpos, qvel, data.kin.geom_xpos,
            data.kin.xpos, mq, mv, mg, mb)
        mass = jnp.asarray(env.model.body_mass, qpos.dtype)[:, None]
        z_com = ((data.kin.xipos * mass).sum(0) / mass.sum())[2]
        return (rew.curr_root_pitch, rew.target_root_pitch,
                rew.curr_root_roll, rew.target_root_roll, z_com,
                jnp.abs(rew.config_angle_diffs).sum())

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(args.seed))
    fall_qpos = env.mocap_qpos[GETUP, 0]
    fall_qvel = jnp.zeros_like(env.mocap_qvel[GETUP, 0])

    last_motion = int(state.motion_id)
    detail_until = -1
    injected = False
    for i in range(args.steps):
        a = jnp.asarray(np.asarray(fwd(obs)))
        if i == args.inject_at and not injected:
            state, out = step_force(state, a, fall_qpos, fall_qvel)
            injected = True
            print(f"step {i}: INJECT facedown")
        else:
            state, out = step(state, a)
        mid = int(state.motion_id)
        if mid != last_motion:
            print(f"step {i}: {MOTION_NAMES[last_motion]} -> "
                  f"{MOTION_NAMES[mid]} (n_steps reset)")
            last_motion = mid
            detail_until = i + args.window
        if i <= detail_until:
            cp, tp, cr, tr, z, cfg = inspect(
                state.qpos, state.qvel, state.motion_id,
                state.n_steps - 1)
            print(f"  step {i} m={MOTION_NAMES[mid]:8s} "
                  f"n={int(state.n_steps)-1:4d} "
                  f"pitch {float(cp):+.2f} vs {float(tp):+.2f} "
                  f"roll {float(cr):+.2f} vs {float(tr):+.2f} "
                  f"z_com {float(z):.3f} cfg_err {float(cfg):.1f} "
                  f"rew {float(out.reward):.3f}")
        if bool(out.done):
            print(f"DONE at {i} reason {int(out.done_reason)}")
            break
        obs = out.obs


if __name__ == "__main__":
    main()
