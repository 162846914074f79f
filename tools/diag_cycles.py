"""Recovery-cycle scan over combined-env checkpoints/seeds.

Runs the exact jitted injected-fall episode the combined gate uses
(tests/test_checkpoint_gates.py::test_combined_env_gate) over a list
of checkpoints and seeds, printing clean reward/length and completed
fall -> to_getup -> getup -> locomotion cycles.  Used to decide which
checkpoint can arm min_cycles=2 (reference flagship workload:
src/sb3_ppo.py:277-313; transitions src/combined_env.py:398-445).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoints", nargs="+")
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPCombinedEnv
    from deepmimic_mujoco_tpu.envs.combined_env import (
        GETUP, RUN, TO_GETUP, WALK)
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

    env = DPCombinedEnv()
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    fall_qpos = env.mocap_qpos[GETUP, 0]
    fall_qvel = jnp.zeros_like(env.mocap_qvel[GETUP, 0])
    amnesty = env.ENV_CFG.AMNESTY_STEPS

    def make_episode(params):
        def episode(key, inject_every):
            state0, obs0 = env.reset(key)

            def body(carry, i):
                state, obs, alive, armed, saw_tg, cycles = carry
                mean, _, _ = net.apply(params, obs)
                armed = armed | (inject_every & (i % 300 == 0) & (i > 0))
                in_loco = ((state.motion_id == WALK)
                           | (state.motion_id == RUN))
                inject = armed & in_loco & (state.n_steps > amnesty) & alive
                nstate_f, out_f = env.step(
                    state, mean, force_state=(fall_qpos, fall_qvel))
                nstate_d, out_d = env.step(state, mean)
                nstate = jax.tree.map(
                    lambda a, b: jnp.where(inject, a, b), nstate_f, nstate_d)
                out = jax.tree.map(
                    lambda a, b: jnp.where(inject, a, b), out_f, out_d)
                armed = armed & ~inject
                prev, cur = state.motion_id, nstate.motion_id
                changed = (cur != prev) & alive
                saw_tg = saw_tg | (changed & (cur == TO_GETUP))
                # honest accounting: the getup->loco switch is a TIMER
                # event; only count it as a recovery if the robot is
                # actually up (see tests/test_checkpoint_gates.py)
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
        return jax.jit(episode)

    for ckpt in args.checkpoints:
        params = restore_params(ckpt, tmpl)
        episode = make_episode(params)
        for seed in args.seeds:
            key = jax.random.PRNGKey(seed)
            crew, clen, _ = episode(key, jnp.asarray(False))
            irew, ilen, cyc = episode(key, jnp.asarray(True))
            print(f"{ckpt} seed={seed} clean {float(crew):7.2f}/"
                  f"{int(clen):4d}  injected {float(irew):7.2f}/"
                  f"{int(ilen):4d} cycles={int(cyc)}", flush=True)


if __name__ == "__main__":
    main()
