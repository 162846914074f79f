"""Diagnose the G1 run gate's sensitivity to the round-3 engine
semantics flip (VERDICT r3 'Next' #1).

Replays the round-2 gated run checkpoint (trained under the OLD
semantics: no warm-start lambda, no mesh sub-capsules) under all four
flag combinations, plus the new-semantics ladder checkpoints, and
reports episode reward / length / done_reason from the gate's
idx_init=20. Attribution question: which flag makes the run clip
untrainable under the new defaults?

Usage: python tools/diag_run_semantics.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.rl import networks
from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def episode(ckpt, motion, robot, idx_init, max_steps=1000, **env_kwargs):
    env = DPEnv(motion=motion, robot=robot, **env_kwargs)
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(ckpt, tmpl)

    @jax.jit
    def run(key):
        state0, obs0 = env.reset(key, idx_init=idx_init)

        def body(carry, _):
            state, obs, alive, reason = carry
            mean, _, _ = net.apply(params, obs)
            nstate, out = env.step(state, mean)
            alive_f = alive.astype(out.reward.dtype)
            r = out.reward * alive_f
            newly_done = alive & out.done
            reason = jnp.where(newly_done, out.done_reason, reason)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda a, b: jnp.where(alive, a, b), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive, reason), (r, alive)

        (_, _, _, reason), (rews, alives) = jax.lax.scan(
            body, (state0, obs0, jnp.ones((), bool), jnp.zeros((), jnp.int32)),
            None, length=max_steps)
        return rews.sum(), alives.sum(), reason

    r, n, reason = run(jax.random.PRNGKey(0))
    return float(r), int(n), int(reason)


if __name__ == "__main__":
    from deepmimic_mujoco_tpu.envs.dp_env import DONE_REASON_NAMES

    old_ckpt = os.path.join(
        REPO, "runs/run_test20260817-0507_52_videos/run_test20260817-0507_52_best")
    configs = [
        ("OLD  (ws=F sc=1)", dict(warm_start_lam=False, mesh_subcapsules=1)),
        ("NEW  (ws=T sc=2)", dict(warm_start_lam=True, mesh_subcapsules=2)),
        ("ws only (ws=T sc=1)", dict(warm_start_lam=True, mesh_subcapsules=1)),
        ("sc only (ws=F sc=2)", dict(warm_start_lam=False, mesh_subcapsules=2)),
    ]
    print("== round-2 gated run checkpoint (trained under OLD) ==")
    for name, kw in configs:
        r, n, reason = episode(old_ckpt, "run", "unitree_g1", 20, **kw)
        print(f"  {name}: ep_rew {r:8.2f} ep_len {n:4d} "
              f"done={DONE_REASON_NAMES.get(reason, reason)}")

    # new-semantics ladder artifacts, replayed under NEW defaults
    for ck in ["runs/run_test20260819-1037_09_videos/run_test20260819-1037_09_best",
               "runs/run_test20260819-1105_28_videos/run_test20260819-1105_28_best"]:
        p = os.path.join(REPO, ck)
        if os.path.isdir(p):
            r, n, reason = episode(p, "run", "unitree_g1", 20)
            print(f"== {ck}: ep_rew {r:8.2f} ep_len {n:4d} "
                  f"done={DONE_REASON_NAMES.get(reason, reason)}")
