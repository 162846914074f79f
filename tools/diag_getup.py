"""Diagnose why G1 getup_facedown_slow_FSI training plateaus at eval
~10 when the reference trained it to ~70 (VERDICT r3 'Next' #2).

Measurements, all from the reference's replay protocol (idx_init=0,
deterministic; reference: src/play_g1_facedown_slow_pretty_totem.py):

  1. clip length and per-step PERFECT-TRACKING reward (force_state
     replay) — the reward ceiling along the clip;
  2. zero-action episode from prone init — does lying still already
     diverge / terminate early? per-step reward + qvel norms (prone
     contact stability under the engine defaults);
  3. the round-3 trained checkpoint's episode, with a per-step trace
     of reward and done_reason — what kills it at step ~55;
  4. the same trained checkpoint under the OLD engine semantics —
     attribution of the gap to the semantics flip vs the recipe.

Usage: python tools/diag_getup.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.envs.dp_env import DONE_REASON_NAMES
from deepmimic_mujoco_tpu.rl import networks
from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOTION = "getup_facedown_slow_FSI"


def trace_episode(env, policy_fn, idx_init=0, max_steps=1000):
    @jax.jit
    def run(key):
        state0, obs0 = env.reset(key, idx_init=idx_init)

        def body(carry, _):
            state, obs, alive = carry
            a = policy_fn(obs)
            nstate, out = env.step(state, a)
            alive_f = alive.astype(out.reward.dtype)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda x, y: jnp.where(alive, x, y), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            qv = jnp.linalg.norm(state.qvel)
            return (state, obs, nalive), (
                out.reward * alive_f, alive, out.done_reason, qv,
                out.reward_info.reward_config * alive_f,
                out.reward_info.reward_qvel * alive_f,
                out.reward_info.reward_end_eff * alive_f)

        _, tr = jax.lax.scan(body, (state0, obs0, jnp.ones((), bool)),
                             None, length=max_steps)
        return tr

    rews, alives, reasons, qvn, pr, vr, er = map(
        np.asarray, trace_episode.run(run) if False else run(jax.random.PRNGKey(0)))
    n = int(alives.sum())
    last = max(n - 1, 0)
    # done_reason at the step that terminated
    reason = int(reasons[last]) if n < max_steps else 0
    return dict(ep_rew=float(rews.sum()), ep_len=n,
                reason=DONE_REASON_NAMES.get(reason, reason),
                rews=rews, qvn=qvn, pose=pr, vel=vr, ee=er)


def summarize(tag, tr, clip_len):
    r = tr["rews"]
    n = tr["ep_len"]
    print(f"== {tag}: ep_rew {tr['ep_rew']:.2f} ep_len {n} "
          f"(clip {clip_len}) done={tr['reason']}")
    for a, b in [(0, 10), (max(n // 2 - 5, 0), max(n // 2 + 5, 10)),
                 (max(n - 10, 0), n)]:
        if b > a:
            print(f"   steps {a:3d}-{b:3d}: r/step {r[a:b].mean():.3f} "
                  f"pose {tr['pose'][a:b].mean():.3f} "
                  f"vel {tr['vel'][a:b].mean():.3f} "
                  f"ee {tr['ee'][a:b].mean():.3f} "
                  f"|qvel| {tr['qvn'][a:b].mean():.2f}")


if __name__ == "__main__":
    env = DPEnv(motion=MOTION, robot="unitree_g1")
    T = env.mocap_data_len
    print(f"clip len {T} frames @ dt {env.mocap_dt:.4f} "
          f"({T * env.mocap_dt:.2f}s)")

    # 1. perfect-tracking reward ceiling
    @jax.jit
    def perfect(key):
        state, _ = env.reset(key, idx_init=0)

        def body(carry, i):
            state = carry
            nstate, out = env.step(
                state, jnp.zeros(env.action_size),
                force_state=(env.mocap_qpos[(i + 1) % T],
                             env.mocap_qvel[(i + 1) % T]))
            return nstate, out.reward

        _, rews = jax.lax.scan(body, state, jnp.arange(T - 1))
        return rews

    pr = np.asarray(perfect(jax.random.PRNGKey(0)))
    print(f"perfect-tracking: total {pr.sum():.2f} mean/step {pr.mean():.3f} "
          f"min {pr.min():.3f} (ceiling for ep_rew from idx 0)")

    # 2. zero-action from prone
    zero = lambda obs: jnp.zeros(env.action_size)  # noqa: E731
    summarize("zero-action (NEW defaults)", trace_episode(env, zero), T)

    env_old = DPEnv(motion=MOTION, robot="unitree_g1",
                    warm_start_lam=False, mesh_subcapsules=1)
    summarize("zero-action (OLD semantics)", trace_episode(env_old, zero), T)

    # 3/4. round-3 trained checkpoint under both semantics
    ckpt = os.path.join(
        REPO, "runs/getup_facedown_slow_FSI_test20260819-1115_59_videos")
    best = None
    if os.path.isdir(ckpt):
        cands = [d for d in os.listdir(ckpt) if d.endswith("_best")]
        if cands:
            best = os.path.join(ckpt, cands[0])
    if best:
        net = networks.ActorCritic(env.action_size)
        tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
        params = restore_params(best, tmpl)
        pol = lambda obs: net.apply(params, obs)[0]  # noqa: E731
        summarize("r3 ckpt (NEW defaults)", trace_episode(env, pol), T)
        summarize("r3 ckpt (OLD semantics)", trace_episode(env_old, pol), T)
    else:
        print("no r3 getup checkpoint found at", ckpt)
