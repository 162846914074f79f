"""Quick behavioral probe of a policy checkpoint.

Rolls the deterministic policy from several start frames and prints
survival time, root displacement, and episode reward — the fast
"what is this policy actually doing" check used during curriculum
work (a full eval dashboard is tools/play.py / rl/eval.py).

Usage:
  python -m deepmimic_mujoco_tpu.tools.probe --motion run \
      --robot unitree_g1 --policy pd --checkpoint runs/..._best
"""
from __future__ import annotations

import argparse

import numpy as np


def probe(env, net, params, starts=(0, 10, 20, 30), max_steps=400):
    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs.dp_env import DONE_REASON_NAMES
    from deepmimic_mujoco_tpu.rl import networks

    @jax.jit
    def episode(key, idx):
        state0, obs0 = env.reset(key, idx_init=idx)

        def body(carry, _):
            state, obs, alive = carry
            mean, _, _ = net.apply(params, obs)
            a = networks.env_action(net, obs, mean)
            nstate, out = env.step(state, a)
            alive_f = alive.astype(out.reward.dtype)
            rec = (out.reward * alive_f, alive, out.done_reason)
            nalive = alive & ~out.done
            state = jax.tree.map(
                lambda p, q: jnp.where(alive, p, q), nstate, state)
            obs = jnp.where(alive, out.obs, obs)
            return (state, obs, nalive), rec

        (state, _, _), (rews, alives, reasons) = jax.lax.scan(
            body, (state0, obs0, jnp.ones((), bool)), None,
            length=max_steps)
        ep_len = alives.sum()
        last = jnp.clip(ep_len - 1, 0, max_steps - 1)
        return rews.sum(), ep_len, reasons[last], state.qpos

    rows = []
    for s in starts:
        r, n, reason, qpos = episode(jax.random.PRNGKey(0),
                                     s % env.mocap_data_len)
        q0 = np.asarray(env.mocap_qpos[s % env.mocap_data_len])
        rows.append(dict(
            start=s, ep_rew=float(r), ep_len=int(n),
            reason=DONE_REASON_NAMES.get(int(reason), str(int(reason))),
            dx=float(np.asarray(qpos)[0] - q0[0]),
            z=float(np.asarray(qpos)[2])))
        print(f"start={s:3d} len={int(n):4d} rew={float(r):8.2f} "
              f"dx={rows[-1]['dx']:+6.2f} z={rows[-1]['z']:.2f} "
              f"({rows[-1]['reason']})")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="run")
    p.add_argument("--robot", default="unitree_g1")
    p.add_argument("--policy", default="torque", choices=["torque", "pd"])
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--max-steps", type=int, default=400)
    p.add_argument("--starts", type=int, nargs="+", default=[0, 10, 20, 30])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

    env = DPEnv(motion=args.motion, robot=args.robot)
    net = networks.make_policy(args.policy, env)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(args.checkpoint, tmpl)
    probe(env, net, params, starts=tuple(args.starts),
          max_steps=args.max_steps)


if __name__ == "__main__":
    main()
