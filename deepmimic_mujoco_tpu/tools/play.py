"""Checkpoint playback / regression gate.

Covers the reference's play_* scripts (reference:
src/play_g1_run_polar_breeze.py, src/play_g1_walk_absurd_snow.py,
src/play_extracted.py): load a trained policy (orbax params or
extracted .npz), run a deterministic episode, optionally render a
video, print the initial qpos/qvel as JS arrays, and assert a minimum
episode reward as a regression gate (reference asserts > 90 at
src/play_g1_run_polar_breeze.py:50).

Usage:
  python -m deepmimic_mujoco_tpu.tools.play --motion run --robot unitree_g1 \
      --checkpoint ~/deep_mimic/run_best --assert-reward 90 --video out.mp4
"""
from __future__ import annotations

import argparse

import numpy as np


def log_actobs(step_i, action, obs):
    """Print action/obs as JS arrays (reference: src/play_extracted.py)."""
    print(f"// step {step_i}")
    print("action = [", ", ".join(f"{x:.6f}" for x in np.asarray(action)), "];")
    print("obs = [", ", ".join(f"{x:.6f}" for x in np.asarray(obs)), "];")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--motion", default="walk")
    p.add_argument("--robot", default="humanoid3d")
    p.add_argument("--checkpoint", default=None,
                   help="orbax params dir or extracted .npz")
    p.add_argument("--policy", default="torque",
                   choices=["torque", "pd"],
                   help="policy parameterization the checkpoint was "
                        "trained with (see rl/networks.py:make_policy)")
    p.add_argument("--idx-init", type=int, default=20)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--assert-reward", type=float, default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--print-js", action="store_true",
                   help="print init qpos/qvel as JS arrays")
    p.add_argument("--log-actobs", action="store_true")
    p.add_argument("--warm-start-lam", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--mesh-subcapsules", type=int, default=None)
    p.add_argument("--rk4", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import GymDPEnv

    integrator = None
    if args.rk4:
        from deepmimic_mujoco_tpu.models.physics_model import RK4
        integrator = RK4
    eng_kw = {k: v for k, v in dict(
        warm_start_lam=args.warm_start_lam,
        mesh_subcapsules=args.mesh_subcapsules,
        integrator=integrator).items() if v is not None}
    env = GymDPEnv(motion=args.motion, robot=args.robot, **eng_kw)
    obs = env.reset_model(idx_init=args.idx_init)

    if args.print_js:
        print("qpos = [", ", ".join(f"{x:.6f}" for x in env.sim_qpos), "];")
        print("qvel = [", ", ".join(f"{x:.6f}" for x in env.sim_qvel), "];")

    # policy
    if args.checkpoint is None:
        policy = lambda o: np.zeros(env.action_space.shape[0], np.float32)
        print("No checkpoint: playing zero-torque policy")
    elif args.checkpoint.endswith(".npz"):
        from deepmimic_mujoco_tpu.rl.extracted_policy import ExtractedPolicy

        ep = ExtractedPolicy(args.checkpoint)
        if ep.golden is not None:
            ep.test()
            print("Extracted policy golden-vector test OK")
        policy = ep.act
    else:
        from deepmimic_mujoco_tpu.rl import networks
        from deepmimic_mujoco_tpu.rl.checkpoint import restore_params

        net = networks.make_policy(args.policy, env)
        template = net.init(jax.random.PRNGKey(0),
                            jnp.zeros(env.observation_space.shape[0]))
        params = restore_params(args.checkpoint, template)

        def fwd_fn(o):
            mean = net.apply(params, o)[0]
            return networks.env_action(net, o, mean)

        fwd = jax.jit(fwd_fn)
        policy = lambda o: np.asarray(fwd(jnp.asarray(o, jnp.float32)))

    frames = []
    ep_rew = 0.0
    for i in range(args.max_steps):
        a = policy(obs)
        if args.log_actobs:
            log_actobs(i, a, obs)
        obs, r, done, info = env.step(a)
        ep_rew += r
        if args.video and i % 2 == 0:
            frames.append(env.render(mode="rgb_array"))
        if done:
            print("done_reason:", info.get("done_reason", ""))
            break

    print(f"Episode reward: {ep_rew:.2f} over {env.episode_length} steps")
    if args.video and frames:
        from deepmimic_mujoco_tpu.tools.render import frames_to_video

        print("Saved", frames_to_video(frames, args.video))
    if args.assert_reward is not None:
        assert ep_rew > args.assert_reward, (
            f"Regression gate failed: {ep_rew:.2f} <= {args.assert_reward}")
        print(f"Regression gate OK (> {args.assert_reward})")
    return ep_rew


if __name__ == "__main__":
    main()
