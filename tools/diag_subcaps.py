"""Kinematic contact census along a mocap clip: subcapsules 1 vs 2.

Round-5 question: why does G1 *run* training stall under the default
engine (mesh_subcapsules=2) while it climbs under the round-2 config
(subcapsules=1)?  (F1-vs-F2 falsification, runs/q_r5_run_cold_F*.log.)
Hypothesis: the 2-subcapsule mesh proxies — gap-calibrated at the
"stand" keyframe (physics/collision.py:calibrate_proxy_gaps) — produce
phantom self-collision penetrations in the extreme hip/knee poses of
the run cycle, injecting forces a runner cannot avoid.

This probe replays the clip KINEMATICALLY (position_stage only, no
dynamics) at every mocap frame and reports, per engine config, the
active-contact census: which geom pairs touch, at what depth, frame by
frame.  Pairs active under subcaps=2 but never under subcaps=1 (or at
much larger penetration) are the phantoms.

Reference for the workload: src/play_g1_run_polar_breeze.py (the run
gate); G1 model asset/deepmimic_unitree_g1.xml.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census(env, label):
    import jax
    import jax.numpy as jnp

    eng = env.engine
    m = eng.m
    gnames = list(m.geom_names)

    @jax.jit
    def contacts_at(qpos):
        _, _, c = eng.position_stage(qpos)
        return c

    batched = jax.jit(jax.vmap(contacts_at))
    cs = batched(env.mocap_qpos)
    active = np.asarray(cs.dist < cs.includemargin)      # (T, K)
    dist = np.asarray(cs.dist)
    g1 = np.asarray(cs.geom1)
    g2 = np.asarray(cs.geom2)
    T = active.shape[0]

    stats = {}
    for t in range(T):
        for k in np.nonzero(active[t])[0]:
            key = (int(g1[t, k]), int(g2[t, k]))
            s = stats.setdefault(key, [0, 0.0, t, t])
            s[0] += 1
            s[1] = min(s[1], float(dist[t, k]))
            s[3] = t
    print(f"\n== {label}: {len(stats)} active pairs over {T} frames ==")
    for (a, b), (n, dmin, t0, t1) in sorted(
            stats.items(), key=lambda kv: kv[1][1]):
        print(f"  {gnames[a]:>28s} x {gnames[b]:<28s} "
              f"frames {n:4d} [{t0:3d}..{t1:3d}] min_dist {dmin:+.4f}")
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--motion", default="run")
    p.add_argument("--robot", default="unitree_g1")
    args = p.parse_args()

    from deepmimic_mujoco_tpu.envs import DPEnv

    out = {}
    for sub in (1, 2):
        env = DPEnv(motion=args.motion, robot=args.robot,
                    mesh_subcapsules=sub)
        out[sub] = census(env, f"subcapsules={sub}")

    only2 = set(out[2]) - set(out[1])
    print(f"\n== pairs active ONLY under subcapsules=2: {len(only2)} ==")
    env = DPEnv(motion=args.motion, robot=args.robot, mesh_subcapsules=2)
    gnames = list(env.engine.m.geom_names)
    for a, b in sorted(only2):
        n, dmin, t0, t1 = out[2][(a, b)]
        print(f"  {gnames[a]:>28s} x {gnames[b]:<28s} "
              f"frames {n:4d} [{t0:3d}..{t1:3d}] min_dist {dmin:+.4f}")


if __name__ == "__main__":
    main()
