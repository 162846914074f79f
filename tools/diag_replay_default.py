"""Replay a committed checkpoint under arbitrary engine kwargs.

Round-5 probe: what does the round-2 G1 run gate checkpoint
(run_test20260817-0507_52, 116.4 under its pinned round-2 semantics)
score under the CURRENT default engine (pair-keyed warm start +
mesh_subcapsules=2)?  Round 4 only measured the slot-keyed variants
(old 114.8 / subcaps-only 115.7 / slot-keyed 20.2 / both 45.0); the
pair-keyed default was never replayed.  Reference gate:
/root/reference/src/play_g1_run_polar_breeze.py:50 (ep_rew > 90).
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/run_test20260817-0507_52_videos/"
                   "run_test20260817-0507_52_best")
    p.add_argument("--motion", default="run")
    p.add_argument("--robot", default="unitree_g1")
    p.add_argument("--idx", type=int, default=20)
    p.add_argument("--no-warm-start", action="store_true")
    p.add_argument("--subcapsules", type=int, default=None)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_checkpoint_gates import _episode_reward

    kw = {}
    if args.no_warm_start:
        kw["warm_start_lam"] = False
    if args.subcapsules is not None:
        kw["mesh_subcapsules"] = args.subcapsules
    rew, ov = _episode_reward(args.ckpt, args.motion, args.robot, args.idx,
                              env_kwargs=kw)
    print(f"REPLAY ckpt={args.ckpt} kwargs={kw} idx={args.idx} "
          f"ep_rew={rew:.2f} overflow={ov}")


if __name__ == "__main__":
    main()
