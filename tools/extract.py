"""Extract a trained checkpoint to the numpy-only deployment artifact.

Reference: src/extracted_policy.py (hand-inlined numpy MLP) and
src/play_extracted.py (episode replay of the artifact). Here the
extraction is a function of any checkpoint; the artifact is .npz +
golden-vector JSON (rl/extracted_policy.py).

Usage: python tools/extract.py --checkpoint runs/run_r5_default_gate \
           --motion run --robot unitree_g1 --out runs/run_extracted.npz
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--motion", default="run")
    p.add_argument("--robot", default="unitree_g1")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from deepmimic_mujoco_tpu.envs import DPEnv
    from deepmimic_mujoco_tpu.rl import networks
    from deepmimic_mujoco_tpu.rl.checkpoint import restore_params
    from deepmimic_mujoco_tpu.rl.extracted_policy import (
        ExtractedPolicy, extract_policy)

    env = DPEnv(motion=args.motion, robot=args.robot)
    net = networks.ActorCritic(env.action_size)
    tmpl = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_size))
    params = restore_params(args.checkpoint, tmpl)
    _, obs0 = env.reset(jax.random.PRNGKey(0), idx_init=20)
    path = extract_policy(jax.tree.map(np.asarray, params),
                          np.asarray(obs0), args.out)
    pol = ExtractedPolicy(path)
    pol.test()
    meta = {"source_checkpoint": args.checkpoint,
            "motion": args.motion, "robot": args.robot}
    with open(path.replace(".npz", "_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("extracted:", path, "golden self-test OK")


if __name__ == "__main__":
    main()
