#!/bin/bash
# G1 run rebuild under new semantics: replicate the round-2 ladder
# that first cracked this clip — warm from the STABLE walk policy with
# the log-std reset for re-exploration (the collapsed run policy's
# sigma ~= floor blocked recovery: 120M shaping steps plateaued at
# eval ~39), annealed alive+velmatch shaping, then a pure-reward
# polish continuation from the shaped best.
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --eval-every 4000000"

timeout 6000 python -m deepmimic_mujoco_tpu.rl.train ns-g1-run-ladder \
  $COMMON $NS --motion run --robot unitree_g1 --horizon 128 \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.3 --alive-bonus-decay 120000000 --vel-shaping 0.4 \
  --lr 2.5e-4 --total 160000000 \
  > runs/q_ns_g1_run_ladder.log 2>&1

echo "RUN LADDER DONE"

# getup from scratch: warm-from-walk actively hurt (r/step 0.044 after
# 150M vs 0.345 for a ZERO-ACTION policy) — the reference's
# pretty-totem-70 was likewise a from-scratch run.
timeout 4800 python -m deepmimic_mujoco_tpu.rl.train ns-g1-getup-scratch \
  $COMMON $NS --motion getup_facedown_slow_FSI --robot unitree_g1 \
  --lr 3e-4 --total 200000000 \
  > runs/q_ns_g1_getup_scratch.log 2>&1

echo "GETUP SCRATCH DONE"
