#!/bin/bash
# Wave-1 continuation: the two G1 new-semantics fine-tunes (job 1,
# h3d walk, completed earlier: eval 601.7 / gate replay 615.6).
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --lr-final-frac 0.25 --eval-every 4000000"

timeout 3600 python -m deepmimic_mujoco_tpu.rl.train ns-finetune-g1-walk \
  $COMMON $NS --motion walk --robot unitree_g1 \
  --init-params runs/walk_test20260816-1420_50_videos/walk_test20260816-1420_50_best \
  --lr 1e-4 --total 40000000 \
  > runs/q_ns_g1_walk.log 2>&1

timeout 4200 python -m deepmimic_mujoco_tpu.rl.train ns-finetune-g1-run \
  $COMMON $NS --motion run --robot unitree_g1 \
  --init-params runs/run_test20260817-0507_52_videos/run_test20260817-0507_52_best \
  --lr 1e-4 --total 60000000 \
  > runs/q_ns_g1_run.log 2>&1

echo "QUEUE WAVE 1B DONE"
