#!/bin/bash
# Round-3 wave 1: retrain the gated single-motion policies under the
# NEW engine semantics (warm-started solver lambda + G1 mesh
# sub-capsule proxies), plus the new G1 getup_facedown_slow_FSI
# behavior (reference: src/play_g1_facedown_slow_pretty_totem.py).
# Sequential: one TPU client at a time.
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --lr-final-frac 0.25"

timeout 2100 python -m deepmimic_mujoco_tpu.rl.train ns-finetune-h3d-walk \
  $COMMON $NS --motion walk --robot humanoid3d \
  --init-params runs/walk_final_params \
  --lr 1e-4 --total 30000000 \
  > runs/q_ns_h3d_walk.log 2>&1

timeout 2400 python -m deepmimic_mujoco_tpu.rl.train ns-finetune-g1-walk \
  $COMMON $NS --motion walk --robot unitree_g1 \
  --init-params runs/walk_test20260816-1420_50_videos/walk_test20260816-1420_50_best \
  --lr 1e-4 --total 40000000 \
  > runs/q_ns_g1_walk.log 2>&1

timeout 3000 python -m deepmimic_mujoco_tpu.rl.train ns-finetune-g1-run \
  $COMMON $NS --motion run --robot unitree_g1 \
  --init-params runs/run_test20260817-0507_52_videos/run_test20260817-0507_52_best \
  --lr 1e-4 --total 60000000 \
  > runs/q_ns_g1_run.log 2>&1

echo "QUEUE WAVE 1 DONE"
