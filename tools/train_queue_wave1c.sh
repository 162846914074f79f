#!/bin/bash
# Wave 1c: (1) rebuild the G1 run policy under the new semantics with
# the round-2 shaping curriculum (plain fine-tuning stalled at eval
# ~48: the run clip's RSI inits are near-unrecoverable and the new
# solver semantics broke the old policy's survival); (2) first G1
# getup_facedown_slow_FSI training, warm from the new-semantics G1
# walk policy; (3) RK4-integrator h3d walk gate.
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --lr-final-frac 0.25 --eval-every 4000000"

timeout 4800 python -m deepmimic_mujoco_tpu.rl.train ns-g1-run-shaping \
  $COMMON $NS --motion run --robot unitree_g1 --horizon 128 \
  --init-params runs/run_test20260817-1801_13_videos/run_test20260817-1801_13_best \
  --alive-bonus 0.3 --alive-bonus-decay 80000000 --vel-shaping 0.4 \
  --lr 2.5e-4 --total 120000000 \
  > runs/q_ns_g1_run_shaping.log 2>&1

timeout 4800 python -m deepmimic_mujoco_tpu.rl.train ns-g1-getup \
  $COMMON $NS --motion getup_facedown_slow_FSI --robot unitree_g1 \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -1.0 --lr 2e-4 --total 150000000 \
  > runs/q_ns_g1_getup.log 2>&1

timeout 3600 python -m deepmimic_mujoco_tpu.rl.train rk4-h3d-walk \
  $COMMON $NS --rk4 --motion walk --robot humanoid3d \
  --init-params runs/walk_test20260817-1649_40_videos/walk_test20260817-1649_40_best \
  --lr 1e-4 --total 30000000 \
  > runs/q_rk4_h3d_walk.log 2>&1

echo "QUEUE WAVE 1C DONE"
