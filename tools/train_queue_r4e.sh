#!/bin/bash
# Relaunch of the r4b capability legs after the Mosaic
# dynamic_update_slice crash (fixed): getup continuation, combined
# fine-tune, SAC distill, then the run-ladder legs D/E and the TPU
# measurement gap.
set -x
cd /root/repo
COMMON="--no-wandb --no-render --out runs --adaptive-lr --target-kl 0.012 \
  --epochs 10 --log-std-min -1.5 --eval-every 4000000 --horizon 128"

timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.train r4-getup-cont \
  --env deep_mimic_mujoco $COMMON \
  --motion getup_facedown_slow_FSI --robot unitree_g1 \
  --init-params runs/getup_facedown_slow_FSI_test20260819-1115_59_videos/getup_facedown_slow_FSI_test20260819-1115_59_best \
  --lr 2e-4 --total 100000000 \
  > runs/q_r4_getup_cont.log 2>&1
echo "GETUP CONT DONE rc=$?"

timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.train r4-combined-ft \
  --env dp_combined_env $COMMON \
  --handoff-rsi 0.15 --rsi-random-pa \
  --init-params runs/walk_test20260817-0951_50_videos/walk_test20260817-0951_50_best \
  --lr 1.5e-4 --total 80000000 \
  > runs/q_r4_combined_ft.log 2>&1
echo "COMBINED FT DONE rc=$?"

timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.sac_train r4-sac-distill \
  --motion walk --robot humanoid3d \
  --n-envs 512 --buffer 2000000 --batch 2048 \
  --steps-per-iter 16 --updates-per-iter 48 --lr 3e-4 \
  --critic-warmup 3000000 \
  --init-actor-from-ppo runs/walk_test20260817-1649_40_videos/walk_test20260817-1649_40_best \
  --total 40000000 --eval-every 2000000 --out runs \
  > runs/q_r4_sac.log 2>&1
echo "SAC DONE rc=$?"

bash tools/train_queue_r4d.sh
bash tools/tpu_gap_r4.sh
echo "QUEUE R4E DONE"
