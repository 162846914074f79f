#!/bin/bash
# Round-4 run-ladder continuation legs D/E. Calibration against the
# committed round-2 metrics: its v3 leg plateaued at ep_len 29 after
# 232M (exactly where legs A-C sit) and the program broke out with
# v4's CONSTANT shaping floors ('floors alive0.15+vel0.15 const, warm
# v3-best') before the pure-reward v6-v9 chain climbed to eval 113.6.
# Leg D replicates v4 (constant floors, mild log-std reopen); leg E is
# the pure-reward adaptive continuation from D's best.
set -x
cd /root/repo
RUN="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
echo "leg D warm-start: $BEST"
timeout 2600 python -u -m deepmimic_mujoco_tpu.rl.train r4-run-pk-ladderD \
  $RUN \
  --init-params "$BEST" \
  --reset-log-std -1.0 \
  --alive-bonus 0.15 --vel-shaping 0.15 \
  --lr 1.5e-4 --total 120000000 \
  > runs/q_r4_run_pk_ladderD.log 2>&1
echo "PK LADDER D DONE rc=$?"

BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
echo "leg E warm-start: $BEST"
timeout 4000 python -u -m deepmimic_mujoco_tpu.rl.train r4-run-pk-ladderE \
  $RUN \
  --init-params "$BEST" \
  --lr 2e-4 --total 250000000 \
  > runs/q_r4_run_pk_ladderE.log 2>&1
echo "PK LADDER E DONE rc=$?"

# Combined handoff-heavy continuation: the round-4 fine-tune (eval
# 88.3, gate probe 92.6/1692 clean) still dies at the getup->loco
# handoff on the SECOND fall (cycles stuck at 1 both checkpoints,
# /tmp/combined_probe.log evidence in q_r4_combined_ft.log commit).
# Double down on handoff practice from the r4 best at a gentle lr.
timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.train r4-combined-handoff2 \
  --env dp_combined_env --no-wandb --no-render --out runs --adaptive-lr \
  --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --horizon 128 \
  --handoff-rsi 0.4 --rsi-random-pa \
  --init-params runs/combined_r4_best \
  --lr 1e-4 --total 80000000 \
  > runs/q_r4_combined_handoff2.log 2>&1
echo "COMBINED HANDOFF2 DONE rc=$?"
echo "QUEUE R4D DONE"
