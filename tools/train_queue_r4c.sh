#!/bin/bash
# Round-4 main training queue, under the PAIR-KEYED warm-start engine
# (physics/step.py): slot-keyed warm start applied carried forces to
# the wrong contact whenever top-K depth order churned (every run-gait
# flight phase) — four independent run-training attempts under it
# plateaued at ep_len ~30-50 (runs/q_ns_g1_run_ladder*.log,
# q_r3_run_*.log, q_r4_run_ladderA.log) while all six committed gates
# replay green under the pair-keyed fix (suite 2026-08-19).
#
# Optimizer settings on every leg = the round-2 winning run's
# (test20260817-0507_52 metrics: epochs 10, kl 0.012-0.015, lr 2e-4).
#
#   1. G1 run ladder leg A: warm from new-semantics G1 walk,
#      log-std reset, annealed alive+velmatch shaping.
#   2. G1 run leg B: pure-reward continuation from leg A best
#      (the round-2 "v9" pattern that climbed ep_len 50 -> 594).
#   3. getup continuation from the 58.5 round-3 checkpoint.
#   4. combined fine-tune from the gated policy with gentle
#      handoff-RSI (cycle probe: dies on the getup->RUN handoff).
set -x
cd /root/repo
RUN="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

timeout 2600 python -u -m deepmimic_mujoco_tpu.rl.train r4-run-pk-ladderA \
  $RUN \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.3 --alive-bonus-decay 120000000 --vel-shaping 0.4 \
  --lr 2e-4 --total 160000000 \
  > runs/q_r4_run_pk_ladderA.log 2>&1
echo "PK LADDER A DONE rc=$?"

BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
echo "leg B warm-start: $BEST"
timeout 4000 python -u -m deepmimic_mujoco_tpu.rl.train r4-run-pk-ladderB \
  $RUN \
  --init-params "$BEST" \
  --lr 2e-4 --total 250000000 \
  > runs/q_r4_run_pk_ladderB.log 2>&1
echo "PK LADDER B DONE rc=$?"

bash tools/train_queue_r4b.sh
echo "QUEUE R4C DONE"
