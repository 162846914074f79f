#!/bin/bash
# Round-4 G1 run ladder rebuild (VERDICT r3 'Next' #1).
#
# Diagnosis (tools/diag_run_semantics.py): warm_start_lam ALONE drops
# the round-2 gated checkpoint from 114.8 to 20.2 (sc=2 partially
# offsets, NEW=45.0) — the new default is a real dynamics shift, so the
# gate needs a full retrain, not fine-tuning. The round-3 ladder rebuild
# plateaued flat at ep_len ~29 @130M; its one material difference from
# round-2's winning run (test20260817-0507_52, metrics committed) was
# optimizer churn: epochs 20 and achieved KL ~0.030 vs the winner's
# epochs 10 / KL 0.012-0.015. This queue replays the round-2 winning
# hyperparams exactly, under the new engine defaults.
#   Leg A: warm from the new-semantics G1 walk best, log-std reset,
#          annealed alive+velmatch shaping, epochs 10, target-kl 0.012.
#   Leg B: pure-reward continuation from leg A's best (the v9 pattern).
set -x
cd /root/repo
COMMON="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

timeout 4000 python -u -m deepmimic_mujoco_tpu.rl.train r4-g1-run-ladderA \
  $COMMON \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.3 --alive-bonus-decay 120000000 --vel-shaping 0.4 \
  --lr 2e-4 --total 160000000 \
  > runs/q_r4_run_ladderA.log 2>&1
echo "LADDER A DONE rc=$?"

BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
echo "leg B warm-start: $BEST"
timeout 6000 python -u -m deepmimic_mujoco_tpu.rl.train r4-g1-run-ladderB \
  $COMMON \
  --init-params "$BEST" \
  --lr 2e-4 --total 250000000 \
  > runs/q_r4_run_ladderB.log 2>&1
echo "LADDER B DONE rc=$?"
echo "QUEUE R4 RUN DONE"
