#!/bin/bash
# Round-5 combined-env leg: gentle fine-tune from the round-4 gated
# best (clean 92.6/1692, dies on the SECOND fall's getup->loco
# handoff) with the new ON-POLICY handoff buffer armed — resets draw
# from states the policy actually reaches at GETUP->locomotion
# transitions (VERDICT r4 #3), plus a small mocap handoff-RSI share
# and randomized commanded locomotion. Winning optimizer settings
# (epochs 10 / target-kl 0.012 / adaptive lr); exploration re-opened.
set -x
cd /root/repo
timeout 3000 python -u -m deepmimic_mujoco_tpu.rl.train r5-combined-hbuf \
  --env dp_combined_env --no-wandb --no-render --out runs --adaptive-lr \
  --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --horizon 128 \
  --handoff-buffer 0.25 --handoff-rsi 0.1 --rsi-random-pa \
  --init-params runs/combined_r4_best \
  --reset-log-std -1.2 \
  --lr 1e-4 --total 120000000 \
  > runs/q_r5_combined_hbuf.log 2>&1
echo "COMBINED HBUF DONE rc=$?"
echo "QUEUE R5B DONE"
