#!/bin/bash
# Round-4 wave B: getup continuation + combined-env fine-tune.
# Chained after tools/train_queue_r4.sh (one chip, one process).
#
# Getup (VERDICT r3 'Next' #2): diagnosis in tools/diag_getup.py —
# the round-3 checkpoint already replays 58.5 from frame 0 (the "9.7
# plateau" was an RSI-start eval artifact, fixed in rl/eval.py); this
# leg continues it with the round-2-winner optimizer settings
# (epochs 10, target-kl 0.012) toward the reference's ~70.
#
# Combined (VERDICT r3 'Next' #3): the round-3 handoff fine-tune
# collapsed (best eval 16.0 vs the gated 68.8 — head-to-head done,
# round-2 checkpoint wins); this leg is a plain fine-tune of the gated
# policy under the new engine defaults with the winning optimizer
# settings, targeting eval >= 70-80 (round-2's best: 81.8).
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

# Cycle probe of the gated ckpt (tools/play_combined --inject-fall-every):
# completes 1 recovery cycle then dies on the getup->RUN handoff. The
# round-3 collapse coupled handoff-RSI 0.25 + random-PA with the
# epochs-20/KL-0.03 optimizer; retry the handoff practice at a gentler
# dose under the winning optimizer.
timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.train r4-combined-ft \
  --env dp_combined_env $COMMON \
  --handoff-rsi 0.15 --rsi-random-pa \
  --init-params runs/walk_test20260817-0951_50_videos/walk_test20260817-0951_50_best \
  --lr 1.5e-4 --total 80000000 \
  > runs/q_r4_combined_ft.log 2>&1
echo "COMBINED FT DONE rc=$?"
echo "QUEUE R4B DONE"
