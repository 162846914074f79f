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

# Between legs: refresh the G1 per-stage TPU profile under the
# pair-keyed engine (VERDICT r3 #4 asks for a committed profile).
timeout 900 python -u -m deepmimic_mujoco_tpu.tools.profiling \
  --mode stages --robot unitree_g1 --motion run --batch 4096 \
  > runs/q_r4_g1_stages.log 2>&1
echo "G1 PROFILE DONE rc=$?"
timeout 900 python -u -m deepmimic_mujoco_tpu.tools.profiling \
  --mode solve --robot unitree_g1 --motion run --batch 4096 \
  >> runs/q_r4_g1_stages.log 2>&1
echo "G1 SOLVE PROFILE DONE rc=$?"

# Run ladder leg C (the round-2 "v9" leg): the committed round-2
# metrics show the winning program took ~920M steps across 7 legs and
# sat at ep_len ~30 / eval ~2 after its first 230M (v3) — exactly where
# legs A+B land — before the v8/v9 adaptive-lr continuations climbed
# len 38 -> 153 -> 556 and eval 3.4 -> 21.6 -> 113.6. Keep continuing.
BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
echo "leg C warm-start: $BEST"
timeout 4000 python -u -m deepmimic_mujoco_tpu.rl.train r4-run-pk-ladderC \
  --env deep_mimic_mujoco $COMMON \
  --motion run --robot unitree_g1 \
  --init-params "$BEST" \
  --lr 2e-4 --total 250000000 \
  > runs/q_r4_run_pk_ladderC.log 2>&1
echo "PK LADDER C DONE rc=$?"

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

# SAC to its gate (VERDICT r3 #5): distill the actor from the gated
# PPO walk policy, freeze it while the critic fits (3M steps), then
# fine-tune with the stabilized temperature (alpha >= 0.01, slow lr).
timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.sac_train r4-sac-distill \
  --motion walk --robot humanoid3d \
  --n-envs 512 --buffer 2000000 --batch 2048 \
  --steps-per-iter 16 --updates-per-iter 48 --lr 3e-4 \
  --critic-warmup 3000000 \
  --init-actor-from-ppo runs/walk_test20260817-1649_40_videos/walk_test20260817-1649_40_best \
  --total 40000000 --eval-every 2000000 --out runs \
  > runs/q_r4_sac.log 2>&1
echo "SAC DONE rc=$?"
LATEST_SAC=$(ls -dt runs/sac*_best_actor 2>/dev/null | head -1)
echo "best SAC actor: $LATEST_SAC"
echo "QUEUE R4B DONE"
