#!/bin/bash
# Round-5 final wave, ordered by information-per-TPU-minute:
#
# 1. Cycle probe of the hbuf leg's best checkpoint (r5b trained the
#    on-policy handoff buffer to 86M before the session cut it):
#    does it complete >=2 forced-fall recovery cycles? (VERDICT r4 #3)
# 2. Leg F2: the COMPLETE round-2-engine falsification for the run
#    gate (no warm start AND single-capsule mesh proxies) — if it
#    climbs where F1/H stalled, mesh_subcapsules=2 is the blocker
#    (VERDICT r4 #1c). Budget-trimmed vs r5c to fit the round.
# 3. Combined hbuf continuation from the r5b latest state, exploration
#    kept open, to push the 2-cycle handoff mastery.
set -x
cd /root/repo

HB=runs/walk_test20260820-0546_56_videos/walk_test20260820-0546_56_best
timeout 1200 python -u -m deepmimic_mujoco_tpu.tools.play_combined \
  --checkpoint "$HB" --steps 2000 --inject-fall-every 300 \
  > runs/q_r5_cycles_hbuf.log 2>&1
echo "CYCLE PROBE DONE rc=$?"
timeout 900 python -u -m deepmimic_mujoco_tpu.tools.play_combined \
  --checkpoint "$HB" --steps 2000 \
  > runs/q_r5_clean_hbuf.log 2>&1
echo "CLEAN PROBE DONE rc=$?"

# PPO update-phase profile at the reference's 20-epoch config
# (VERDICT r4 #4) + post-lanes stage profile for G1 (evidence for the
# position-stage rewrite).
timeout 1200 python -u -m deepmimic_mujoco_tpu.tools.profiling \
  --mode train --batch 2048 --horizon 64 --epochs 20 \
  > runs/q_r5_train_profile.log 2>&1
echo "TRAIN PROFILE DONE rc=$?"
timeout 900 python -u -m deepmimic_mujoco_tpu.tools.profiling \
  --mode stages --robot unitree_g1 --motion run --batch 2048 \
  > runs/q_r5_g1_stages_lanes.log 2>&1
echo "G1 STAGES DONE rc=$?"

RUN="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

timeout 2100 python -u -m deepmimic_mujoco_tpu.rl.train r5-run-cold-F2 \
  $RUN \
  --no-warm-start-lam --mesh-subcapsules 1 \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.3 --alive-bonus-decay 120000000 --vel-shaping 0.4 \
  --lr 2.5e-4 --total 200000000 \
  > runs/q_r5_run_cold_F2.log 2>&1
echo "COLD F2 DONE rc=$?"

timeout 1500 python -u -m deepmimic_mujoco_tpu.rl.train r5-combined-hbuf2 \
  --env dp_combined_env --no-wandb --no-render --out runs --adaptive-lr \
  --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --horizon 128 \
  --handoff-buffer 0.25 --handoff-rsi 0.1 --rsi-random-pa \
  --init-params runs/walk_test20260820-0546_56_videos/walk_test20260820-0546_56_latest \
  --lr 8e-5 --total 120000000 \
  > runs/q_r5_combined_hbuf2.log 2>&1
echo "COMBINED HBUF2 DONE rc=$?"
echo "QUEUE R5D DONE"
