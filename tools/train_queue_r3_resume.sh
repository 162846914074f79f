#!/bin/bash
# Round-3 resume queue (post TPU-tunnel outage). Serialized on the one
# chip, ordered by judge impact:
#   1. G1 run ladder resume from the 31M-step snapshot (new-semantics
#      rebuild of the run gate; curve matched round-2's winner at 31M).
#      Shaping schedule continued where it left off: alive bonus
#      0.3*(1-31/120)=0.22 decayed over the remaining ~90M.
#   2. Pure-reward polish from the ladder best (round-2 recipe step 2).
#   3. G1 getup_facedown_slow_FSI from scratch (warm-from-walk was
#      WORSE than zero-action; reference's pretty-totem was also a
#      from-scratch run) -> new gate (VERDICT r2 item 4).
#   4. Combined-env handoff fine-tune with handoff-focused RSI
#      (VERDICT r2 item 3), warm from the gated 0951_50 policy.
#   5. SAC walk to a gate (VERDICT r2 item 7).
# Engine defaults are already the new semantics (warm lambda +
# subcapsules); no flags needed.
set -x
cd /root/repo
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --eval-every 4000000"

timeout 3600 python -m deepmimic_mujoco_tpu.rl.train ns-g1-run-ladder-resume \
  $COMMON --motion run --robot unitree_g1 --horizon 128 \
  --init-params runs/run_test20260817-1940_01_videos/run_test20260817-1940_01_latest \
  --alive-bonus 0.22 --alive-bonus-decay 90000000 --vel-shaping 0.4 \
  --lr 2.5e-4 --total 130000000 \
  > runs/q_r3_run_ladder_resume.log 2>&1
echo "LADDER RESUME DONE rc=$?"

LADDER_BEST=$(ls -dt runs/run_test20260819-*_videos/run_test20260819-*_best 2>/dev/null | head -1)
echo "polish warm-start: $LADDER_BEST"
timeout 2400 python -m deepmimic_mujoco_tpu.rl.train ns-g1-run-polish \
  $COMMON --motion run --robot unitree_g1 --horizon 128 \
  --init-params "$LADDER_BEST" \
  --lr 1e-4 --total 50000000 \
  > runs/q_r3_run_polish.log 2>&1
echo "RUN POLISH DONE rc=$?"

timeout 4800 python -m deepmimic_mujoco_tpu.rl.train ns-g1-getup-scratch \
  $COMMON --motion getup_facedown_slow_FSI --robot unitree_g1 \
  --lr 3e-4 --total 200000000 \
  > runs/q_r3_getup_scratch.log 2>&1
echo "GETUP SCRATCH DONE rc=$?"

timeout 7200 python -m deepmimic_mujoco_tpu.rl.train ns-combined-handoff \
  --env dp_combined_env --no-wandb --out runs --adaptive-lr \
  --target-kl 0.02 --log-std-min -1.5 --eval-every 8000000 \
  --handoff-rsi 0.25 --rsi-random-pa \
  --init-params runs/walk_test20260817-0951_50_videos/walk_test20260817-0951_50_best \
  --lr 1.5e-4 --total 250000000 \
  > runs/q_r3_combined_handoff.log 2>&1
echo "COMBINED HANDOFF DONE rc=$?"

timeout 5400 python -m deepmimic_mujoco_tpu.rl.sac_train ns-sac-walk \
  --motion walk --robot humanoid3d \
  --n-envs 512 --buffer 2000000 --batch 2048 \
  --steps-per-iter 16 --updates-per-iter 48 --lr 3e-4 \
  --total 60000000 --eval-every 2000000 --out runs \
  > runs/q_r3_sac_walk.log 2>&1
echo "SAC WALK DONE rc=$?"

echo "QUEUE R3 RESUME DONE"
