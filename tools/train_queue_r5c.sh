#!/bin/bash
# Round-5 run-ladder, second wave. Context: leg F1 (warm_start_lam=False,
# subcapsules=2, exact round-2 v3 recipe) stalled at ep_len ~35 @160M —
# so the pair-keyed warm start is NOT what blocks run training. The one
# remaining semantics axis vs the round-2 breakout environment is
# mesh_subcapsules (2 today vs 1 then; STATUS round-2 already warned the
# 2-subcapsule proxies "change G1 contact dynamics").
#
# Leg F2: the COMPLETE falsification — exact round-2 engine config
#   (no warm start, single-capsule mesh proxies) with the same v3
#   ladder recipe and init. If F2 climbs where F1/H stall, the
#   subcapsule change is the blocker and the default gets revisited
#   with parity numbers rather than trained against.
# Leg S1: orthogonal recipe axis under DEFAULT semantics — clip-speed
#   curriculum (VERDICT r4 #1b): the run clip resampled to 0.85x speed
#   is kinematically closer to the walk policy's gait basin.
set -x
cd /root/repo
# wait for any bench/probe holding the TPU tunnel
while kill -0 "$(cat /tmp/bench_lanes.pid 2>/dev/null)" 2>/dev/null; do sleep 10; done

RUN="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

timeout 3000 python -u -m deepmimic_mujoco_tpu.rl.train r5-run-cold-F2 \
  $RUN \
  --no-warm-start-lam --mesh-subcapsules 1 \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.3 --alive-bonus-decay 120000000 --vel-shaping 0.4 \
  --lr 2.5e-4 --total 160000000 \
  > runs/q_r5_run_cold_F2.log 2>&1
echo "COLD F2 DONE rc=$?"

timeout 2400 python -u -m deepmimic_mujoco_tpu.rl.train r5-run-speed-S1 \
  $RUN \
  --speed 0.85 \
  --init-params runs/walk_test20260817-1741_21_videos/walk_test20260817-1741_21_best \
  --reset-log-std -0.7 \
  --alive-bonus 0.2 --alive-bonus-decay 100000000 --vel-shaping 0.3 \
  --lr 2e-4 --total 120000000 \
  > runs/q_r5_run_speed_S1.log 2>&1
echo "SPEED S1 DONE rc=$?"
echo "QUEUE R5C DONE"
