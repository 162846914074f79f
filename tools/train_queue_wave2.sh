#!/bin/bash
# Round-3 wave 2 (run after the wave-1 fine-tunes and before/after the
# defaults flip — every job passes the new-semantics flags explicitly):
#   1. G1 getup_facedown_slow_FSI — the reference's third demonstrated
#      behavior (src/play_g1_facedown_slow_pretty_totem.py), warm from
#      the new-semantics G1 walk policy.
#   2. RK4-integrator humanoid3d walk — one gated policy trained under
#      the reference MJCF integrator (VERDICT r2 weak #5).
#   3. PD-delta warm-start experiment (VERDICT r2 item 9): fine-tune
#      the gated G1 run policy under policy='pd'; verdict to STATUS.
# Checkpoint paths are filled in by the launcher.
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"
COMMON="--env deep_mimic_mujoco --no-wandb --out runs --adaptive-lr --target-kl 0.02 --log-std-min -1.5 --lr-final-frac 0.25 --eval-every 4000000"

G1_WALK_NS="$1"   # new-semantics G1 walk best checkpoint
H3D_WALK_NS="$2"  # new-semantics h3d walk best checkpoint
G1_RUN_NS="$3"    # new-semantics G1 run best checkpoint

timeout 5400 python -m deepmimic_mujoco_tpu.rl.train ns-g1-getup \
  $COMMON $NS --motion getup_facedown_slow_FSI --robot unitree_g1 \
  --init-params "$G1_WALK_NS" --reset-log-std -1.0 \
  --lr 2e-4 --total 150000000 \
  > runs/q_ns_g1_getup.log 2>&1

timeout 3600 python -m deepmimic_mujoco_tpu.rl.train rk4-h3d-walk \
  $COMMON $NS --rk4 --motion walk --robot humanoid3d \
  --init-params "$H3D_WALK_NS" \
  --lr 1e-4 --total 30000000 \
  > runs/q_rk4_h3d_walk.log 2>&1

timeout 2400 python -m deepmimic_mujoco_tpu.rl.train pd-warm-g1-run \
  $COMMON $NS --policy pd --motion run --robot unitree_g1 \
  --init-params "$G1_RUN_NS" \
  --lr 1e-4 --total 20000000 \
  > runs/q_pd_g1_run.log 2>&1

echo "QUEUE WAVE 2 DONE"
