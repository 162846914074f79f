#!/bin/bash
# Round-4 run-ladder continuation legs D/E (the round-2 program took
# ~920M steps across 7 legs; calibration against its committed v8
# metrics puts legs A-C one leg behind — keep continuing with the same
# winning optimizer until the eval gate clears 90).
set -x
cd /root/repo
RUN="--env deep_mimic_mujoco --no-wandb --no-render --out runs \
  --adaptive-lr --target-kl 0.012 --epochs 10 --log-std-min -1.5 \
  --eval-every 4000000 --motion run --robot unitree_g1 --horizon 128"

for LEG in D E; do
  BEST=$(ls -dt runs/run_test*_videos/run_test*_best 2>/dev/null | head -1)
  echo "leg $LEG warm-start: $BEST"
  timeout 4000 python -u -m deepmimic_mujoco_tpu.rl.train "r4-run-pk-ladder$LEG" \
    $RUN \
    --init-params "$BEST" \
    --lr 2e-4 --total 250000000 \
    > "runs/q_r4_run_pk_ladder$LEG.log" 2>&1
  echo "PK LADDER $LEG DONE rc=$?"
done
echo "QUEUE R4D DONE"
