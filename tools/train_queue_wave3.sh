#!/bin/bash
# Wave 3: combined-env continuation under the new semantics with
# handoff-focused RSI (VERDICT r2 item 3), then SAC-to-gate on
# humanoid3d walk (item 7). Combined warm-starts from the round-2
# eval-81.8 checkpoint; its policy needs re-adaptation to the new
# solver semantics just like the single-motion ones.
set -x
cd /root/repo
NS="--warm-start-lam --mesh-subcapsules 2"

timeout 7200 python -m deepmimic_mujoco_tpu.rl.train ns-combined-handoff \
  --env dp_combined_env --no-wandb --out runs --adaptive-lr \
  --target-kl 0.02 --log-std-min -1.5 --eval-every 8000000 $NS \
  --handoff-rsi 0.25 --rsi-random-pa \
  --init-params "$1" \
  --lr 1.5e-4 --total 250000000 \
  > runs/q_ns_combined.log 2>&1

timeout 4800 python -m deepmimic_mujoco_tpu.rl.sac_train ns-sac-walk \
  --motion walk --robot humanoid3d \
  $NS --n-envs 512 --buffer 2000000 --batch 2048 \
  --steps-per-iter 16 --updates-per-iter 48 --lr 3e-4 \
  --total 60000000 --eval-every 2000000 --out runs \
  > runs/q_ns_sac_walk.log 2>&1

echo "QUEUE WAVE 3 DONE"
