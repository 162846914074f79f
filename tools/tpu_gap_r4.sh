#!/bin/bash
# Post-queue TPU measurements (one process at a time on the one chip):
#   1. compiled-kernel smoke tests (tests/test_tpu_smoke.py on TPU)
#   2. fused-kernel microbench at G1 dims (einsum vs kernel split)
#   3. G1 env-step batch scaling (is the step launch-overhead-bound?)
set -x
cd /root/repo

timeout 1200 env DM_TPU_TESTS=1 python -u -m pytest tests/test_tpu_smoke.py -v \
  > runs/q_r4_tpu_smoke.log 2>&1
echo "TPU SMOKE rc=$?"

timeout 900 python -u tools/bench_kernel.py 4096 \
  > runs/q_r4_kernel_bench.log 2>&1
echo "KERNEL BENCH rc=$?"

timeout 1500 python -u - <<'EOF' > runs/q_r4_g1_sweep.log 2>&1
from deepmimic_mujoco_tpu.envs import DPEnv
from deepmimic_mujoco_tpu.tools.profiling import throughput_sweep
env = DPEnv(motion="run", robot="unitree_g1")
throughput_sweep(env, batches=(2048, 4096, 8192, 16384), steps=64)
EOF
echo "G1 SWEEP rc=$?"
echo "TPU GAP DONE"
