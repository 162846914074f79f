"""Microbenchmark the fused solve kernel at G1 dims: total parts-entry
time vs kernel-only time with pre-laid env-in-lanes operands — splits
the J^T-build einsums + layout transposes from the Pallas kernel
itself (perf attribution for VERDICT r4 item 4).

Usage (real TPU, one process): python tools/bench_kernel.py [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepmimic_mujoco_tpu.ops import fused_solve as fs

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
nv, K, L, its = 43, 24, 37, 50
n = 3 * K + L
r = np.random.RandomState(0)


def mk(shape):
    return jnp.asarray(r.randn(*shape).astype(np.float32))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 10
    print(f"{name:>28}: {dt * 1e3:8.2f} ms ({B / dt:12,.0f} envs/s)",
          flush=True)
    return dt


G = mk((B, nv, nv))
M = jnp.einsum("bij,bkj->bik", G, G) + nv * jnp.eye(nv)[None]
cd_lin, cd_ang = mk((B, nv, 3)), mk((B, nv, 3))
frame, rpos = mk((B, K, 3, 3)), mk((B, K, 3))
w = (r.rand(B, K, nv) < 0.5).astype(np.float32)
w = jnp.asarray(w)
sign_l = jnp.asarray(np.where(r.rand(B, L) < 0.5, 1.0, -1.0), jnp.float32)
qf, aref = mk((B, nv)), mk((B, n))
imp = jnp.clip(mk((B, n)) * 0.2 + 0.5, 0.05, 0.95)
active = jnp.asarray((r.rand(B, n) < 0.4).astype(np.float32))
mu = jnp.ones((B, K), jnp.float32)
lam0 = jnp.zeros((B, n), jnp.float32)
ld_idx = tuple(int(i) for i in np.sort(r.choice(nv, L, replace=False)))

# 1. full parts entry (einsums + layout + kernel)
full = jax.jit(lambda *a: jax.vmap(
    lambda *x: fs.fused_solve_parts_single(
        *x, K=K, L=L, ld_idx=ld_idx, iterations=its))(*a))
t_full = timeit("parts entry (einsum+kernel)", full, M, cd_lin, cd_ang,
                frame, rpos, w, sign_l, qf, aref, imp, active, mu, lam0)

# 2. kernel-only with pre-laid operands
nv_p = fs._round_up(nv, 8)
n_p = fs._round_up(n, 8)
B_pad = fs._round_up(B, fs.ENV_BLOCK)
M_lanes = jax.jit(lambda M: fs._m_to_lanes(M, nv, nv_p, B_pad))(M)
JT = mk((nv_p, n_p, B_pad))
kern = jax.jit(lambda *a: fs._solve_lanes(
    *a, nv=nv, n=n, K=K, L=L, iterations=its))
t_kern = timeit("kernel only (pre-laid)", kern, M_lanes, JT, qf, aref,
                imp, active, mu, lam0)

# 3. the J^T einsum build + layout alone
def jt_build(cd_lin, cd_ang, frame, rpos, w):
    G2 = jnp.cross(rpos[:, :, None, :], frame)
    JT_c = (jnp.einsum("bcrd,bnd,bcn->nrcb", frame, cd_lin, w)
            + jnp.einsum("bcri,bni,bcn->nrcb", G2, cd_ang, w))
    return JT_c.reshape(nv, 3 * K, B)

t_jt = timeit("J^T einsum build", jax.jit(jt_build), cd_lin, cd_ang,
              frame, rpos, w)

# 4. M layout transform alone
t_m = timeit("M -> lanes layout", jax.jit(
    lambda M: fs._m_to_lanes(M, nv, nv_p, B_pad)), M)

print(f"summary: full {t_full*1e3:.2f} = kernel {t_kern*1e3:.2f} "
      f"+ jt {t_jt*1e3:.2f} + mlanes {t_m*1e3:.2f} + rest "
      f"{(t_full-t_kern-t_jt-t_m)*1e3:.2f} ms")
