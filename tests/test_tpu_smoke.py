"""On-TPU smoke test for the COMPILED fused solve kernel.

The CPU suite pins the fused kernel's semantics in interpret mode
(tests/test_fused_solve.py); this file closes the remaining gap — that
the Mosaic-compiled kernel on real TPU hardware agrees with the
interpreted reference — so on-TPU parity is certified by CI rather
than only by trained-checkpoint gate replays.

Skipped automatically when no TPU backend is present (the normal CPU
CI run). On a TPU host run it directly:

    python -m pytest tests/test_tpu_smoke.py -v
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_fused_solve import _mk
from deepmimic_mujoco_tpu.ops.fused_solve import fused_solve_single

_ON_TPU = jax.default_backend() in ("tpu", "axon")

pytestmark = pytest.mark.skipif(
    not _ON_TPU, reason="needs TPU hardware (compiled Mosaic kernel)")


@pytest.mark.parametrize("nv,K,L,its", [
    (34, 16, 28, 50),   # humanoid3d dims (pipelined VMEM path)
    (43, 24, 37, 50),   # G1 dims (manual-DMA single-buffered path)
])
def test_compiled_kernel_matches_interpret(nv, K, L, its):
    B = 256  # two ENV_BLOCK grid programs
    args = [jnp.asarray(np.stack(a))
            for a in zip(*[_mk(s, nv, K, L) for s in range(B)])]

    def solve(interpret):
        return jax.vmap(lambda *a: fused_solve_single(
            *a, K=K, L=L, iterations=its, interpret=interpret))(*args)

    got = jax.tree.map(np.asarray, solve(False))        # compiled, TPU
    with jax.default_device(jax.devices("cpu")[0]):
        ref = jax.tree.map(np.asarray, solve(True))     # interpreted

    for name, a, b in zip(("qacc", "qfrc", "lam"), ref, got):
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 5e-4, name


def test_env_step_on_tpu_finite():
    """One compiled humanoid3d env-step batch straight off mocap
    frames: finite state, positive reward (end-to-end kernel path)."""
    from deepmimic_mujoco_tpu.envs import DPEnv

    env = DPEnv(motion="walk", robot="humanoid3d")
    keys = jax.random.split(jax.random.PRNGKey(0), 128)
    states, obs = jax.jit(jax.vmap(env.reset))(keys)
    acts = jnp.zeros((128, env.action_size), jnp.float32)
    _, out = jax.jit(jax.vmap(env.step_auto_reset))(states, acts)
    rew = np.asarray(out.reward)
    assert np.isfinite(rew).all()
    assert rew.mean() > 0.1
