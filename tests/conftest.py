"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarks are run
separately by ``bench.py``. A persistent XLA compilation cache keeps
repeat runs fast.

Environment note: this image boots every interpreter with a
sitecustomize that registers the axon TPU PJRT plugin and may have
already imported jax, so plain ``os.environ`` edits here can be too
late — we also push the platform choice through ``jax.config``.
Running pytest as ``PALLAS_AXON_POOL_IPS= python -m pytest ...``
additionally skips the TPU-tunnel registration entirely (fastest).
"""
import os
import sys

# DM_TPU_TESTS=1 leaves the real backend in place (used to run
# tests/test_tpu_smoke.py on actual TPU hardware; the default CPU
# pin would otherwise skip those tests even on a TPU host).
if os.environ.get("DM_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dm_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if "jax" in sys.modules:
    import jax

    if os.environ.get("DM_TPU_TESTS") != "1":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dm_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
