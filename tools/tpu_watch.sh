#!/bin/bash
# Probe the axon TPU tunnel every 120s; append status to /tmp/tpu_watch.log.
# Exits as soon as a probe succeeds (so a caller can chain the queue).
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert str(jax.devices()[0]).startswith('TPU')
print(float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()))
" >/dev/null 2>&1; then
    echo "$(date -u +%H:%M:%S) TPU OK" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU down" >> /tmp/tpu_watch.log
  sleep 60
done
