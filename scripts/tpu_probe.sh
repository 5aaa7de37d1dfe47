#!/bin/bash
# Blocks until a fresh TPU compile succeeds through the axon tunnel; exits 0
# on recovery.  Each attempt uses a random matmul shape so the persistent
# compilation cache cannot satisfy it (a cache hit would not prove the
# remote compiler/executor is alive).  Used by the unattended chip-work
# queue (scripts/r2_chaser.sh) to ride out tunnel wedges, which historically
# recover on their own in ~30 min.
n=0
while true; do
  n=$((n+1))
  if timeout 90 python -c "
import jax, jax.numpy as jnp, random
d = random.randint(3, 60)
x = jnp.full((d, d+1), 1.0) @ jnp.full((d+1, d+2), 2.0)
print('fresh compile ok', float(x[0,0]))
" > /tmp/tpu_probe_last.log 2>&1; then
    echo "RECOVERED after $n attempts: $(date)" >> /tmp/tpu_probe.log
    exit 0
  fi
  echo "attempt $n failed: $(date)" >> /tmp/tpu_probe.log
  sleep 240
done
