#!/bin/bash
# Wait for the axon tunnel to recover (it wedges periodically — even a
# trivial jit hangs), then run the canonical DH-15 benchmark.
# Usage: wait_and_run.sh [runner args...]
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for i in $(seq 1 150); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a @ a)(jnp.ones((256,256), jnp.float32))
print('health ok', float(y[0,0]))
"; then
    echo "tunnel healthy after attempt $i"
    exec timeout 3000 python -u benchmarks/run_ours_tpu.py "$@"
  fi
  echo "attempt $i: tunnel wedged, sleeping 60s"
  sleep 60
done
echo "tunnel never recovered"
exit 1
