#!/bin/bash
# Wait for the axon tunnel to recover, then run the full TPU measurement
# battery in one process chain: DH-15 / DH-13 / DH-10 solve suites and
# the headline SpMV bench.  Each runner writes its own jsonl; all stdout
# goes to the watcher log.  Exits nonzero if ANY runner fails or is
# killed by its timeout — a partially-failed battery must not read as
# fully covered downstream.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for i in $(seq 1 200); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a @ a)(jnp.ones((256,256), jnp.float32))
print('health ok', float(y[0,0]))
"; then
    echo "tunnel healthy after attempt $i ($(date -u))"
    fails=0
    echo "=== lev 15 ==="
    timeout 7200 python -u benchmarks/run_ours_tpu.py --lev 15 \
      --out benchmarks/our_results/tpu_lev15.jsonl \
      || { echo "FAILED: lev 15 (exit $?)"; fails=$((fails+1)); }
    echo "=== lev 13 ==="
    timeout 2000 python -u benchmarks/run_ours_tpu.py --lev 13 \
      --out benchmarks/our_results/tpu_lev13.jsonl \
      || { echo "FAILED: lev 13 (exit $?)"; fails=$((fails+1)); }
    echo "=== lev 10 ==="
    timeout 2000 python -u benchmarks/run_ours_tpu.py --lev 10 \
      --out benchmarks/our_results/tpu_lev10.jsonl \
      || { echo "FAILED: lev 10 (exit $?)"; fails=$((fails+1)); }
    echo "=== bench.py ==="
    timeout 2600 python -u bench.py \
      || { echo "FAILED: bench.py (exit $?)"; fails=$((fails+1)); }
    if [ "$fails" -eq 0 ]; then
      echo "=== ALL DONE ($(date -u)) ==="
      exit 0
    fi
    echo "=== DONE WITH $fails FAILURE(S) ($(date -u)) ==="
    exit 2
  fi
  echo "attempt $i: tunnel wedged, sleeping 60s ($(date -u))"
  sleep 60
done
echo "tunnel never recovered"
exit 1
