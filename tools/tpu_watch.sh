#!/bin/bash
# Wait for the tunneled TPU to come back, then run the pallas tile
# battery in crash-averse order (BM=256 before 512: the 512 epilogue
# compile is the suspected helper-crasher that wedged the terminal).
LOG=/tmp/tpu_watch.log
echo "watch start $(date)" > $LOG
for i in $(seq 1 120); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
print('alive', float(jnp.ones((8,8)).sum()))" >> $LOG 2>&1; then
    echo "TPU BACK after attempt $i $(date)" >> $LOG
    break
  fi
  echo "attempt $i dead $(date)" >> $LOG
  sleep 90
done
if ! grep -q "TPU BACK" $LOG; then
  echo "GAVE UP $(date)" >> $LOG
  exit 1
fi
cd /root/repo/tools
echo "=== equality probe BM<=256 ===" >> $LOG
TWK_PALLAS_MAX_BM=256 timeout 2400 python probe_tile_equality.py >> $LOG 2>&1
echo "probe256 exit=$?" >> $LOG
echo "=== A/B bench BM<=256 ===" >> $LOG
TWK_PALLAS_MAX_BM=256 timeout 2400 python bench_tile_backend.py >> $LOG 2>&1
echo "bench256 exit=$?" >> $LOG
echo "watch done $(date)" >> $LOG
