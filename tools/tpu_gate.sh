#!/bin/bash
# Block until a TPU value fetch succeeds (probe every 3 min, 2 min probe
# timeout). Used by campaign scripts to avoid burning retry attempts on an
# extended backend-unavailable window (21:0x-22:1x UTC cost campaign P both
# wb150 legs: the process hung 26 min in init then died UNAVAILABLE).
cd /root/repo || exit 1
while true; do
  if timeout -k 5 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    echo "$(date) TPU alive (gate passed)" >> logs/tpu_watchdog.log
    exit 0
  fi
  echo "$(date) TPU still down (gate)" >> logs/tpu_watchdog.log
  sleep 180
done
