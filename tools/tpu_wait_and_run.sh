#!/bin/bash
# Poll the TPU; when a value fetch succeeds, run the given command.
cd /root/repo || exit 1
while true; do
  if timeout -k 5 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones(4).sum()))" >/dev/null 2>&1; then
    echo "$(date) TPU alive, launching: $*" >> logs/tpu_watchdog.log
    break
  fi
  echo "$(date) TPU still down" >> logs/tpu_watchdog.log
  sleep 180
done
exec "$@"
