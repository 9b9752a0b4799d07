#!/bin/bash
# Wait for the axon TPU tunnel to come back, then exec the given command.
# Each probe runs in a subprocess with its own timeout so a hung backend
# init can never wedge the waiter.  Usage:
#   bash extras/tpu_when_up.sh python -u extras/probe_pair_variants.py
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.ones(()).sum()))" >/dev/null 2>&1; then
    break
  fi
  sleep 90
done
echo "[tpu_when_up] tunnel is up at $(date -u +%H:%M:%S)Z" >&2
exec "$@"
