#!/bin/bash
# Probe the axon TPU tunnel every few minutes; when it answers, run the
# one-shot measurement battery (tools/tpu_battery.sh) automatically.
# Usage: bash tools/tunnel_watch.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_battery}
MARKER=/tmp/tpu_tunnel_up
rm -f "$MARKER"

while true; do
  if timeout 150 python -u -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('tunnel up:', d)
" >/tmp/tunnel_probe.log 2>&1; then
    date > "$MARKER"
    echo "tunnel up at $(date); starting battery"
    bash tools/tpu_battery.sh "$OUT"
    echo "battery finished at $(date)" >> "$MARKER"
    exit 0
  fi
  sleep 240
done
