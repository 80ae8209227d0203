#!/bin/bash
# One-shot TPU measurement battery (run when the chip is reachable).
# Everything SEQUENTIAL — the 1-core host contaminates concurrent timings.
# Usage: bash tools/tpu_battery.sh [outdir]   (default /tmp/tpu_battery)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  echo "--- exit=$? tail:"; tail -3 "$OUT/$name.log"
}

# 0. roofline (force fresh measurement incl. mont rate)
run roofline 900 python -u -c "
import os
os.environ.pop('JAX_PLATFORMS', None)
from sumcheck_tpu.utils.sol import measure_roofline
print(measure_roofline(force=True))
"

# 1. MXU fold A/B at nv=20 (before the big sweep, while cache is small)
run mxu_ab 1800 python -u tools/mxu_ab.py

# 2. driver-equivalent capture: ml nv20 + gkr nv18 + batch nv16
run bench_all 2400 python -u bench.py

# 3. full sweep nv=10..21 (writes BENCH_SWEEP.json)
BENCH_PROTO=sweep run sweep 7200 python -u bench.py

# 4. GKR per-stage profile at nv=18 and nv=20
run gkr_profile_18 1200 python -u tools/gkr_profile.py 18
run gkr_profile_20 1200 python -u tools/gkr_profile.py 20

# 4b. batched GKR throughput
BENCH_PROTO=gkr_batch BENCH_NV=14 run gkr_batch 1200 python -u bench.py

# 5. cold-compile wall (moves cache aside, restores after)
run cold_compile 1800 python -u tools/cold_compile_check.py 20

# 6. nv=24 headline (big upload; budget 30 min cold)
BENCH_PROTO=ml BENCH_NV=24 BENCH_REPS=2 run ml_nv24 2400 python -u bench.py

echo "battery done: $OUT"
