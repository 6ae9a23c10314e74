#!/bin/bash
# Round-4 TPU measurement batch — everything serialized under ONE bench flock
# (this host has one CPU core; see CLAUDE.md). Appends stderr to the log and
# JSON lines to $OUT.
#
#   nohup bash tools/run_r4_tpu.sh > /tmp/r4_tpu.log 2>&1 &
#
# Order: training accounting sweep (VERDICT r3 #2) -> trained-flagship
# calibration (#5) -> bench.py with the trained drift profile (validates the
# new JSON fields on-chip and A/Bs trained-vs-untrained placement).
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r4_tpu_results.jsonl}
: > "$OUT"

exec 9>/tmp/stedm_bench.lock
flock 9
export STEDM_BENCH_LOCK_HELD=1

step() { # label, then command...
  local label=$1; shift
  echo "=== $label: $* ($(date -u +%H:%M:%S)) ===" >&2
  { "$@" ; } >> "$OUT" || echo "FAILED ($label): $*" >&2
}

# 1) training accounting: cost analysis + lever sweep (512² default config,
#    then batch and remat and accum levers; batch 32 may OOM -> tolerated)
step train_b8_accum4      timeout 3600 python tools/bench_train.py --batch 8  --iters 20
step train_b8_accum1      timeout 3600 python tools/bench_train.py --batch 8  --iters 20 --accum 1
step train_b16            timeout 3600 python tools/bench_train.py --batch 16 --iters 10
step train_b32            timeout 3600 python tools/bench_train.py --batch 32 --iters 5
step train_b8_remat       timeout 3600 python tools/bench_train.py --batch 8  --iters 20 --remat

# 1b) the same step fed through the REAL Loader (flowers augment path):
#     the delta vs train_b8_accum4 is the input pipeline + tunnel-H2D cost
step train_b8_loader      timeout 3600 python tools/bench_train.py --batch 8  --iters 5 --loader flowers

# 2) trained-flagship calibration (saves /tmp/drift_trained.npy)
step calibrate_flagship   timeout 5400 python tools/calibrate_flagship.py --steps 300

# 3) bench with the TRAINED drift profile (A/B against the round's default
#    bench-time untrained calibration, which the driver runs separately)
if [ -f /tmp/drift_trained.npy ]; then
  STEDM_BENCH_DRIFT_NPY=/tmp/drift_trained.npy \
    step bench_trained_drift timeout 3600 python bench.py
fi

# 4) plain bench: validates the new self-contained JSON fields on-chip
step bench_default        timeout 3600 python bench.py

echo "=== batch done ($(date -u +%H:%M:%S)); results in $OUT ===" >&2
