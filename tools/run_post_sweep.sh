#!/bin/sh
# Serialized post-dispatch-sweep measurement batch (one flock, one CPU core):
#
#   1. carry-sparse serving sweep — auto:4 / auto:3 composed under
#      STEDM_BLOCK_CARRY=1 (the dispatch sweep certified carry itself
#      non-regressing at auto:5: 37.06-37.30 vs 37.30 default). Re-tests the
#      sparser refresh placements with the oversized-block dispatch pathology
#      removed (see tools/sweep_carry_sparse.sh header for the diagnosis).
#   2. end-to-end predict-loop probes — tools/predict_probe.py: the REAL
#      generation loop cost with H2D conditioning upload, D2H image readback,
#      and (one config) PNG encoding included, A/B'ing the round-3 predict
#      pipeline (dispatch k+1 before flushing k), the device-side uint8
#      readback, and +compact_transfer.
#   3. training-step throughput refresh — the host rebooted 2026-08-20; the
#      19.7 samples/s record predates it (tools/bench_train.py).
#
# Results: /tmp/bench_cs_*.json, /tmp/probe_*.json, /tmp/bench_train.json.
set -e
cd "$(dirname "$0")/.."
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock 9 || exit 1

run_bench() {
  tag=$1; shift
  echo "=== bench $tag ($*) ===" >&2
  env "$@" timeout 5400 python bench.py \
    >/tmp/bench_cs_${tag}.json 2>/tmp/bench_cs_${tag}.log || \
    echo "bench $tag FAILED (see log)" >&2
  cat /tmp/bench_cs_${tag}.json >&2 || true
}

probe() {
  tag=$1; shift
  echo "=== probe $tag ($*) ===" >&2
  timeout 3600 python tools/predict_probe.py "$@" \
    >/tmp/probe_${tag}.json 2>/tmp/probe_${tag}.log || \
    echo "probe $tag FAILED (see log)" >&2
  cat /tmp/probe_${tag}.json >&2 || true
}

run_bench carry_auto4 STEDM_BLOCK_CARRY=1 STEDM_BENCH_SCHEDULE=auto:4
run_bench carry_auto3 STEDM_BLOCK_CARRY=1 STEDM_BENCH_SCHEDULE=auto:3

probe serving_pipe
probe serving_nopipe --no-pipeline
probe serving_compact --compact
probe serving_png --png
probe exact_pipe --exact
probe exact_nopipe --exact --no-pipeline

echo "=== bench_train ===" >&2
timeout 5400 python tools/bench_train.py \
  >/tmp/bench_train.json 2>/tmp/bench_train.log || \
  echo "bench_train FAILED (see log)" >&2
cat /tmp/bench_train.json >&2 || true

echo "post-sweep batch done" >&2
