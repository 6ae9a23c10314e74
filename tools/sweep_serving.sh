#!/bin/sh
# On-chip serving-knob sweep (VERDICT r2 task 5): cache_interval x cache_levels
# through bench.py, one config at a time (this host has one CPU core — never
# overlap TPU benches). Results land in /tmp/bench_i{I}_l{L}.json.
set -e
# serialize against any other bench/sweep (see sweep_schedules.sh: overlapping
# benches on this 1-core host corrupted a whole sweep's timings)
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock -n 9 || { echo "another bench/sweep holds /tmp/stedm_bench.lock — refusing to overlap (1-core host)" >&2; exit 1; }
for cfg in "3 1" "2 1" "3 2" "2 2"; do
  set -- $cfg
  I=$1; L=$2
  echo "=== interval $I levels $L ===" >&2
  # pin schedule/cfg-window EMPTY: bench.py defaults them to the composed
  # frontier (auto:10 + 0.2:0.8) and this sweep measures uniform intervals
  STEDM_BENCH_SCHEDULE= STEDM_BENCH_CFG_INTERVAL= \
    STEDM_BENCH_INTERVAL=$I STEDM_BENCH_LEVELS=$L \
    timeout 3600 python bench.py >/tmp/bench_i${I}_l${L}.json 2>/tmp/bench_i${I}_l${L}.log
  cat /tmp/bench_i${I}_l${L}.json >&2
done
echo "sweep done" >&2
