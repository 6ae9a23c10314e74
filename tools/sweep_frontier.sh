#!/bin/sh
# On-chip frontier sweep: push the composed serving point (calibrated refresh
# schedule + guidance window) to FEWER refreshes. The round-3 certified point
# is auto:10 + cfg 0.2:0.8 = 28.9 img/s with cached-vs-exact FID_rp ~100x
# below the metric noise floor (BASELINE.md) — the quality budget has room
# for a sparser schedule. Companion quality pricing on the trained tiny
# model: tools/deepcache_quality.py --schedules auto:8 auto:7 auto:6 auto:5
# --cfg_intervals 0.2:0.8. Results land in /tmp/bench_f_{TAG}.json.
set -e
# one CPU core on this host: overlapped benches corrupt every measurement
# (BASELINE.md 2026-08-19 forensics) — refuse to run alongside another.
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock -n 9 || { echo "another bench/sweep holds /tmp/stedm_bench.lock — refusing to overlap (1-core host)" >&2; exit 1; }
run() {
  tag=$1; shift
  echo "=== $tag ($*) ===" >&2
  # pin both knobs EMPTY first: bench.py defaults to the composed frontier
  # (auto:10 + 0.2:0.8); each point must set ONLY what it names
  env STEDM_BENCH_SCHEDULE= STEDM_BENCH_CFG_INTERVAL= "$@" \
    timeout 5400 python bench.py \
    >/tmp/bench_f_${tag}.json 2>/tmp/bench_f_${tag}.log
  cat /tmp/bench_f_${tag}.json >&2
}
run auto_8_cfgi  STEDM_BENCH_SCHEDULE=auto:8 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
run auto_7_cfgi  STEDM_BENCH_SCHEDULE=auto:7 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
run auto_6_cfgi  STEDM_BENCH_SCHEDULE=auto:6 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
run auto_5_cfgi  STEDM_BENCH_SCHEDULE=auto:5 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
echo "frontier sweep done" >&2
