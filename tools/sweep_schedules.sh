#!/bin/sh
# On-chip refresh-SCHEDULE sweep: calibrated (auto:R) and uniform placements
# plus guidance-interval CFG composition, through bench.py, one config at a
# time (this host has one CPU core — never overlap TPU benches). Companion of
# sweep_serving.sh (interval x levels); quality pricing for the same
# placements is tools/deepcache_quality.py --schedules / --cfg_intervals
# (BASELINE.md round-3 tables). Results land in /tmp/bench_s_{TAG}.json.
set -e
# serialize against any other bench/sweep on this host: overlapping runs
# contaminated a whole round-3 sweep (BASELINE.md: a "resume" and a "redo" of
# this script ran concurrently with its original and produced 4-6x-slow
# readings on every composed point). The lock makes a second launch fail fast
# instead of silently corrupting both measurements.
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock -n 9 || { echo "another bench/sweep holds /tmp/stedm_bench.lock — refusing to overlap (1-core host)" >&2; exit 1; }
run() {
  tag=$1; shift
  echo "=== $tag ($*) ===" >&2
  # pin both knobs EMPTY first: bench.py now defaults them to the composed
  # frontier (auto:10 + 0.2:0.8), and each sweep point must set ONLY what it
  # names (the per-point env below overrides the empty pins)
  env STEDM_BENCH_SCHEDULE= STEDM_BENCH_CFG_INTERVAL= "$@" \
    timeout 5400 python bench.py \
    >/tmp/bench_s_${tag}.json 2>/tmp/bench_s_${tag}.log
  cat /tmp/bench_s_${tag}.json >&2
}
# guidance window on the uniform default (quality: 21.6 dB / FID 0.0003 —
# better than the plain interval-3 control on both)
run i3_cfgi            STEDM_BENCH_CFG_INTERVAL=0.2:0.8
# calibrated placements at decreasing refresh counts (17 = interval-3's count)
run auto_17            STEDM_BENCH_SCHEDULE=auto:17
run auto_13            STEDM_BENCH_SCHEDULE=auto:13
run auto_10            STEDM_BENCH_SCHEDULE=auto:10
# uniform anchor at the same count as auto:10
run uniform_5          STEDM_BENCH_SCHEDULE=uniform:5
# guidance-interval composition on the calibrated schedules
run auto_13_cfgi       STEDM_BENCH_SCHEDULE=auto:13 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
run auto_10_cfgi       STEDM_BENCH_SCHEDULE=auto:10 STEDM_BENCH_CFG_INTERVAL=0.2:0.8
echo "schedule sweep done" >&2
