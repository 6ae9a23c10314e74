#!/bin/sh
# On-chip refresh-SCHEDULE sweep: calibrated (auto:R) and uniform placements
# through bench.py, one config at a time (this host has one CPU core — never
# overlap TPU benches). Companion of sweep_serving.sh (interval x levels);
# quality pricing for the same placements is tools/deepcache_quality.py
# --schedules (BASELINE.md round-3 "Non-uniform refresh placement" table).
# Results land in /tmp/bench_s_{SPEC}.json.
set -e
for spec in "auto:13" "auto:10" "uniform:5"; do
  tag=$(echo "$spec" | tr ':' '_')
  echo "=== schedule $spec ===" >&2
  STEDM_BENCH_SCHEDULE=$spec \
    timeout 3600 python bench.py >/tmp/bench_s_${tag}.json 2>/tmp/bench_s_${tag}.log
  cat /tmp/bench_s_${tag}.json >&2
done
# guidance-interval composition (BASELINE.md guidance-interval pricing table)
for spec in "auto:13" "auto:10"; do
  tag=$(echo "$spec" | tr ':' '_')_cfgi
  echo "=== schedule $spec + cfg_interval 0.2:0.8 ===" >&2
  STEDM_BENCH_SCHEDULE=$spec STEDM_BENCH_CFG_INTERVAL=0.2:0.8 \
    timeout 3600 python bench.py >/tmp/bench_s_${tag}.json 2>/tmp/bench_s_${tag}.log
  cat /tmp/bench_s_${tag}.json >&2
done
echo "schedule sweep done" >&2
