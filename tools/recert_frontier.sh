#!/bin/sh
# Solo recertification of surprising frontier points (CLAUDE.md protocol:
# a surprising serving number is only believed after a solo rerun under the
# bench flock — the in-process exact control cannot certify the serving
# number because serving is timed FIRST and contention that ends mid-run
# corrupts only that first measurement).
#
# Usage: tools/recert_frontier.sh TAG SCHEDULE [CFG_INTERVAL]
#   e.g. tools/recert_frontier.sh auto_6_recert auto:6 0.2:0.8
# Results land in /tmp/bench_rc_{TAG}.json / .log.
set -e
TAG=${1:?tag}; SCHED=${2:?schedule}; CFGI=${3:-0.2:0.8}
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock -n 9 || { echo "another bench/sweep holds /tmp/stedm_bench.lock — refusing to overlap (1-core host)" >&2; exit 1; }
echo "=== recert $TAG (STEDM_BENCH_SCHEDULE=$SCHED STEDM_BENCH_CFG_INTERVAL=$CFGI) ===" >&2
env STEDM_BENCH_SCHEDULE="$SCHED" STEDM_BENCH_CFG_INTERVAL="$CFGI" \
  timeout 5400 python bench.py \
  >/tmp/bench_rc_${TAG}.json 2>/tmp/bench_rc_${TAG}.log
cat /tmp/bench_rc_${TAG}.json >&2
