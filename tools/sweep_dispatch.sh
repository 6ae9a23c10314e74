#!/bin/sh
# On-chip dispatch-lever sweep for the composed serving default (auto:5 +
# cfg window 0.2:0.8 = 37.3 img/s certified 2026-08-19). The composed path
# is host-dispatch-bound (throughput is non-monotonic in block shapes,
# BASELINE.md frontier sweep), so this sweeps the levers that change ONLY
# the program partition / dispatch economics, never the trajectory math:
#
#   carry10 — STEDM_BLOCK_CARRY=1: thread the deep-feature cache between
#             blocks -> uniform unroll-10 blocks regardless of refresh
#             placement (parity-tested in tests/test_host_sampler.py,
#             never yet measured on chip)
#   carry17/25 — same, fewer+bigger blocks (3 / 2 dispatches per trajectory)
#   batch16 — amortize per-dispatch host latency over 2x images ("batch
#             beyond 8 doesn't help" was established on the COMPUTE-bound
#             exact path only)
#
# Every run carries its own in-process exact control; a surprising winner
# still needs tools/recert_frontier.sh solo recertification before any
# default change (CLAUDE.md protocol). Results: /tmp/bench_d_{TAG}.json.
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
  env "$@" timeout 5400 python bench.py \
    >/tmp/bench_d_${tag}.json 2>/tmp/bench_d_${tag}.log
  cat /tmp/bench_d_${tag}.json >&2
}
# defaults first: re-certifies the incumbent on the current terminal state
# and warms the wiped compile cache for everything that follows
run default  STEDM_BENCH_REPS=3
run carry10  STEDM_BLOCK_CARRY=1
run carry17  STEDM_BLOCK_CARRY=1 STEDM_BENCH_UNROLL=17
run carry25  STEDM_BLOCK_CARRY=1 STEDM_BENCH_UNROLL=25
run batch16  STEDM_BENCH_BATCH=16
echo "dispatch sweep done" >&2
