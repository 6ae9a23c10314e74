#!/bin/sh
# Sparse composed schedules UNDER CROSS-BLOCK CACHE CARRY. The 2026-08-19
# frontier sweep measured auto:4 (34.3) and auto:3 (4.3!) SLOWER than auto:5
# (37.3) despite strictly less math — diagnosed as the host-block partition:
# without carry, a refresh period longer than the unroll budget becomes one
# oversized block program (auto:4 a 25-step block, auto:3 a 32-step one), and
# oversized programs dispatch pathologically on this terminal
# (tools/frontier_block_probe.py). STEDM_BLOCK_CARRY=1 chunks ANY schedule
# into uniform unroll-sized blocks, so this sweep re-tests the sparser
# placements with the partition pathology removed.
#
# Run only after tools/sweep_dispatch.sh shows carry is not itself a
# regression at auto:5. A throughput winner still needs (a) trained-tiny-model
# FID pricing (tools/deepcache_quality.py --schedules auto:4 auto:3
# --cfg_intervals 0.2:0.8) and (b) solo recertification before any default
# change (CLAUDE.md protocol). Results: /tmp/bench_cs_{TAG}.json.
set -e
# children of this script must not re-acquire the flock bench.py now takes
export STEDM_BENCH_LOCK_HELD=1
exec 9>/tmp/stedm_bench.lock
flock -n 9 || { echo "another bench/sweep holds /tmp/stedm_bench.lock — refusing to overlap (1-core host)" >&2; exit 1; }
run() {
  tag=$1; shift
  echo "=== $tag ($*) ===" >&2
  env "$@" timeout 5400 python bench.py \
    >/tmp/bench_cs_${tag}.json 2>/tmp/bench_cs_${tag}.log
  cat /tmp/bench_cs_${tag}.json >&2
}
run carry_auto4  STEDM_BLOCK_CARRY=1 STEDM_BENCH_SCHEDULE=auto:4
run carry_auto3  STEDM_BLOCK_CARRY=1 STEDM_BENCH_SCHEDULE=auto:3
echo "carry-sparse sweep done" >&2
