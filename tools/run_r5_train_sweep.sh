#!/bin/bash
# Round-5 training-MFU lever sweep (VERDICT r4 task 2), serialized under the
# bench flock. Measures, in order of information value:
#   1. new default        : fused flat-buffer AdamW + swin attention remat
#   2. optax control      : stock per-leaf optax.adamw (round-4 behavior) [--optax_adamw]
#   3. accum=1            : exposes the full apply cost per step (r4: 638.8 ms)
#   4. batch 32           : did the swin remat clear the OOM? (r4: OOM)
#   5. no swin remat      : isolates the remat's throughput effect
#   6. bf16 first moment  : optimizer HBM halving on m
# Each row: tools/bench_train.py JSON to /tmp/r5_train_<label>.json.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
export STEDM_BENCH_LOCK_HELD=1   # children of this flock-holding script

run() {
  label=$1; shift
  echo "=== $label: bench_train $* ===" >&2
  timeout 3000 python tools/bench_train.py "$@" \
    > "/tmp/r5_train_${label}.json" 2> "/tmp/r5_train_${label}.log"
  echo "rc=$? $(cat /tmp/r5_train_${label}.json)" >&2
}

exec 9>/tmp/stedm_bench.lock
flock 9

run default
run optax --optax_adamw
run accum1 --accum 1
run accum1_optax --accum 1 --optax_adamw
run b32 --batch 32 --no_cost
run noswinremat --no_swin_remat
run mbf16 --m_bf16
echo "sweep done" >&2
