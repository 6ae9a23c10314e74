#!/bin/bash
# Round-5 blocked-attention sweep, part 2: the flash rows again after fixing
# the static-sm_scale tracing bug (flash_sdpa's float(scale) failed under
# eval_shape's abstract init trace; AttentionBlock now passes a python float).
# Part 1's smoke row already proved the Mosaic kernel compiles and runs
# through the tunnel (fwd+grad, bf16-tolerance parity vs exact).
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
export STEDM_BENCH_LOCK_HELD=1

run() {
  label=$1; shift
  echo "=== $label: bench_train $* ===" >&2
  timeout 2400 python tools/bench_train.py "$@" \
    > "/tmp/r5_attn_${label}.json" 2> "/tmp/r5_attn_${label}.log"
  echo "rc=$? $(cat /tmp/r5_attn_${label}.json)" >&2
}

exec 9>/tmp/stedm_bench.lock
flock 9

run flash_b8 --m_bf16 --optax_adamw --attn flash
# part 1's chunk_b8 measured 3996.9 ms/step - within 2% of the round-5
# "execution anomaly" control (3916 ms, BASELINE.md); certify solo per
# CLAUDE.md before believing the chunked path is actually 10x slow
run chunk_b8_rerun --m_bf16 --optax_adamw --attn chunked --no_cost
run flash_b32 --batch 32 --optax_adamw --attn flash --no_cost
if ! [ -s /tmp/r5_attn_flash_b32.json ]; then
  run flash_b32_r --batch 32 --optax_adamw --attn flash --remat --no_cost
fi
echo "attn sweep2 done" >&2
