#!/bin/bash
# Round-5 training sweep, part 2 (after part 1 attributed the fused-AdamW
# regression): all rows on the stock optax path.
#   b32         : does batch 32 fit at 512^2 with the swin-attn remat? (r4: OOM)
#   b32_remat   : fallback with U-Net ResBlock remat too
#   noswinremat : this-terminal control without the swin remat (r4 behavior)
#   mubf16      : optax mu_dtype=bf16 - first-moment traffic halved in the
#                 native per-leaf layout
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
export STEDM_BENCH_LOCK_HELD=1

run() {
  label=$1; shift
  echo "=== $label: bench_train $* ===" >&2
  timeout 3000 python tools/bench_train.py "$@" \
    > "/tmp/r5_train_${label}.json" 2> "/tmp/r5_train_${label}.log"
  echo "rc=$? $(cat /tmp/r5_train_${label}.json)" >&2
}

exec 9>/tmp/stedm_bench.lock
flock 9

run b32 --batch 32 --optax_adamw --no_cost
if ! [ -s /tmp/r5_train_b32.json ]; then
  run b32_remat --batch 32 --optax_adamw --remat --no_cost
fi
run noswinremat --no_swin_remat --optax_adamw
run mubf16 --m_bf16 --optax_adamw
echo "sweep2 done" >&2
