#!/bin/bash
# Round-5 blocked-attention sweep (CLAUDE.md roadmap item 1): does flash-style
# attention for the legacy bottleneck AttentionBlock (a) move batch-8 512^2
# throughput, (b) clear the batch-32 OOM wall (r5: OOM by 1.85G even with
# remat everywhere; largest temp = fp32 [32,8,1024,1024] attention logits)?
#   smoke       : standalone flash fwd+grad at bottleneck shape - derisks the
#                 Mosaic kernel through the remote-compile tunnel (~seconds of
#                 program) before burning train-step compiles
#   flash_b8    : best-known config (optax + mu bf16) + flash attention
#   flash_b32   : batch 32 with flash - the OOM-wall test
#   flash_b32_r : fallback with ResBlock remat too, only if b32 OOMs
#   chunk_b8    : portable checkpointed-chunk path, same config - prices the
#                 non-Pallas fallback
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

echo "=== smoke: flash fwd+grad at [8,8,1024,128] ===" >&2
timeout 1200 python - > /tmp/r5_attn_smoke.log 2>&1 <<'EOF'
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/stedm_jax_cache")
from stedm_tpu.ops.blocked_attention import sdpa
q = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 1024, 128), jnp.bfloat16)
scale = 1.0 / jnp.sqrt(jnp.sqrt(128.0))
def loss(q, k, v, impl):
    return jnp.sum(sdpa(q, k, v, scale, impl=impl).astype(jnp.float32) ** 2)
t0 = time.time()
gf = jax.jit(jax.grad(loss, (0, 1, 2)), static_argnums=3)(q, q, q, "flash")
jax.block_until_ready(gf); print("flash grad ok", time.time() - t0, "s")
ge = jax.jit(jax.grad(loss, (0, 1, 2)), static_argnums=3)(q, q, q, "exact")
jax.block_until_ready(ge)
import numpy as np
for a, b in zip(ge, gf):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    s = np.abs(np.asarray(a, np.float32))
    print("max abs diff", float(d.max()), "rel", float(d.max() / (s.max() + 1e-9)))
of = jax.jit(loss, static_argnums=3)(q, q, q, "flash")
oe = jax.jit(loss, static_argnums=3)(q, q, q, "exact")
print("loss flash", float(of), "exact", float(oe))
EOF
echo "smoke rc=$?" >&2; tail -6 /tmp/r5_attn_smoke.log >&2

run flash_b8 --m_bf16 --optax_adamw --attn flash
run flash_b32 --batch 32 --optax_adamw --attn flash --no_cost
if ! [ -s /tmp/r5_attn_flash_b32.json ]; then
  run flash_b32_r --batch 32 --optax_adamw --attn flash --remat --no_cost
fi
run chunk_b8 --m_bf16 --optax_adamw --attn chunked
echo "attn sweep done" >&2
