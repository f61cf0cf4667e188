#!/bin/bash
# Round-5 follow-up batch: the arms the first batch lost to per-leg
# timeouts on the degraded tunnel (ON arms only — the OFF baselines are
# on record in docs/TAIL_r05.md; tail_ab --arms on halves the warmup
# compiles). Same tunnel discipline as round5_batch.sh.
set -u
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
cd "$(dirname "$0")/.."
LEGS="${*:-tailmax64 order orderf64 fmg2dd overlap tail512 bench}"

probe() {
  timeout 180 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = float(jnp.ones((64, 64, 64)).sum())
print(f"probe ok: {x} {time.time()-t0:.1f}s", flush=True)
EOF
}

ok=0
for i in 1 2 3 4 5 6; do
  if probe; then ok=1; break; fi
  echo "probe $i failed; cooling down 300s" >&2
  sleep 300
done
if [ "$ok" != 1 ]; then echo "TUNNEL DOWN — aborting batch" >&2; exit 1; fi

quiet() { grep -vE "Platform 'axon'|cpu_aot_loader"; }
has() { case " $LEGS " in *" $1 "*) return 0;; *) return 1;; esac; }

if has tailmax64; then
  echo "=== tail_ab --one-launch --max-dim 64 --arms on (128/256) ==="
  timeout 2700 python -m hpgmg_tpu.bench.tail_ab --one-launch --max-dim 64 \
    --arms on --n 128 256 2>&1 | quiet
fi

if has tail512; then
  echo "=== tail_ab --one-launch --arms on (256/512) ==="
  timeout 2700 python -m hpgmg_tpu.bench.tail_ab --one-launch \
    --arms on --n 256 512 2>&1 | quiet
fi

if has order; then
  echo "=== order_ab @512 f32 decisive pair (VERDICT #3) ==="
  timeout 3600 python -m hpgmg_tpu.bench.order_ab --n 512 \
    --subset default,r3 2>&1 | quiet
fi

if has order2; then
  echo "=== order_ab @512 f32 single-flag arms ==="
  timeout 3600 python -m hpgmg_tpu.bench.order_ab --n 512 \
    --subset pool,fres 2>&1 | quiet
fi

if has orderf64; then
  echo "=== order_ab @256 f64 noise-free arm ==="
  timeout 3000 python -m hpgmg_tpu.bench.order_ab --n 256 --f64 2>&1 | quiet
fi

if has fmg2dd; then
  echo "=== fmg2dd mixed-precision floor on-chip @256 (VERIFY_r05) ==="
  timeout 3000 python -m hpgmg_tpu.bench.cli --n 256 --driver fmg2dd \
    --bottom direct 2>&1 | quiet
fi

if has overlap; then
  echo "=== kernel_sweep --slab --overlap (comm-overlap split drive) ==="
  timeout 3000 python -m hpgmg_tpu.bench.kernel_sweep --sizes 128 256 \
    --slab --overlap 2>&1 | quiet
fi

if has bench; then
  echo "=== bench.py headline ==="
  timeout 3000 python bench.py 2>&1 | quiet
fi
echo "=== batch done ==="
