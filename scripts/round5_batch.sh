#!/bin/bash
# Round-5 on-chip batch (VERDICT r4 items 1-5): probe once, then run the
# legs most likely to die on a degraded tunnel (big FE compiles) while
# the tunnel is freshest, with per-leg timeouts so nothing can hang the
# batch. Tunnel discipline per CLAUDE.md: ONE probe retry-loop up front,
# serialized jobs, quiet host CPU.
#
# Usage: bash scripts/round5_batch.sh [legs...]   (default: all)
set -u
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
cd "$(dirname "$0")/.."
LEGS="${*:-tail128 feA feB tail order orderf64 fmg2dd overlap bench}"

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

if has tail128; then
  echo "=== tail_ab --one-launch @128 (quick default-decider) ==="
  timeout 1200 python -m hpgmg_tpu.bench.tail_ab --one-launch --n 128 \
    2>&1 | quiet
fi

if has feA; then
  echo "=== FE sampler leg A (<=48^3; 32^3 compiles in 49s on 1 CPU core) ==="
  timeout 3000 python -m hpgmg_tpu.fe.cli sample -local 50,111000 \
    -maxsamples 10 -dtype float32 2>&1 | quiet
fi

if has feB; then
  echo "=== FE sampler leg B (64^3; ~2.5 min compile on 1 CPU core) ==="
  timeout 3000 python -m hpgmg_tpu.fe.cli sample -local 111001,262200 \
    -maxsamples 4 -dtype float32 2>&1 | quiet
fi

if has tail; then
  echo "=== tail_ab --one-launch full (64..512) ==="
  timeout 2400 python -m hpgmg_tpu.bench.tail_ab --one-launch \
    --n 64 256 512 2>&1 | quiet
  echo "=== tail_ab --one-launch --max-dim 64 (pull level-64 in-kernel) ==="
  timeout 1800 python -m hpgmg_tpu.bench.tail_ab --one-launch --max-dim 64 \
    --n 128 256 2>&1 | quiet
fi

if has order; then
  echo "=== order_ab @512 f32 flag matrix (VERDICT #3) ==="
  timeout 3000 python -m hpgmg_tpu.bench.order_ab --n 512 2>&1 | quiet
fi

if has orderf64; then
  echo "=== order_ab @256 f64 noise-free arm ==="
  timeout 2400 python -m hpgmg_tpu.bench.order_ab --n 256 --f64 2>&1 | quiet
fi

if has fmg2dd; then
  echo "=== fmg2dd mixed-precision floor on-chip @256 (VERIFY_r05) ==="
  timeout 2400 python -m hpgmg_tpu.bench.cli --n 256 --driver fmg2dd \
    --bottom direct 2>&1 | quiet
fi

if has overlap; then
  echo "=== kernel_sweep --slab --overlap (comm-overlap split drive) ==="
  timeout 2400 python -m hpgmg_tpu.bench.kernel_sweep --sizes 128 256 \
    --slab --overlap 2>&1 | quiet
fi

if has bench; then
  echo "=== bench.py headline ==="
  timeout 2400 python bench.py 2>&1 | quiet
fi
echo "=== batch done ==="
