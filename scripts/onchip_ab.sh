#!/bin/bash
# On-chip A/B batch — run after ANY kernel change (the operators.test.c
# discipline, /root/reference/finite-volume/source/operators.test.c:182-197:
# every kernel variant must converge identically inside the same driver).
#
# Encodes the hard-won tunnel discipline from CLAUDE.md:
#   * probe retry-loop ONCE up front (the tunnel can be down/degraded;
#     cooldowns recover it) — never probe again mid-batch;
#   * serialize all TPU jobs, keep the host CPU quiet (no concurrent
#     pytest: compiles are host-CPU-bound and starve the tunnel helper);
#   * per-job timeouts so a sick tunnel cannot hang the batch;
#   * results go to stdout — commit them to docs/AB_r*.txt.
#
# Usage: bash scripts/onchip_ab.sh [sizes...]   (default: 128 256)
set -u
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
cd "$(dirname "$0")/.."
SIZES="${*:-128 256}"

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

echo "=== ab_test (whole-solve identical-convergence) ==="
# shellcheck disable=SC2086
timeout 2400 python -m hpgmg_tpu.bench.ab_test --sizes $SIZES 2>&1 | quiet

echo "=== kernel_sweep (per-kernel timings at the tuned tiles) ==="
# shellcheck disable=SC2086
timeout 2400 python -m hpgmg_tpu.bench.kernel_sweep --sizes $SIZES \
  --gsrb2 --prediff 2>&1 | quiet

echo "=== restrict_sweep (restriction variants) ==="
# shellcheck disable=SC2086
timeout 2400 python -m hpgmg_tpu.bench.restrict_sweep --sizes $SIZES \
  2>&1 | quiet
echo "=== batch done ==="
