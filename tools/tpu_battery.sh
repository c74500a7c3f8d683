#!/bin/bash
# TPU measurement battery: the full list of measurements blocked on the
# tunnel outage (ROADMAP.md / memory), run sequentially with generous
# timeouts so no job is ever SIGTERM'd mid-remote-compile (which can wedge
# the tunnel for hours). ONE TPU process at a time -- never run this while
# any other TPU-touching python lives.
#
#   bash tools/tpu_battery.sh [outdir]
#
# Writes one log per measurement into outdir (default /tmp/tpu_battery).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_battery}
mkdir -p "$OUT"

probe() {
  # require platform 'tpu': a cleanly-failed plugin falls back to the CPU
  # backend, which would otherwise record CPU numbers as TPU measurements
  timeout 180 python -u -c "import jax, jax.numpy as jnp; d=jax.devices(); x=jnp.ones((128,128)); (x@x).block_until_ready(); print('TPU_OK', d[0].platform)" 2>&1 | grep -q 'TPU_OK tpu'
}

if ! probe; then
  echo "tunnel DOWN -- aborting battery"
  exit 3
fi
echo "tunnel UP -- starting battery at $(date)"

run() {
  name=$1; shift
  echo "=== $name : $* ==="
  timeout 3000 "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  tail -n 25 "$OUT/$name.log"
  if ! probe; then
    echo "tunnel died after $name -- stopping battery"
    exit 4
  fi
}

# 1. raw VMEM-resident Pallas gather vs XLA gather (the decisive
#    measurement for NEWTONNET_GATHER=pallas)
run exp_pallas_gather python -u tools/exp_pallas_gather.py 4096 512 40

# 2. large-N training step: injit vs plain vs newton3 (post Euler fix)
run bench_train_large python -u tools/bench_train_large.py 4096 injit plain newton3

# 3. newton3 train step with the Pallas gather flag (A/B)
run bench_train_large_pallasgather env NEWTONNET_GATHER=pallas \
    python -u tools/bench_train_large.py 4096 newton3

# 4. scatter chunk sweep at the newton3 slot count
for c in 3 6 10 20; do
  run "scatter_chunk_$c" env NEWTONNET_SCATTER_CHUNK=$c \
      python -u tools/bench_train_large.py 4096 newton3
done

# 5. large-MD step (host-rebuild newton3 + in-jit amortized)
run demo_large_md python -u tools/demo_large_md.py 4096 60

# 6. the headline bench
run bench python -u bench.py

# 7. round-4 instruments: row-op floor accounting for the newton3 train
#    step and the dense-headline residual decomposition
run floor_train_large python -u tools/floor_train_large.py 4096
run ablate_dense_residual python -u tools/ablate_dense_residual.py

echo "battery complete at $(date); logs in $OUT"
