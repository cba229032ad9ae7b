#!/bin/bash
# Round-4g: HBM block vote WITHOUT the sort (the sort raises trips and
# taxes ~5us/iter on VMEM tables); the 102k-face point; tape unroll 8.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4g
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4g/probe.log 2>&1; then
  echo "!! axon tunnel unreachable — aborting"; exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4g/probe.log)"

run() { local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4g/$name.log" 2>&1
  tail -2 "/tmp/r4g/$name.log"; return 0
}

if [ "$P" = hbm ] || [ "$P" = all ]; then
  CSGR_HBM_VOTE=block run h245_block_k2 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 2 --frames 1
  CSGR_HBM_VOTE=block run h245_block_k4 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 4 --frames 1
fi

if [ "$P" = m102 ] || [ "$P" = all ]; then
  run m102_k4 1200 python -u tools/bench_mesh.py \
    --subdiv 5 --spheres 5 --modes stream --gather-pages 4
  CSGR_HBM_VOTE=block run m102_block_k4 1200 python -u tools/bench_mesh.py \
    --subdiv 5 --spheres 5 --modes stream --gather-pages 4
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  CSGR_WAVE_UNROLL=8 run tape_u8 900 python -u tools/bench_tape.py
fi

echo "done; logs in /tmp/r4g/"

if [ "$P" = u32 ] || [ "$P" = all ]; then
  CSGR_WAVE_UNROLL=32 run bench_u32 900 python -u bench.py --no-p50
  CSGR_WAVE_UNROLL=24 run bench_u24 900 python -u bench.py --no-p50
fi
