#!/bin/bash
# Round-5b: measure the DMA-staged serve (CSGR_STREAM_SERVE=dma) for
# VMEM stream tables — the round-5 serve-wall decomposition says the
# service scaffold (dynamic slab slices + concat + one-hot) is 49% of
# the 15k wall; the dma path replaces the 32 dynamic slices with async
# copies to STATIC scratch offsets. Baselines: 15k ns40 pw64 k4 = 14.4,
# 61k pw64 k4 = 6.7 Mrays/s.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5b
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r5b/probe.log 2>&1; then
  echo "!! axon tunnel unreachable — aborting"; exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r5b/probe.log)"

run() { local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r5b/$name.log" 2>&1
  tail -2 "/tmp/r5b/$name.log"; return 0
}

if [ "$P" = s15 ] || [ "$P" = all ]; then
  CSGR_STREAM_SERVE=dma CSGR_STREAM_NSIDE=40 run s15_dma_k4 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
fi

if [ "$P" = s61 ] || [ "$P" = all ]; then
  CSGR_STREAM_SERVE=dma run s61_dma_k4 900 \
    python -u tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 4
fi

echo "done; logs in /tmp/r5b/"
