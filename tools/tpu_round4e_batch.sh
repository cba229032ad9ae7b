#!/bin/bash
# Round-4e TPU measurement batch — strictly sequential, one TPU process
# at a time (CLAUDE.md). Logs land in /tmp/r4e/.
#
#   bash tools/tpu_round4e_batch.sh [phase]
# phases: sphere q6 census245 all (default: all)

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4e
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4e/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4e/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4e/$name.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r4e/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = sphere ] || [ "$P" = all ]; then
  # does the loop-boundary amortization keep paying past 4?
  CSGR_WAVE_UNROLL=8 run sph_unroll8 900 python -u tools/census_sphere.py
  CSGR_WAVE_UNROLL=6 run sph_unroll6 900 python -u tools/census_sphere.py
fi

if [ "$P" = q6 ] || [ "$P" = all ]; then
  # 1-block chunks (rr=115): half the per-serve MACs, ~1.67x chains
  CSGR_STREAM_Q1=1 CSGR_STREAM_NSIDE=40 run m15_q6_ns40 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  CSGR_STREAM_Q1=1 run m61_q6 900 \
    python -u tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 4
fi

if [ "$P" = census245 ] || [ "$P" = all ]; then
  # itemize the 245k HBM frame: DMA service vs dense map vs MT vs scaffold
  run m245_base 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  CSGR_DEBUG_ITERS=1 run m245_iters 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  CSGR_DEBUG_TRIPS=1 run m245_trips 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  CSGR_STUB=mt run m245_stub_mt 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  CSGR_STUB=gather run m245_stub_gather 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  CSGR_STUB=dense run m245_stub_dense 1200 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
fi

echo "done; logs in /tmp/r4e/"
