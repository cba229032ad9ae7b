#!/bin/bash
# Round-4f TPU batch: sublane page-sort binning (CSGR_STREAM_SORT) sweep
# + unroll=8 headline confirm. Strictly sequential; logs in /tmp/r4f/.
#
#   bash tools/tpu_round4f_batch.sh [phase]   phases: sort bench all

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4f
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4f/probe.log 2>&1; then
  echo "!! axon tunnel unreachable — aborting"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4f/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4f/$name.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r4f/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = sort ] || [ "$P" = all ]; then
  # sort on, k sweep, packer-default rung (n=32) and the measured-best
  # rung (n=40); baselines: 11.6 (k4 default), 12.3 (k4 ns40)
  CSGR_STREAM_SORT=1 run s15_k4 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4
  CSGR_STREAM_SORT=1 run s15_k2 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 2
  CSGR_STREAM_SORT=1 CSGR_STREAM_NSIDE=40 run s15_k4_ns40 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  CSGR_STREAM_SORT=1 CSGR_STREAM_NSIDE=40 run s15_k2_ns40 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 2
  # trips census under the sort (vs 1.56 trips/iter unsorted at k4)
  CSGR_STREAM_SORT=1 CSGR_DEBUG_TRIPS=1 run s15_k4_trips 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream \
    --gather-pages 4 --frames 1
  CSGR_STREAM_SORT=1 run s61_k4 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 4
  CSGR_STREAM_SORT=1 run s61_k2 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 2
fi

if [ "$P" = hbm ] || [ "$P" = all ]; then
  # 245k: sort + per-group block HBM vote (census: shared-set dots are
  # 97% of the 27.9 s frame; baseline 1.0 Mrays/s at k=8 tile-global)
  CSGR_STREAM_SORT=1 CSGR_HBM_VOTE=block run h245_sort_block_k2 1200 \
    python -u tools/bench_mesh.py --subdiv 6 --modes stream \
    --gather-pages 2 --frames 1
  CSGR_STREAM_SORT=1 CSGR_HBM_VOTE=block run h245_sort_block_k4 1200 \
    python -u tools/bench_mesh.py --subdiv 6 --modes stream \
    --gather-pages 4 --frames 1
  CSGR_STREAM_SORT=1 run h245_sort_global_k8 1200 \
    python -u tools/bench_mesh.py --subdiv 6 --modes stream \
    --gather-pages 8 --frames 1
fi

if [ "$P" = bench ] || [ "$P" = all ]; then
  # 64-spp headline at unroll 8 (census protocol showed 542.8 -> 561.4
  # at 16 spp; confirm the amortized number before flipping the default)
  CSGR_WAVE_UNROLL=8 run bench_u8 900 python -u bench.py --no-p50
  CSGR_WAVE_UNROLL=16 run bench_u16 900 python -u bench.py --no-p50
fi

echo "done; logs in /tmp/r4f/"
