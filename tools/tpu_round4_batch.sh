#!/bin/bash
# Round-4 TPU measurement queue — run AFTER tools/tpu_round3_batch.sh.
# ONE TPU process at a time (strictly sequential). Logs in /tmp/r4/.
#
#   bash tools/tpu_round4_batch.sh [phase]
# phases: mesh census unroll tape fidelity all (default: all)

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4/$name.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r4/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = mesh ] || [ "$P" = all ]; then
  # per-group page voting restored (round-4 revert of the tile-global
  # restructure): expect >= the round-3 11.6/5.8 baselines
  for k in 2 4 8; do
    run "mesh15k_pg_k$k" 900 python -u tools/bench_mesh.py \
      --subdiv 4 --modes stream --gather-pages "$k"
  done
  run mesh61k_pg_k4 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 4
  run mesh61k_pg_k8 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 8
  run mesh245k_pg_k8 1800 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  # service cost split at 15k/k4: trips, iters, and the stubs
  CSGR_DEBUG_TRIPS=1 run mesh15k_pg_trips 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4 --frames 1
  CSGR_DEBUG_ITERS=1 run mesh15k_pg_iters 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4 --frames 1
  CSGR_STUB=mt run mesh15k_pg_stub_mt 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4 --frames 1
  CSGR_STUB=gather run mesh15k_pg_stub_gather 900 python -u \
    tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4 --frames 1
fi

if [ "$P" = unroll ] || [ "$P" = all ]; then
  # wavefront unroll on the REAL headline config (1080p 64 spp): round-3b
  # census measured unroll2 +17% at 16 spp (200 -> 171 ms)
  CSGR_WAVE_UNROLL=2 run bench_unroll2 1200 python -u bench.py --no-p50
  CSGR_WAVE_UNROLL=4 run bench_unroll4 1200 python -u bench.py --no-p50
  run bench_base 1200 python -u bench.py
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  # classic_wavefront unroll on the tape kernel (config5) + clusters
  run tape_base 900 python -u tools/bench_tape.py
  CSGR_WAVE_UNROLL=2 run tape_unroll2 900 python -u tools/bench_tape.py
  CSGR_WAVE_UNROLL=4 run tape_unroll4 900 python -u tools/bench_tape.py
  run tape_many 900 python -u tools/bench_tape.py --scene many
  CSGR_WAVE_UNROLL=4 run tape_many_unroll4 900 python -u \
    tools/bench_tape.py --scene many
fi

if [ "$P" = fidelity ] || [ "$P" = all ]; then
  # config7 at the raised spp cap + the new stream/HBM fidelity configs
  run validate_new 3600 python -u tools/validate_tpu.py \
    --only config7,config8,config9,config10
fi

echo "done; logs in /tmp/r4/"
