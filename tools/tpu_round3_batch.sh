#!/bin/bash
# Round-3b TPU measurement backlog — run when the axon tunnel is healthy.
# ONE TPU process at a time (the script is strictly sequential); each
# variant is its own process because the census env knobs are read at
# trace time. Logs land in /tmp/r3b/.
#
#   bash tools/tpu_round3_batch.sh [phase]
# phases: fidelity bench mesh census all (default: all)

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3b
P="${1:-all}"

# tunnel liveness gate: a wedged tunnel hangs every jax call forever
# (CLAUDE.md round-3b outage) — bail out early instead of queueing kills
if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r3b/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r3b/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r3b/$name.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r3b/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = fidelity ] || [ "$P" = all ]; then
  run validate 1500 python -u tools/validate_tpu.py
fi

if [ "$P" = bench ] || [ "$P" = all ]; then
  run bench 900 python -u bench.py
fi

if [ "$P" = mesh ] || [ "$P" = all ]; then
  # global-page + page-major stream layout (round 3b): k sweep at 15k,
  # best-k at 61k, HBM at 245k (first compile can take minutes)
  for k in 2 4 8; do
    run "mesh15k_k$k" 900 python -u tools/bench_mesh.py \
      --subdiv 4 --modes stream --gather-pages "$k"
  done
  run mesh15k_tiered 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes tiered
  run mesh61k_k4 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 4
  run mesh61k_k8 900 python -u tools/bench_mesh.py \
    --subdiv 5 --modes stream --gather-pages 8
  run mesh245k_k8 1800 python -u tools/bench_mesh.py \
    --subdiv 6 --modes stream --gather-pages 8 --frames 1
  # census: trips + iters at 15k/k4 (new layout)
  CSGR_DEBUG_TRIPS=1 run mesh15k_trips 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4 --frames 1
  CSGR_DEBUG_ITERS=1 run mesh15k_iters 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4 --frames 1
fi

if [ "$P" = census ] || [ "$P" = all ]; then
  # sphere wavefront remainder itemization (VERDICT #5):
  # solve F (per-iter fixed) and S (per-step) from the unroll family,
  # carry cost from the pad slope, iters from DEBUG_ITERS
  run sph_base 900 python -u tools/census_sphere.py
  CSGR_DEBUG_ITERS=1 run sph_base_iters 900 python -u tools/census_sphere.py
  CSGR_WAVE_UNROLL=2 run sph_unroll2 900 python -u tools/census_sphere.py
  CSGR_WAVE_UNROLL=2 CSGR_DEBUG_ITERS=1 run sph_unroll2_iters 900 \
    python -u tools/census_sphere.py
  CSGR_WAVE_UNROLL=4 run sph_unroll4 900 python -u tools/census_sphere.py
  CSGR_WAVE_PAD=4 run sph_pad4 900 python -u tools/census_sphere.py
  CSGR_WAVE_PAD=12 run sph_pad12 900 python -u tools/census_sphere.py
fi

echo "done; logs in /tmp/r3b/"
