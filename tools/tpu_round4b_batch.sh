#!/bin/bash
# Round-4b TPU measurement queue — the post-revert stream numbers, the
# block-vote comparison, the tape-kernel unroll sweep, and the new
# fidelity configs. ONE TPU process at a time (strictly sequential).
# Logs in /tmp/r4b/.
#
#   bash tools/tpu_round4b_batch.sh [phase]
# phases: mesh tape fidelity census all (default: all)

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4b
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4b/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4b/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4b/$name.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r4b/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = mesh ] || [ "$P" = all ]; then
  # 1. re-prove the per-group revert compiles + its baseline number
  run m15_pergroup_k4 900 python -u tools/bench_mesh.py \
    --subdiv 4 --modes stream --gather-pages 4
  # 2. the round-4 candidate: block-form voting, same semantics
  CSGR_STREAM_VOTE=block run m15_block_k4 900 python -u \
    tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  CSGR_STREAM_VOTE=block run m15_block_k2 900 python -u \
    tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 2
  CSGR_STREAM_VOTE=block run m15_block_k8 900 python -u \
    tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 8
  CSGR_STREAM_VOTE=block run m61_block_k4 900 python -u \
    tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 4
  CSGR_STREAM_VOTE=block run m61_block_k8 900 python -u \
    tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 8
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  run tape_base 900 python -u tools/bench_tape.py
  CSGR_WAVE_UNROLL=2 run tape_unroll2 900 python -u tools/bench_tape.py
  CSGR_WAVE_UNROLL=4 run tape_unroll4 900 python -u tools/bench_tape.py
  run tape_many 900 python -u tools/bench_tape.py --scene many
  CSGR_WAVE_UNROLL=4 run tape_many_unroll4 900 python -u \
    tools/bench_tape.py --scene many
fi

if [ "$P" = census ] || [ "$P" = all ]; then
  # trip/iter split for the block-vote winner at 15k/k4
  CSGR_STREAM_VOTE=block CSGR_DEBUG_TRIPS=1 run m15_block_trips 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream \
    --gather-pages 4 --frames 1
  CSGR_STREAM_VOTE=block CSGR_DEBUG_ITERS=1 run m15_block_iters 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream \
    --gather-pages 4 --frames 1
fi

if [ "$P" = fidelity ] || [ "$P" = all ]; then
  # config7 re-proved earlier this round (2.12e-04); 8/9/10 still pending
  run validate_new 5400 python -u tools/validate_tpu.py \
    --only config8,config9,config10
fi

echo "done; logs in /tmp/r4b/"
