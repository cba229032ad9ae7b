#!/bin/bash
# Round-4c TPU queue: stream cell-rung sweep (column-efficiency lever),
# tape_many at unroll=2 (unroll=4 OOMs scoped VMEM on 99-leaf scenes).
# ONE TPU process at a time. Logs in /tmp/r4c/.

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4c
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4c/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4c/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4c/$name.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r4c/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = rung ] || [ "$P" = all ]; then
  for ns in 12 16 20 24; do
    CSGR_STREAM_NSIDE=$ns run "m15_ns$ns" 900 python -u \
      tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  done
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  CSGR_WAVE_UNROLL=2 run tape_many_unroll2 900 python -u \
    tools/bench_tape.py --scene many
fi

echo "done; logs in /tmp/r4c/"
