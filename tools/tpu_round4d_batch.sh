#!/bin/bash
# Round-4d TPU queue: finer stream rungs (trend at ns<=32 was monotonic
# toward finer), tape-kernel adaptive-unroll default check, then the
# stream/HBM fidelity configs. ONE TPU process at a time. Logs /tmp/r4d/.

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4d
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4d/probe.log 2>&1; then
  echo "!! axon tunnel unreachable (probe timed out) — aborting batch"
  exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4d/probe.log)"

run() { # name timeout cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4d/$name.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r4d/$name.log"
  [ $rc -ne 0 ] && echo "!! $name exit=$rc"
  return 0
}

if [ "$P" = rung ] || [ "$P" = all ]; then
  for ns in 40 48; do
    CSGR_STREAM_NSIDE=$ns run "m15_ns$ns" 900 python -u \
      tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  done
  CSGR_STREAM_NSIDE=48 run m61_ns48 900 python -u \
    tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 4
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  # adaptive default (no env knob): expect ~386 on config5
  run tape_default 900 python -u tools/bench_tape.py
fi

if [ "$P" = fidelity ] || [ "$P" = all ]; then
  run validate_new 5400 python -u tools/validate_tpu.py \
    --only config8,config9,config10
fi

echo "done; logs in /tmp/r4d/"
