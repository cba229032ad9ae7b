#!/bin/bash
# Round-4h recovery batch — run when the axon tunnel is healthy again.
# (It wedged ~00:35 08-19 after a demo6 FAILED_PRECONDITION; see
# CLAUDE.md outage protocol.) Strictly sequential; logs in /tmp/r4h/.
#
#   bash tools/tpu_round4h_batch.sh [phase]   phases: fidelity rt all

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4h
P="${1:-all}"

if ! timeout 150 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r4h/probe.log 2>&1; then
  echo "!! axon tunnel unreachable — aborting"; exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r4h/probe.log)"

run() { local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r4h/$name.log" 2>&1
  tail -2 "/tmp/r4h/$name.log"; return 0
}

if [ "$P" = fidelity ] || [ "$P" = all ]; then
  # configs 2-5 were last hardware-proven in round 2b — BEFORE the
  # disjoint-cluster decomposition changed config5's production path
  # and the round-3 device caching landed. Re-prove the full protocol
  # on the current defaults (config1 deterministic golden included;
  # 6-10 were proven this round, skip).
  run validate_1to5 2400 python -u tools/validate_tpu.py \
    --only config1,config2,config3,config4,config5
fi

if [ "$P" = rt ] || [ "$P" = all ]; then
  # realtime refresh on the unroll-16 default (round-3 numbers: 36.8
  # fps rtiow, 30.8 night, 43.8 wololo)
  run rt_rtiow 700 python -u demos/demo6_realtime.py \
    --scene rtiow --spp 2 --seconds 6
  run rt_night 700 python -u demos/demo6_realtime.py \
    --scene night --spp 2 --bounces 6 --seconds 6
  run rt_wololo 700 python -u demos/demo6_realtime.py --seconds 6
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  # 1080p/16spp config5 refresh: clusters (auto) + adaptive unroll
  # composed (round-3 measured 501.7 pre-unroll at this size)
  run tape_1080 900 python -u tools/bench_tape.py --width 1920 --height 1080
fi

echo "done; logs in /tmp/r4h/"
