#!/bin/bash
# Round-5c: (a) accumulated per-page serve dots (CSGR_STREAM_ACC=1 —
# kills the k-slab lane concat + one-hot concat; baselines 15k ns40
# pw64 k4 = 14.4, 61k = 6.7); (b) the tape kernel at the HEADLINE
# protocol (1080p/64spp — VERDICT item 6; the 654.2 number is 16-spp)
# with an unroll mini-ladder at that operating point.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5c
P="${1:-all}"

if ! timeout 90 python -u -c \
    "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.arange(8.))))" \
    > /tmp/r5c/probe.log 2>&1; then
  echo "!! axon tunnel unreachable — aborting"; exit 3
fi
echo "tunnel alive: $(tail -1 /tmp/r5c/probe.log)"

run() { local name="$1" to="$2"; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" > "/tmp/r5c/$name.log" 2>&1
  tail -2 "/tmp/r5c/$name.log"; return 0
}

if [ "$P" = acc ] || [ "$P" = all ]; then
  CSGR_STREAM_ACC=1 CSGR_STREAM_NSIDE=40 run s15_acc_k4 900 \
    python -u tools/bench_mesh.py --subdiv 4 --modes stream --gather-pages 4
  CSGR_STREAM_ACC=1 run s61_acc_k4 900 \
    python -u tools/bench_mesh.py --subdiv 5 --modes stream --gather-pages 4
fi

if [ "$P" = tape ] || [ "$P" = all ]; then
  run tape64_default 900 python -u tools/bench_tape.py \
    --width 1920 --height 1080 --spp 64
  CSGR_WAVE_UNROLL=4 run tape64_u4 900 python -u tools/bench_tape.py \
    --width 1920 --height 1080 --spp 64
  CSGR_WAVE_UNROLL=8 run tape64_u8 900 python -u tools/bench_tape.py \
    --width 1920 --height 1080 --spp 64
fi

echo "done; logs in /tmp/r5c/"
