#!/bin/bash
# Round-5 hardware queue.  Each step writes its own artifact and is
# SKIPPED if that artifact already exists, so a tunnel wedge mid-queue
# keeps everything already measured and the next live window resumes
# where this one died.  Most-valuable-first ordering.
set -x
cd "$(dirname "$0")/.."
export EMA_TPU_ROUND=05

timeout 250 python -c "
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices())
print('roundtrip:', np.asarray(jnp.arange(8) + 1))
" || { echo "TUNNEL WEDGED - aborting queue"; exit 1; }

step() {  # step <artifact> <timeout_s> <cmd...>
  local art="$1" to="$2"; shift 2
  if [ -s "$art" ]; then echo "SKIP $art (captured)"; return 0; fi
  timeout "$to" "$@" > "$art.tmp" 2>>/tmp/tpu_queue_err.log \
    && mv "$art.tmp" "$art" || { rm -f "$art.tmp"; return 1; }
}

# 1. headline (hybrid defaults + tier64).  A CPU-only capture (written
#    when every TPU attempt hit a wedged tunnel) must NOT satisfy the
#    skip gate — move it aside so live windows re-attempt.
if [ -s BENCH_QUEUE_r05.json ] && grep -q '"tpu_failed": true' BENCH_QUEUE_r05.json; then
  mv BENCH_QUEUE_r05.json BENCH_QUEUE_r05_cpuonly.json
fi
step BENCH_QUEUE_r05.json 1800 python bench.py

# 2. SW kernel roofline incl. the pair-packed tier.  bench_sw resumes at
#    per-step granularity (BENCH_SW_r05.json.steps/); gate on the TPU
#    steps' own markers, not the merged artifact, so a wedged window's
#    partial (CPU-only) artifact doesn't block the TPU capture.
if [ ! -s BENCH_SW_r05.json.steps/banded-pallas.json ] \
   || [ ! -s BENCH_SW_r05.json.steps/banded-packed.json ]; then
  timeout 2400 python tools/bench_sw.py --json BENCH_SW_r05.json || true
fi

# 3. tier64 on/off: SAM equality on hardware + same-window timing
EMA_TPU_AB_CHECK_EQUAL=1 EMA_TPU_BENCH_REQUIRE_TPU=1 \
  step AB_TIER64_r05.txt 1500 python -u tools/ab_align.py tier64 notier

# 4. seeding placement under overlap: host C++ vs fused device seeder,
#    and the device seeder with deeper in-flight pipelining
EMA_TPU_BENCH_REQUIRE_TPU=1 \
  step AB_SEED_r05.txt 2100 python -u tools/ab_align.py \
    seednat seeddev seeddev+t6
EMA_TPU_BENCH_REQUIRE_TPU=1 \
  step AB_SEEDB_r05.txt 1800 python -u tools/ab_align.py \
    seeddev+b8192 seeddev+t6+b8192

# 5. stage split under the resolved defaults
EMA_TPU_BENCH_INNER=1 EMA_TPU_BENCH_REQUIRE_TPU=1 EMA_TPU_STAGE_TIMERS=1 \
  step STAGE_TPU_r05.txt 900 bash -c "python -u bench.py 2>&1"

# 6. host-core bottleneck isolation (VERDICT r4 #1 fallback evidence)
EMA_TPU_BENCH_REQUIRE_TPU=1 \
  step HOSTBOUND_QUEUE_r05.json 1500 python -u tools/hostbound.py

# 7. full-CLI configs (index built once + warm compile cache).  The
#    verdict wants TPU numbers: require the device (exit 3 on a wedged
#    tunnel instead of burning 40 min on a CPU run that would then
#    satisfy the skip gate forever).
for c in 3 4; do
  f=BENCH_CONFIG${c}_r05.json
  if [ -s "$f" ] && grep -q '"platform": "cpu"' "$f"; then
    mv "$f" "${f%.json}_cpuonly.json"
  fi
  if [ ! -s "$f" ]; then
    EMA_TPU_BENCH_REQUIRE_TPU=1 \
      timeout 2400 python tools/bench_configs.py config$c || true
  fi
done

# done only when every artifact exists
all=1
for f in BENCH_QUEUE_r05.json BENCH_SW_r05.json AB_TIER64_r05.txt \
         AB_SEED_r05.txt AB_SEEDB_r05.txt STAGE_TPU_r05.txt \
         HOSTBOUND_QUEUE_r05.json BENCH_CONFIG3_r05.json \
         BENCH_CONFIG4_r05.json; do
  [ -s "$f" ] || all=0
done
[ "$all" = 1 ] && touch .tpu_queue_completed
exit 0
