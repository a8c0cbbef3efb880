#!/bin/bash
# Hardware-timing queue for live TPU-tunnel windows.  The tunnel gives
# SHORT windows (observed: ~20 min alive, then wedged for hours), so
# steps run most-valuable-first, each under its own timeout, and every
# step checkpoints its artifact — a wedge mid-queue keeps everything
# already captured.  Steps that need a TPU bail fast (exit 3) when the
# backend probe lands on CPU.  Run ONE at a time (single-client tunnel).
#
# Second-window edition (the first window captured BENCH_QUEUE_r04 /
# BENCH_SW_r04 variants / both A/Bs / cold-compile config numbers):
# re-measure the headline with the devem->hostem default fix, grab the
# per-stage TPU time split, re-run configs against the now-warm
# compilation cache, and redo the fixed VPU probe.
#
#   bash tools/tpu_queue.sh 2>&1 | tee /tmp/tpu_queue.log
set -x
cd "$(dirname "$0")/.."
export EMA_TPU_ROUND=04

# 0. probe (ensure_backend-style; bail early if wedged)
timeout 250 python -c "
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices())
print('roundtrip:', np.asarray(jnp.arange(8) + 1))
" || { echo "TUNNEL WEDGED - aborting queue"; exit 1; }

# 1. the headline number with the fixed defaults (host EM on one chip,
#    >=4 timed passes)
timeout 1800 python bench.py | tee BENCH_QUEUE_r04.json

# 2. per-stage TPU wall split: the optimization map for the device path
EMA_TPU_BENCH_INNER=1 EMA_TPU_BENCH_REQUIRE_TPU=1 EMA_TPU_STAGE_TIMERS=1 \
    timeout 600 python -u bench.py 2>&1 | tee STAGE_TPU_r04.txt || true

# 3. kernel roofline artifact (vpu-probe re-runs with the unrolled body;
#    completed variants are skipped)
timeout 1200 python tools/bench_sw.py --json BENCH_SW_r04.json

# 4. config artifacts against the warm compilation cache (the first
#    window's cold-compile run buried the align time under ~60-90s of
#    XLA compiles)
timeout 1800 python tools/bench_configs.py config3 || true
timeout 1800 python tools/bench_configs.py config4 || true

# 5. chunk-size A/B on hardware (batch 4096 vs 8192)
EMA_TPU_BENCH_REQUIRE_TPU=1 timeout 1800 python tools/ab_align.py b4096 b8192 \
    | tee AB_CHUNK_r04.txt || true

touch .tpu_queue_completed
