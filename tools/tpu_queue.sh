#!/bin/bash
# Hardware-timing queue for live TPU-tunnel windows.  The tunnel gives
# SHORT windows (observed: ~20 min alive, then wedged for hours), so
# steps run most-valuable-first, each under its own timeout, and every
# step checkpoints its artifact — a wedge mid-queue keeps everything
# already captured.  Steps that need a TPU bail fast (exit 3) when the
# backend probe lands on CPU.  Run ONE at a time (single-client tunnel).
#
#   bash tools/tpu_queue.sh 2>&1 | tee /tmp/tpu_queue.log
set -x
cd "$(dirname "$0")/.."

# 0. probe (ensure_backend-style; bail early if wedged)
timeout 250 python -c "
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices())
print('roundtrip:', np.asarray(jnp.arange(8) + 1))
" || { echo "TUNNEL WEDGED - aborting queue"; exit 1; }

# 1. the headline number (pairs/s; supervisor handles mid-run wedges and
#    records tpu_attempted/tpu_failed) — FIRST: this is the product claim
timeout 1800 python bench.py | tee BENCH_QUEUE_r04.json

# 2. kernel roofline artifact: per-step subprocesses, skips steps already
#    captured in earlier windows (banded-pallas numbers etc.)
timeout 1800 python tools/bench_sw.py --json BENCH_SW_r04.json

# 3. pipeline-level A/Bs through the oscillating tunnel (same-window
#    alternating passes); EMA_TPU_BENCH_REQUIRE_TPU makes them exit fast
#    when the tunnel wedged between steps
EMA_TPU_BENCH_REQUIRE_TPU=1 timeout 2400 python tools/ab_align.py pallas banded \
    | tee AB_PALLAS_BANDED_r04.txt || true
EMA_TPU_BENCH_REQUIRE_TPU=1 timeout 2400 python tools/ab_align.py devem hostem \
    | tee AB_DEVEM_HOSTEM_r04.txt || true

# 4. refresh BASELINE config artifacts (platform-tagged; only worth the
#    window when the tunnel is still alive, hence last)
timeout 2400 python tools/bench_configs.py config3 || true
timeout 2400 python tools/bench_configs.py config4 || true

touch .tpu_queue_completed
