#!/bin/bash
# Window-3 queue: re-measure the headline with the hybrid-seeding
# default (host seed+locate at cache-resident occ sizes — measured
# 17,866 vs 15,988 pairs/s in AB_SEED_r04.txt) and refresh the config
# artifacts on a CLEAN window (the window-2 numbers contended with
# builder benchmarks on the single host core).
set -x
cd "$(dirname "$0")/.."
export EMA_TPU_ROUND=04

timeout 250 python -c "
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices())
print('roundtrip:', np.asarray(jnp.arange(8) + 1))
" || { echo "TUNNEL WEDGED - aborting queue"; exit 1; }

# 1. headline with hybrid seeding
timeout 1800 python bench.py | tee BENCH_QUEUE_r04.json

# 2. stage split under the new default
EMA_TPU_BENCH_INNER=1 EMA_TPU_BENCH_REQUIRE_TPU=1 EMA_TPU_STAGE_TIMERS=1 \
    timeout 600 python -u bench.py 2>&1 | tee STAGE_TPU_r04.txt || true

# 3. clean config artifacts (warm compile cache from windows 1-2)
timeout 1800 python tools/bench_configs.py config3 || true
timeout 1800 python tools/bench_configs.py config4 || true

touch .tpu_queue_completed
