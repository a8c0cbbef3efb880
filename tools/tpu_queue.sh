#!/bin/bash
# Hardware-timing queue for the first session with a live TPU tunnel.
# Run ONE at a time (the tunnel admits a single client); each step under
# timeout so a mid-run wedge cannot hang the session.  Results land in
# stdout logs + the usual artifacts; update NOTES.md "Known gaps" after.
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

# 1. kernel-level: packed-scan banded Pallas vs XLA scan (w/ the new
#    per-candidate corridor input), TILE_B sweep + roofline artifact
#    (each step checkpoints its own artifact so a later wedge cannot
#    lose the session's earlier results)
timeout 1800 python tools/bench_sw.py --json BENCH_SW_r04.json

# 2. pipeline-level A/Bs through the oscillating tunnel (same-window
#    alternating passes): pallas-vs-banded, devem-vs-hostem
timeout 2400 python tools/ab_align.py pallas banded \
    | tee AB_PALLAS_BANDED_r04.txt || true
timeout 2400 python tools/ab_align.py devem hostem \
    | tee AB_DEVEM_HOSTEM_r04.txt || true

# 3. the headline number (supervisor handles mid-run wedges)
timeout 1800 python bench.py | tee BENCH_QUEUE_r04.json

# 4. refresh BASELINE config artifacts (backend auto-resolves to TPU
#    when the tunnel is live; artifacts carry a platform tag)
timeout 2400 python tools/bench_configs.py config3 || true
timeout 2400 python tools/bench_configs.py config4 || true
