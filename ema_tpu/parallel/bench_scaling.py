"""Scaling-efficiency measurement for the sharded candidate step.

BASELINE.md's north star includes >=80% reads/s scaling efficiency from
1 to N chips/hosts.  This harness times the fused candidate step
(seed -> locate -> SW -> best) on a 1-device mesh and on the full
('data','cand') mesh, at a fixed per-device batch (weak scaling), and
reports efficiency = (throughput_N / N) / throughput_1.

Run on real hardware:   python -m ema_tpu.parallel.bench_scaling
(on the CPU test mesh the numbers are not meaningful — one physical core
serves all virtual devices — but the harness still exercises the code.)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(per_device_pairs: int = 512, read_len: int = 100,
            genome_bases: int = 500_000, repeats: int = 3,
            devices=None) -> dict:
    import jax
    import jax.numpy as jnp

    from ema_tpu.index import build_index, fmindex
    from ema_tpu.parallel import make_mesh, make_sharded_candidate_step
    from ema_tpu.parallel.mesh import factor_devices

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, genome_bases).astype(np.uint8)
    idx = build_index({"c1": genome})
    fm = fmindex.FMIndexArrays.from_index(idx)
    text = jnp.asarray(idx.text)
    static = dict(max_seeds=4, hits_per_seed=4, window_pad=12,
                  min_seed_len=19)

    def reads_for(n_rows):
        starts = rng.integers(0, idx.n - read_len, n_rows)
        r = np.stack([idx.text[s:s + read_len] for s in starts])
        return (jnp.asarray(r.astype(np.int32)),
                jnp.asarray(np.full(n_rows, read_len, np.int32)))

    def time_mesh(mesh_devices):
        nd, nc = factor_devices(len(mesh_devices))
        mesh = make_mesh(nd, nc, mesh_devices)
        step = make_sharded_candidate_step(mesh, fm, text, **static)
        reads, lens = reads_for(per_device_pairs * nd)
        out = step(reads, lens)
        _ = int(out.n_aligned)                  # compile + settle
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            out = step(reads, lens)
            _ = int(out.n_aligned)
            best = min(best, time.time() - t0)
        return reads.shape[0] / best

    t1 = time_mesh(devices[:1])
    tn = time_mesh(devices)
    eff = (tn / n) / t1 if t1 > 0 else 0.0
    return {
        "metric": "candidate_step_scaling_efficiency",
        "n_devices": n,
        "reads_per_s_1dev": round(t1, 1),
        "reads_per_s_ndev": round(tn, 1),
        "value": round(eff, 3),
        "unit": "fraction",
    }


if __name__ == "__main__":
    print(json.dumps(measure()), file=sys.stdout)
