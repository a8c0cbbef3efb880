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


def partition_check(n_devices: int | None = None) -> dict:
    """Per-device work-partition check (meaningful on ANY host).

    Timing on a virtual CPU mesh measures core contention, not scaling
    (one physical core serves all virtual devices — r3 VERDICT weak #6),
    so on such hosts this check replaces the efficiency number: it
    asserts the sharded step actually partitions the batch 1/N per
    device (addressable-shard shapes) and that the compiled program
    contains the expected cross-device collectives.
    """
    from ema_tpu.utils.backend import ensure_backend
    ensure_backend()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ema_tpu.index import build_index, fmindex
    from ema_tpu.parallel import make_mesh, make_sharded_candidate_step
    from ema_tpu.parallel.mesh import DATA_AXIS, factor_devices

    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    nd, nc = factor_devices(n)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 60_000).astype(np.uint8)
    idx = build_index({"c1": genome})
    fm = fmindex.FMIndexArrays.from_index(idx)
    text = jnp.asarray(idx.text)
    mesh = make_mesh(nd, nc, devices)
    static = dict(max_seeds=4, hits_per_seed=4, window_pad=12,
                  min_seed_len=19)
    step = make_sharded_candidate_step(mesh, fm, text, **static)

    B, L = 4 * nd, 80
    starts = rng.integers(0, idx.n - L, B)
    r = np.stack([idx.text[s:s + L] for s in starts]).astype(np.int32)
    reads = jax.device_put(
        jnp.asarray(r), NamedSharding(mesh, P(DATA_AXIS)))
    lens = jax.device_put(
        jnp.asarray(np.full(B, L, np.int32)),
        NamedSharding(mesh, P(DATA_AXIS)))

    # 1/N rows per device on the data axis
    shard_rows = sorted(s.data.shape[0] for s in reads.addressable_shards)
    rows_ok = (len(reads.addressable_shards) == n
               and all(sr == B // nd for sr in shard_rows))

    # compiled collectives: the candidate step reduces best scores over
    # the 'cand' axis and gathers stats over 'data'
    lowered = jax.jit(step).lower(reads, lens)
    hlo = lowered.compile().as_text()
    colls = [op for op in ("all-reduce", "all-gather", "reduce-scatter",
                           "collective-permute") if op in hlo]

    out = step(reads, lens)
    n_aligned = int(out.n_aligned)
    return {
        "metric": "candidate_step_work_partition",
        "n_devices": n,
        "mesh": {"data": nd, "cand": nc},
        "rows_per_device": B // nd,
        "partition_ok": bool(rows_ok),
        "collectives_in_hlo": colls,
        "aligned": n_aligned,
        "batch": B,
        "ok": bool(rows_ok and colls and n_aligned >= B // 2),
        "note": ("replaces the virtual-CPU-mesh timing number, which "
                 "measures 1-core contention, not scaling; the timing "
                 "mode (--timing) remains for real multi-chip hosts"),
    }


if __name__ == "__main__":
    if "--timing" in sys.argv:
        print(json.dumps(measure()), file=sys.stdout)
    else:
        print(json.dumps(partition_check()), file=sys.stdout)
