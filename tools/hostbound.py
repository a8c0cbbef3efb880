"""Isolate the 1-host-core bottleneck on the TPU path (VERDICT r4 #1).

The attached-TPU bench host has ONE core, so every host stage (seeding
when hybrid, traceback, EM glue, selection, SAM emission) serializes
with dispatch; the device can only win by the host work it removes.
This experiment measures, in one process on the same dataset:

  full_wall           full pipeline wall (seed->...->SAM), best-of-N
  frontend_serial     candidate generation only (device seed/SW + host
                      traceback), chunks run serially
  frontend_overlap    same with the pipeline's in-flight chunk overlap
  stage thread-seconds (utils/metrics) for the full pass

If full_wall ~= frontend_overlap + host-group thread-seconds, the wall
is host-serialized: a production TPU VM host (>= 8 cores, SURVEY §6)
overlaps the group phase with device time, so the projected wall there
is max(frontend_overlap, host_group / n_cores) — recorded as
projected_8core_wall_s in the artifact.

    EMA_TPU_ROUND=05 timeout 900 python tools/hostbound.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GENOME = int(os.environ.get("EMA_TPU_HOSTBOUND_GENOME", 3_000_000))
N_PAIRS = int(os.environ.get("EMA_TPU_HOSTBOUND_PAIRS", 50_000))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tests.simulate import rand_genome, simulate_pairs, to_str

    import jax

    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.index import build_index
    from ema_tpu.utils.backend import ensure_backend
    from ema_tpu.utils.metrics import Metrics

    ensure_backend(probe=True)
    plat = jax.default_backend()
    if os.environ.get("EMA_TPU_BENCH_REQUIRE_TPU") \
            and plat not in ("tpu", "axon"):
        log("TPU required but unavailable")
        sys.exit(3)
    log(f"devices: {jax.devices()}")

    rng = np.random.default_rng(2026)
    genome = rand_genome(rng, GENOME)
    idx = build_index({"chr1": genome})
    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, to_str(genome), n_barcodes=max(N_PAIRS // 60, 1),
        frags_per_bc=(2, 4), pairs_per_frag=(15, 25), frag_len=30_000,
        read_len=100, err=0.003)
    n_pairs = len(ids)
    al = Aligner(idx, config.RunConfig())
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)

    # warmup (all compile shapes)
    t0 = time.time()
    al.align_batch_to_sam(batch)
    log(f"warmup: {time.time() - t0:.1f}s")

    reps = int(os.environ.get("EMA_TPU_HOSTBOUND_REPS", "3"))

    def best(fn):
        b = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            b = min(b, time.time() - t0)
        return b

    full_wall = best(lambda: al.align_batch_to_sam(batch))
    log(f"full_wall: {full_wall:.2f}s = {n_pairs/full_wall:.0f} pairs/s")

    # frontend only: candidate generation + record materialization
    B = al.cfg.batch_size

    def frontend_serial():
        for s in range(0, n_pairs, B):
            e = min(s + B, n_pairs)
            sub = ReadBatch.from_pairs(ids[s:e], bcs[s:e], s1[s:e],
                                       q1[s:e], s2[s:e], q2[s:e])
            cs = al.generate_candidates(sub)
            al.candidates_to_records(sub, cs, s)

    def frontend_overlap():
        from concurrent.futures import ThreadPoolExecutor

        def work(s):
            e = min(s + B, n_pairs)
            sub = ReadBatch.from_pairs(ids[s:e], bcs[s:e], s1[s:e],
                                       q1[s:e], s2[s:e], q2[s:e])
            cs = al.generate_candidates(sub)
            return al.candidates_to_records(sub, cs, s)

        with ThreadPoolExecutor(max_workers=al.cfg.inflight_chunks) as ex:
            list(ex.map(work, range(0, n_pairs, B)))

    fs = best(frontend_serial)
    fo = best(frontend_overlap)
    log(f"frontend serial {fs:.2f}s overlap {fo:.2f}s")

    # stage thread-seconds for one full pass
    met = Metrics()
    al.metrics = met
    t0 = time.time()
    al.align_batch_to_sam(batch)
    timed_wall = time.time() - t0
    al.metrics = None
    stages = {name: round(w, 2) for name, w in sorted(met.wall.items())}
    met.report()

    group_host_s = sum(v for k, v in stages.items()
                       if any(t in k for t in
                              ("em[", "select+emit", "sweep")))
    projected_8core = max(fo, group_host_s / 8.0)
    rnd = os.environ.get("EMA_TPU_ROUND", "05")
    payload = {
        "what": ("host-core bottleneck isolation on the TPU path: the "
                 "1-core tunnel host serializes all host stages with "
                 "device dispatch; a production TPU VM (>=8 host cores) "
                 "overlaps them"),
        "platform": plat,
        "n_pairs": n_pairs,
        "full_wall_s": round(full_wall, 2),
        "pairs_per_sec": round(n_pairs / full_wall, 1),
        "frontend_serial_wall_s": round(fs, 2),
        "frontend_overlap_wall_s": round(fo, 2),
        "stages_thread_s": stages,
        "group_host_thread_s": round(group_host_s, 2),
        "host_serialized_s": round(max(full_wall - fo, 0.0), 2),
        "projected_8core_wall_s": round(projected_8core, 2),
        "projected_8core_pairs_per_sec": round(
            n_pairs / projected_8core, 1) if projected_8core else None,
        "timed_wall_with_metrics_s": round(timed_wall, 2),
    }
    path = os.path.join(REPO, f"HOSTBOUND_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
