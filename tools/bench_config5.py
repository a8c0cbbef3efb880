"""BASELINE config 5: haplotag align across 2 hosts, merged sorted SAM.

Drives the multi-host story end-to-end on real jax.distributed
processes: haplotag special buckets -> 2 coordinator-wired `align -x
--sort` processes (buckets hashed by process topology) -> per-host
sorted shards -> ``merge_sorted_shards`` k-way merge.  Asserts the
merged output is record-equivalent to the single-process run (samdiff,
MI as bijection) BEFORE reporting timings, and writes
BENCH_CONFIG5_r03.json.

On this 1-core bench host the two processes share one core, so the
distributed wall time exercises the code path rather than measuring
scaling — the JSON says so.  On real multi-host TPU pods the same flags
become the scaling measurement.

    EMA_TPU_PLATFORM=cpu PYTHONPATH=. python tools/bench_config5.py
"""

from __future__ import annotations

import glob
import json
import os
import socket
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

GENOME = 1_500_000
N_BARCODES = 300          # ~18k pairs
N_BUCKETS = 8

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["EMA_TPU_PLATFORM"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, procid, ref, outdir = sys.argv[1:5]
    buckets = sys.argv[5:]
    from ema_tpu import cli
    rc = cli.main(["align", "-r", ref, "-x", "-p", "haplotag", "--sort",
                   "--coordinator", coord, "--nprocs", "2",
                   "--procid", procid,
                   "-o", os.path.join(outdir, "out.sam"), *buckets])
    raise SystemExit(rc)
""")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    os.environ.setdefault("EMA_TPU_PLATFORM", "cpu")
    from ema_tpu import cli
    from ema_tpu.parallel.distrib import merge_sorted_shards
    from ema_tpu.utils import samdiff
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(20260817)
    gs = to_str(rand_genome(rng, GENOME))
    tmp = tempfile.mkdtemp(prefix="cfg5_")
    ref = os.path.join(tmp, "ref.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(gs), 70):
            f.write(gs[i:i + 70] + "\n")

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=N_BARCODES, frags_per_bc=(2, 3),
        pairs_per_frag=(15, 25), frag_len=25_000, read_len=100, err=0.003)
    n_pairs = len(ids)
    uniq = sorted(set(bc_strs))
    hts = {}
    for b in uniq:
        a, c, bb, d = rng.integers(1, 97, 4)
        hts[b] = f"A{a:02d}C{c:02d}B{bb:02d}D{d:02d}"
    buckets = []
    handles = []
    for k in range(N_BUCKETS):
        p = os.path.join(tmp, f"hap-bin-{k:03d}")
        buckets.append(p)
        handles.append(open(p, "w"))
    for i in range(n_pairs):
        k = uniq.index(bc_strs[i]) % N_BUCKETS
        handles[k].write(f"{hts[bc_strs[i]]} {ids[i]} {s1[i]} {q1[i]} "
                         f"{s2[i]} {q2[i]}\n")
    for h in handles:
        h.close()
    log(f"world: {n_pairs} haplotag pairs, {len(uniq)} barcodes, "
        f"{N_BUCKETS} buckets")

    # index once so both timed runs load the same cached .emaidx
    assert cli.main(["index", "-r", ref]) == 0

    single = os.path.join(tmp, "single.sam")
    t0 = time.time()
    assert cli.main(["align", "-r", ref, "-x", "-p", "haplotag", "--sort",
                     "-o", single, *buckets]) == 0
    t_single = time.time() - t0
    log(f"single-process sorted align: {t_single:.1f}s")

    worker = os.path.join(tmp, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__)))
               + os.pathsep + os.environ.get("PYTHONPATH", ""))
    dirs = []
    procs = []
    t0 = time.time()
    for i in range(2):
        d = os.path.join(tmp, f"host{i}")
        os.makedirs(d)
        dirs.append(d)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, str(i), ref, d, *buckets],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, err.decode()[-3000:]
    shards = sorted(sum((glob.glob(os.path.join(d, "out.shard*.sam"))
                         for d in dirs), []))
    merged = os.path.join(tmp, "merged.sam")
    with open(single) as f:
        header = "".join(ln for ln in f if ln.startswith("@"))
    merge_sorted_shards(shards, merged, ["chr1"], header=header)
    t_dist = time.time() - t0
    log(f"2-process distributed align + merge: {t_dist:.1f}s "
        f"({len(shards)} shards)")

    st = samdiff.diff_sams(single, merged)
    log(st.summary())
    assert st.only_a == 0 and st.only_b == 0, "record sets differ"
    assert st.concordance() == 1.0, "merged != single-process output"

    out = {
        "metric": "config5_haplotag_multihost_align",
        "what": "BASELINE config 5: haplotag buckets across 2 real "
                "jax.distributed processes (--coordinator), per-host "
                "sorted shards, merge_sorted_shards k-way merge; merged "
                "output asserted record-equivalent to the single-process "
                "run before timing",
        "n_pairs": n_pairs,
        "n_buckets": N_BUCKETS,
        "single_process_s": round(t_single, 2),
        "two_process_s": round(t_dist, 2),
        "single_pairs_per_sec": round(n_pairs / t_single, 1),
        "platform": "cpu",
        "note": "both processes share ONE physical core on this bench "
                "host: the distributed time validates the multi-host "
                "path (byte-level equivalence), not scaling; on a real "
                "pod these flags produce the >=80% scaling measurement",
        "round": int(os.environ.get("EMA_TPU_ROUND", "4")),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"BENCH_CONFIG5_r{os.environ.get('EMA_TPU_ROUND', '04')}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
