"""The flagship linked-read behavior: the cloud EM model rescues
multi-mapped reads in exact repeats using barcode context (the reference's
raison d'être — README.md:1-5, align.c:431-543)."""

import numpy as np

from ema_tpu import config
from ema_tpu.core.pipeline import Aligner, ReadBatch
from ema_tpu.index import build_index
from tests.simulate import parse_sam_line, rand_genome, revcomp_str, to_str


def test_em_assigns_repeat_reads_to_barcode_copy():
    rng = np.random.default_rng(9)
    g = rand_genome(rng, 300_000)
    # exact 6 kb duplication: copyA at 50k, copyB at 200k
    g[200_000:206_000] = g[50_000:56_000]
    idx = build_index({"cR": g})
    gs = to_str(g)

    ids, bcs, s1, q1, s2, q2 = [], [], [], [], [], []
    k = 0
    for _ in range(25):       # unambiguous flank pairs anchor the cloud
        p = 40_000 + int(rng.integers(0, 9_500))
        q = p + int(rng.integers(150, 350))
        ids.append(f"u{k}")
        bcs.append(111)
        s1.append(gs[p:p + 100])
        q1.append("I" * 100)
        s2.append(revcomp_str(gs[q:q + 100]))
        q2.append("I" * 100)
        k += 1
    for _ in range(10):       # pairs fully inside the duplicated segment
        p = 50_100 + int(rng.integers(0, 5_300))
        q = p + int(rng.integers(150, 300))
        ids.append(f"a{k}")
        bcs.append(111)
        s1.append(gs[p:p + 100])
        q1.append("I" * 100)
        s2.append(revcomp_str(gs[q:q + 100]))
        q2.append("I" * 100)
        k += 1

    al = Aligner(idx, config.RunConfig(batch_size=64))
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    right = wrong = 0
    for ln in al.align_batch_to_sam(batch):
        r = parse_sam_line(ln)
        if r["flag"] & 4 or not r["qname"].startswith("a"):
            continue
        if 45_000 <= r["pos"] <= 60_000:
            right += 1
            assert float(r["tags"]["XG"]) > 0.99
        else:
            wrong += 1
    assert (right, wrong) == (20, 0)
