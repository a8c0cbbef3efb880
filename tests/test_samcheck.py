"""SAM spec validation of full pipeline output (in-house samtools
quickcheck replacement) — and the checker must itself catch breakage."""

import numpy as np

from ema_tpu import config
from ema_tpu.core.pipeline import Aligner, ReadBatch
from ema_tpu.core.samout import write_sam_header
from ema_tpu.index import build_index
from ema_tpu.utils.samcheck import check_sam
from tests.simulate import rand_genome, simulate_pairs, to_str


def _pipeline_sam():
    rng = np.random.default_rng(3)
    genome = rand_genome(rng, 120_000)
    idx = build_index({"c1": genome})
    ids, bc_strs, bcs, s1, q1, s2, q2, _ = simulate_pairs(
        rng, to_str(genome), n_barcodes=6, frags_per_bc=(2, 3),
        pairs_per_frag=(8, 14), frag_len=15_000, read_len=90, err=0.004)
    # add an unmapped-mate pair to cover the '*' paths
    ids.append("un0")
    bcs.append(bcs[0])
    s1.append(to_str(genome[500:590]))
    q1.append("I" * 90)
    s2.append("N" * 90)
    q2.append("I" * 90)
    al = Aligner(idx, config.RunConfig(batch_size=128))
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    header = write_sam_header(idx.names, idx.lengths, None, "t", "t")
    return header.splitlines(keepends=True) + al.align_batch_to_sam(batch)


def test_pipeline_output_is_spec_valid():
    lines = _pipeline_sam()
    errors = check_sam(lines)
    assert errors == [], errors[:10]


def test_checker_catches_violations():
    lines = _pipeline_sam()
    body_at = next(i for i, ln in enumerate(lines)
                   if not ln.startswith("@"))
    # corrupt a CIGAR so it no longer consumes SEQ
    f = lines[body_at].split("\t")
    if f[5] != "*":
        f[5] = "1M"
        bad = lines[:body_at] + ["\t".join(f)] + lines[body_at + 1:]
        assert any("CIGAR consumes" in e for e in check_sam(bad))
    # corrupt a POS beyond the contig
    f = lines[body_at].split("\t")
    f[3] = "99999999"
    bad = lines[:body_at] + ["\t".join(f)] + lines[body_at + 1:]
    assert any("outside" in e or "past" in e for e in check_sam(bad))
