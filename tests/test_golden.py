"""Golden SAM regression test.

Freezes the full align output (flags, pos, mapq, CIGAR, TLEN, tags, EM
gammas) on a deterministic scenario.  Any intentional behavior change
must regenerate the fixture:

    python tests/test_golden.py regen

The scenario covers: multi-contig reference, >=30-pair barcodes (EM on),
small barcodes (EM off), multimapping from a duplicated segment, reads
with Ns, and an unmapped-mate pair.
"""

import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "expected.sam")


def _world():
    from ema_tpu import config
    from ema_tpu.core.pipeline import Aligner, ReadBatch
    from ema_tpu.core.samout import write_sam_header
    from ema_tpu.index import build_index
    from tests.simulate import rand_genome, simulate_pairs, to_str

    rng = np.random.default_rng(1234)
    g1 = rand_genome(rng, 120_000)
    g2 = rand_genome(rng, 60_000)
    g2[10_000:14_000] = g1[20_000:24_000]      # duplicated segment
    contigs = {"cA": g1, "cB": g2}
    gs = to_str(np.concatenate([g1, g2]))

    ids, bc_strs, bcs, s1, q1, s2, q2, truth = simulate_pairs(
        rng, gs, n_barcodes=6, frags_per_bc=(2, 3), pairs_per_frag=(14, 22),
        frag_len=20_000, read_len=90, err=0.004)
    # a pair with an unalignable mate (all-N read 2)
    ids.append("nn0")
    bcs.append(bcs[0])
    s1.append(gs[500:590])
    q1.append("I" * 90)
    s2.append("N" * 90)
    q2.append("I" * 90)
    # an N-containing read
    ids.append("nn1")
    bcs.append(bcs[0])
    r = list(gs[1500:1590])
    r[10:14] = "NNNN"
    s1.append("".join(r))
    q1.append("I" * 90)
    s2.append(gs[1700:1790])
    q2.append("I" * 90)

    idx = build_index(contigs)
    cfg = config.RunConfig(batch_size=512, seed=7)
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    header = write_sam_header(idx.names, idx.lengths, cfg.read_group,
                              "golden", "golden")
    lines = Aligner(idx, cfg).align_batch_to_sam(batch)
    return header, lines


def _render():
    header, lines = _world()
    return header + "".join(lines)


def test_golden_sam():
    expected = open(GOLDEN).read()
    assert _render() == expected


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # match the pytest environment (conftest.py): CPU platform, x64
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(_render())
        print(f"wrote {GOLDEN}")
