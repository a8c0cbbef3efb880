"""Reference-scale candidate depth in repeats (VERDICT round-1 item 1).

The reference keeps up to max_occ = 3000 hits per seed
(/root/reference/src/align.c:185) and up to 5000 candidates per entry
(include/samdict.h:9); deep repeat families must keep enough candidates
for the cloud EM to arbitrate.  These tests pin that the hit caps, the
score-window traceback filter, and frac_rep behave at depth.
"""

import dataclasses

import numpy as np

from ema_tpu import config
from ema_tpu.core.pipeline import Aligner, ReadBatch
from ema_tpu.index import build_index
from tests.simulate import parse_sam_line, rand_genome, revcomp_str, to_str

N_COPIES = 1000
UNIT = 150


def _tandem_world(rng):
    """50 kb random + 1000 adjacent exact copies of a 150 bp unit + 50 kb."""
    unit = rand_genome(rng, UNIT)
    g = np.concatenate([rand_genome(rng, 50_000),
                        np.tile(unit, N_COPIES),
                        rand_genome(rng, 50_000)])
    return g, to_str(g)


def _repeat_pair(gs):
    """An error-free pair from inside one copy (matches all copies)."""
    base = 50_000 + 500 * UNIT
    r1 = gs[base + 10:base + 110]
    r2 = revcomp_str(gs[base + 160 - UNIT:base + 260 - UNIT])
    # r2 drawn from the PREVIOUS copy so the pair stays inside the array
    return r1, r2


def test_deep_repeat_candidate_depth():
    rng = np.random.default_rng(33)
    g, gs = _tandem_world(rng)
    idx = build_index({"cT": g})
    al = Aligner(idx, config.RunConfig(batch_size=8))
    r1, r2 = _repeat_pair(gs)
    batch = ReadBatch.from_pairs(["rep0"], [7], [r1], ["I" * 100],
                                 [r2], ["I" * 100])
    cs = al.generate_candidates(batch)
    pos0 = np.unique(cs.gpos[cs.owner == 0])
    # reference-constant behavior: every copy (1000 << max_occ 3000)
    # survives seeding, chaining, SW, and the edit-distance window
    assert pos0.shape[0] >= 0.9 * N_COPIES, pos0.shape
    # all copies are exact: ties must not be pruned by any rank cap
    assert np.unique(cs.gpos[cs.owner == 1]).shape[0] >= 0.9 * N_COPIES


def test_frac_rep_flags_repeat_reads_and_damps_mapq():
    rng = np.random.default_rng(34)
    g, gs = _tandem_world(rng)
    idx = build_index({"cT": g})
    # max_occ below the family depth: the seed interval (width ~1000)
    # counts as repetitive, so frac_rep ~ 1 for the repeat read
    params = dataclasses.replace(config.DEFAULT_ALIGNER_PARAMS,
                                 max_occ=100, max_hits_per_seed=100)
    al = Aligner(idx, config.RunConfig(
        batch_size=8, aligner=params))
    r1, r2 = _repeat_pair(gs)
    uniq1 = gs[10_000:10_100]
    uniq2 = revcomp_str(gs[10_250:10_350])
    batch = ReadBatch.from_pairs(
        ["rep0", "uni0"], [7, 7], [r1, uniq1], ["I" * 100] * 2,
        [r2, uniq2], ["I" * 100] * 2)
    cs = al.generate_candidates(batch)
    rep_fr = cs.frac_rep[(cs.owner // 2) == 0]
    uni_fr = cs.frac_rep[(cs.owner // 2) == 1]
    assert rep_fr.size and float(rep_fr.min()) > 0.5
    assert uni_fr.size and float(uni_fr.max()) == 0.0
    recs, _, _ = al.candidates_to_records(batch, cs)
    # mapq formula parity (align.c:958-984): mapq *= (1 - frac_rep)
    rep_mapq = recs["mapq"][(recs["pair"] == 0)]
    uni_mapq = recs["mapq"][(recs["pair"] == 1)]
    assert int(rep_mapq.max()) == 0
    assert int(uni_mapq.max()) >= 50


def test_spaced_repeat_em_rescue():
    """EM assigns a deep-multimapped read to its barcode's copy, at a
    depth (80 copies) that the round-1 caps (64) would have truncated."""
    rng = np.random.default_rng(35)
    n_copies, spacing, unit_len = 80, 55_000, 600
    g = rand_genome(rng, n_copies * spacing + 120_000)
    unit = rand_genome(rng, unit_len)
    starts = [60_000 + j * spacing for j in range(n_copies)]
    for s in starts:
        g[s:s + unit_len] = unit
    idx = build_index({"cS": g})
    gs = to_str(g)

    target = starts[37]
    ids, bcs, s1, q1, s2, q2 = [], [], [], [], [], []
    # unique-flank anchors: close enough to copy 37 to share its cloud,
    # and > dist_thresh (50k) away from copies 36/38 so the cloud sweep
    # (gap-chaining) does not absorb the neighbors too
    for k in range(30):
        p = target - 2_000 + int(rng.integers(0, 1_400))
        q = p + int(rng.integers(150, 350))
        ids.append(f"u{k}")
        bcs.append(42)
        s1.append(gs[p:p + 100])
        q1.append("I" * 100)
        s2.append(revcomp_str(gs[q:q + 100]))
        q2.append("I" * 100)
    ids.append("rep")
    bcs.append(42)
    s1.append(gs[target + 50:target + 150])
    q1.append("I" * 100)
    s2.append(revcomp_str(gs[target + 400:target + 500]))
    q2.append("I" * 100)

    al = Aligner(idx, config.RunConfig(batch_size=64))
    batch = ReadBatch.from_pairs(ids, bcs, s1, q1, s2, q2)
    hits = 0
    for ln in al.align_batch_to_sam(batch):
        r = parse_sam_line(ln)
        if r["qname"] != "rep" or r["flag"] & 4:
            continue
        want = (target + 51) if (r["flag"] & 64) else (target + 401)
        assert abs(r["pos"] - want) <= 5, (r["pos"], want)
        assert float(r["tags"]["XG"]) > 0.9
        hits += 1
    assert hits == 2


def test_periodic_text_window_bounded():
    """Chains through periodic text drift arbitrarily far in diagonal
    (adjacent seeds each within band_width); the window must stay
    anchored to the longest seed +- band_width, not span the whole
    tandem array."""
    from ema_tpu.ops import chaining
    rng = np.random.default_rng(40)
    # synthetic hits: one read, seeds stepping 40bp in diagonal across 12kb
    n_hits = 300
    qb = np.zeros(n_hits, np.int64)
    slen = np.full(n_hits, 19, np.int64)
    slen[150] = 30                        # the longest seed = anchor
    pos = (np.arange(n_hits) * 40).astype(np.int64)
    owner = np.zeros(n_hits, np.int64)
    cands = chaining.chain_hits(
        owner, qb, slen, pos, 1, np.array([100], np.int64), 10**6,
        band_width=100, pad=24)
    assert cands.owner.shape[0] >= 1
    assert int(cands.win_len.max()) <= 2 * 100 + 100 + 2 * 24
    # anchor's position inside the window
    a_lo = int(cands.win_lo[0])
    assert a_lo <= 150 * 40 <= a_lo + int(cands.win_len[0])
