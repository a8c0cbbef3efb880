"""Candidate-set recall gate vs brute-force ground truth (CHAIN_r05).

The reference's chain filtering (BWA mem_chain_flt via mem_align1_core,
reference src/bwabridge.c:236-237) decides which loci reach extension;
ours must not lose loci the score-based keep-window would retain.  The
gate enumerates every family-translated locus of every in-repeat read
on a diverged-repeat world and requires the pipeline's candidate set to
recall >= 99.9% of near-co-optimal (<= 3 edit) eligible loci.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_near_cooptimal_recall_gate():
    import chain_recall as cr

    rng = np.random.default_rng(5)
    genome, fams, sim = cr.build_world(rng, 2_000_000, 6_000)
    res = cr.measure_recall(genome, fams, sim)   # default cfg = smem
    assert "error" not in res, res
    d3 = res["recall_by_edit_delta"]["d_le3"]
    assert d3["n"] >= 200, res["recall_by_edit_delta"]
    assert d3["recall_pct"] >= 99.9, res
    d0 = res["recall_by_edit_delta"]["d0"]
    assert d0["recall_pct"] >= 99.9, res
