"""Device SW scoring kernel vs the native C++ aligner (same semantics)."""

import numpy as np
import jax.numpy as jnp

from ema_tpu import native
from ema_tpu.ops.sw import sw_score_batch


def random_cases(rng, B, m_max=60, n_max=120):
    reads = np.zeros((B, m_max), np.uint8)
    refs = np.zeros((B, n_max), np.uint8)
    mlen = np.zeros(B, np.int32)
    nlen = np.zeros(B, np.int32)
    for b in range(B):
        m = int(rng.integers(10, m_max + 1))
        n = int(rng.integers(20, n_max + 1))
        ref = rng.integers(0, 4, n).astype(np.uint8)
        kind = b % 4
        if kind == 0:           # planted with substitutions
            start = int(rng.integers(0, max(1, n - m)))
            seg = ref[start:start + m].copy()
            m = len(seg)
            for p in rng.integers(0, m, size=rng.integers(0, 4)):
                seg[p] = (seg[p] + 1) % 4
            read = seg
        elif kind == 1:         # planted with an indel
            start = int(rng.integers(0, max(1, n - m)))
            seg = list(ref[start:start + m])
            if len(seg) > 6:
                p = int(rng.integers(2, len(seg) - 2))
                if rng.random() < 0.5:
                    seg.insert(p, int(rng.integers(0, 4)))
                else:
                    del seg[p]
            read = np.array(seg[:m_max], np.uint8)
            m = len(read)
        elif kind == 2:         # random (likely clips everywhere)
            read = rng.integers(0, 4, m).astype(np.uint8)
        else:                   # with N bases
            start = int(rng.integers(0, max(1, n - m)))
            read = ref[start:start + m].copy()
            m = len(read)
            for p in rng.integers(0, m, size=2):
                read[p] = 4
        reads[b, :m] = read
        refs[b, :n] = ref
        mlen[b] = m
        nlen[b] = n
    return reads, mlen, refs, nlen


class TestSWKernelVsNative:
    def test_scores_match(self):
        rng = np.random.default_rng(5)
        reads, mlen, refs, nlen = random_cases(rng, 64)
        nat = native.align_batch(reads, mlen, refs, nlen)
        dev = sw_score_batch(jnp.asarray(reads), jnp.asarray(mlen),
                             jnp.asarray(refs), jnp.asarray(nlen))
        dscore = np.asarray(dev["score"])
        for b in range(64):
            if nat["score"][b] <= 0:
                assert dscore[b] <= 0, b
            else:
                assert dscore[b] == nat["score"][b], (
                    b, dscore[b], nat["score"][b])

    def test_spans_match_for_unique_optima(self):
        rng = np.random.default_rng(6)
        reads, mlen, refs, nlen = random_cases(rng, 64)
        nat = native.align_batch(reads, mlen, refs, nlen)
        dev = sw_score_batch(jnp.asarray(reads), jnp.asarray(mlen),
                             jnp.asarray(refs), jnp.asarray(nlen))
        agree = 0
        total = 0
        for b in range(64):
            if nat["score"][b] <= 0:
                continue
            total += 1
            if (int(dev["qb"][b]) == nat["qb"][b]
                    and int(dev["qe"][b]) == nat["qe"][b]):
                agree += 1
        # ties can pick different-but-equal optima; most must agree
        assert agree >= 0.9 * total, (agree, total)

    def test_perfect_match_span(self):
        ref = np.random.default_rng(12).integers(0, 4, 40).astype(np.uint8)
        read = ref[5:25]
        dev = sw_score_batch(
            jnp.asarray(read[None]), jnp.asarray([20]),
            jnp.asarray(ref[None]), jnp.asarray([40]))
        assert int(dev["score"][0]) == 20
        assert int(dev["qb"][0]) == 0 and int(dev["qe"][0]) == 20
        # ref_end is the 1-based column of the last aligned base
        assert int(dev["ref_end"][0]) == 25
