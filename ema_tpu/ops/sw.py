"""Batched Smith-Waterman scoring on device (wavefront over anti-diagonals).

The reference extends every candidate with BWA's banded SW on the host
(mem_align1_core / mem_reg2aln — src/bwabridge.c:236-237, 301-311).  Here
*scoring* for all candidates runs on TPU as one batched wavefront: a
``lax.scan`` over anti-diagonals where each step updates [B, m+1] state
vectors on the VPU — no data-dependent control flow, thousands of candidate
(read, window) pairs in flight.  Only filter survivors take the host C++
traceback path for CIGARs (ema_tpu.native.align_batch), exactly mirroring
the reference's shape: cheap scoring for many, full DP for few.

Semantics are identical to native align_one (same recurrences, clip
penalty, N handling), so kernel scores and the C++ CIGARs agree; tests
cross-check them on random inputs.

Outputs per pair: clip-adjusted best score, read span (qb, qe), and the
ref-window offset of the alignment end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -(1 << 28)


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend", "clip"))
def sw_score_batch(reads: jax.Array, read_lens: jax.Array,
                   refs: jax.Array, ref_lens: jax.Array,
                   match: int = 1, mismatch: int = 4,
                   gap_open: int = 6, gap_extend: int = 1, clip: int = 5):
    """Score a batch of (read, ref window) pairs.

    reads: int32 [B, m] codes (0-3, >=4 N); refs: int32 [B, n].
    Returns dict(score, qb, qe, ref_end) — each int32 [B].  ``score`` equals
    native.align_one's clip-penalized score; pairs with no positive-scoring
    alignment get score <= 0.
    """
    B, m = reads.shape
    _, n = refs.shape
    reads = reads.astype(jnp.int32)
    refs = refs.astype(jnp.int32)
    goe = gap_open + gap_extend

    # i indexes read rows 0..m (row 0 = virtual start row), diag d = i + j.
    # State vectors are indexed by i.
    i_idx = jnp.arange(m + 1, dtype=jnp.int32)                   # [m+1]

    # H rows at d-1 and d-2; V (gap-in-ref, vertical) at d-1; D at d-1.
    # Start-of-alignment read position rides along every state (SH/SV/SD).
    def init_vec(fill):
        return jnp.full((B, m + 1), fill, jnp.int32)

    # d = 0: only cell (0, 0): H = 0
    H1 = jnp.where(i_idx[None, :] == 0, 0, NEG) + jnp.zeros((B, 1), jnp.int32)
    H2 = init_vec(NEG)
    V1 = init_vec(NEG)
    D1 = init_vec(NEG)
    S_H1 = init_vec(0)
    S_V1 = init_vec(0)
    S_D1 = init_vec(0)

    best = jnp.full((B,), NEG, jnp.int32)
    best_i = jnp.zeros((B,), jnp.int32)
    best_j = jnp.zeros((B,), jnp.int32)
    best_s = jnp.zeros((B,), jnp.int32)

    read_pad = jnp.pad(reads, ((0, 0), (1, 0)), constant_values=4)  # 1-based
    # refs padded so the reversed diagonal gather below is always in-bounds
    ref_pad = jnp.pad(refs, ((0, 0), (m + 1, 1)), constant_values=5)

    def shift_down(x, fill=NEG):
        """x[i] -> x[i-1] (value for index i comes from i-1)."""
        return jnp.concatenate(
            [jnp.full((B, 1), fill, jnp.int32), x[:, :-1]], axis=1)

    # the diagonal path needs the start-tracker at d-2 too
    S_H2 = init_vec(0)

    def step2(carry, d):
        (H1, H2, V1, D1, S_H1, S_H2, S_V1, S_D1,
         best, best_i, best_j, best_s) = carry
        j_idx = d - i_idx[None, :]
        valid = (i_idx[None, :] >= 1) & (j_idx >= 1) \
            & (i_idx[None, :] <= read_lens[:, None]) \
            & (j_idx <= ref_lens[:, None])

        H1_up = shift_down(H1)
        V1_up = shift_down(V1)
        SH1_up = shift_down(S_H1, 0)
        SV1_up = shift_down(S_V1, 0)
        v_open = H1_up - goe
        v_ext = V1_up - gap_extend
        V = jnp.maximum(v_open, v_ext)
        S_V = jnp.where(v_open >= v_ext, SH1_up, SV1_up)

        d_open = H1 - goe
        d_ext = D1 - gap_extend
        D = jnp.maximum(d_open, d_ext)
        S_D = jnp.where(d_open >= d_ext, S_H1, S_D1)

        H2_up = shift_down(H2)
        SH2_up = shift_down(S_H2, 0)

        # substitution score at cell (i, j=d-i): read[i-1] vs ref[j-1]
        # read_pad[:, i] = reads[:, i-1]; ref_pad left-padded by m+1 so
        # refs[:, d-i-1] = ref_pad[:, m+d-i] (a reversed diagonal gather)
        rb = read_pad
        ref_idx = jnp.clip(m + d - i_idx[None, :], 0, ref_pad.shape[1] - 1)
        cb = jnp.take_along_axis(ref_pad, jnp.broadcast_to(ref_idx, (B, m + 1)), axis=1)
        sub = jnp.where((rb >= 4) | (cb >= 4), -1,
                        jnp.where(rb == cb, match, -mismatch))

        # fresh start at row i begins the alignment at read pos i-1;
        # clipping i-1 leading bases costs 0 when i == 1 else `clip`
        fresh = jnp.where(i_idx[None, :] == 1, 0, -clip)
        fresh_sh = i_idx[None, :] - 1    # start read position marker
        diag_base = jnp.maximum(H2_up, fresh)
        diag_s = jnp.where(H2_up >= fresh, SH2_up, fresh_sh)
        Hdiag = diag_base + sub

        H = jnp.maximum(jnp.maximum(Hdiag, D), V)
        S_H = jnp.where(Hdiag >= jnp.maximum(D, V), diag_s,
                        jnp.where(D >= V, S_D, S_V))
        H = jnp.where(valid, H, NEG)
        V = jnp.where(valid, V, NEG)
        D = jnp.where(valid, D, NEG)

        # track best with end-clip adjustment
        end_adj = jnp.where(i_idx[None, :] == read_lens[:, None], 0, -clip)
        cand = jnp.where(valid, H + end_adj, NEG)
        row_best = jnp.argmax(cand, axis=1).astype(jnp.int32)
        row_val = jnp.take_along_axis(cand, row_best[:, None], axis=1)[:, 0]
        improve = row_val > best
        best = jnp.where(improve, row_val, best)
        best_i = jnp.where(improve, row_best, best_i)
        best_j = jnp.where(improve, d - row_best, best_j)
        best_s = jnp.where(
            improve,
            jnp.take_along_axis(S_H, row_best[:, None], axis=1)[:, 0],
            best_s)

        return (H, H1, V, D, S_H, S_H1, S_V, S_D,
                best, best_i, best_j, best_s), None

    carry = (H1, H2, V1, D1, S_H1, S_H2, S_V1, S_D1,
             best, best_i, best_j, best_s)
    carry, _ = jax.lax.scan(step2, carry,
                            jnp.arange(1, m + n + 1, dtype=jnp.int32))
    (_, _, _, _, _, _, _, _, best, best_i, best_j, best_s) = carry

    return {
        "score": best,
        "qb": best_s,
        "qe": best_i,
        "ref_end": best_j,   # 1-based window col of last aligned ref base
    }
