"""Pallas TPU kernel for the batched Smith-Waterman wavefront.

Same recurrences and outputs as ema_tpu.ops.sw.sw_score_batch (the XLA
scan version; see its docstring for the alignment semantics and the
reference citations).  The Pallas version keeps all DP state vectors in
VMEM for the whole anti-diagonal sweep — one kernel launch per batch tile
instead of m+n XLA while-loop steps — and rolls the ref anti-diagonal
through a carried vector (pltpu.roll), so the inner loop is pure VPU
elementwise math on [TILE_B, LANES] int32 registers.

Layout: reads [B, m] -> lanes hold read rows 0..m (m+1 <= LANES, padded
to a multiple of 128); refs [B, n] live in VMEM and are sliced one column
per diagonal.  Outputs pack (score, qb, qe, ref_end) into an [B, 8] int32
block.

The kernel is exact-equal to the scan version (tests assert array
equality), so either path can serve any batch; dispatch prefers Pallas on
TPU and falls back to the scan on CPU or on any compile failure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ema_tpu.ops import sw as sw_scan

NEG = -(1 << 28)
# batch tile: 512 measured +5% over 256 on hardware at pipeline shapes
# (BENCH_SW_r05 banded-pallas-t512 8.15 vs 7.75 Gcell/s full-window;
# t1024 gains 8% but costs a 28 s compile — too slow for CLI starts)
TILE_B = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(reads_ref, rlen_ref, refs_ref, nlen_ref, out_ref, *,
            m, n, lanes, match, mismatch, gap_open, gap_extend, clip):
    B = reads_ref.shape[0]
    goe = gap_open + gap_extend

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, lanes), 1)   # i index
    rl = rlen_ref[:, 0][:, None]
    nl = nlen_ref[:, 0][:, None]

    # read_pad[i] = read[i-1] (1-based), 4 at lane 0 / beyond m
    reads = reads_ref[:].astype(jnp.int32)                       # [B, m]
    read_pad = jnp.concatenate(
        [jnp.full((B, 1), 4, jnp.int32), reads,
         jnp.full((B, lanes - m - 1), 4, jnp.int32)], axis=1)
    # ref columns are consumed via a left-rolling buffer whose lane 0 is
    # always ref[d-1] (Mosaic only lowers 128-aligned dynamic lane slices)
    n_pad = _round_up(n + 1, 128)
    ref_roll0 = jnp.concatenate(
        [refs_ref[:].astype(jnp.int32),
         jnp.full((B, n_pad - n), 5, jnp.int32)], axis=1)
    rlane0 = jax.lax.broadcasted_iota(jnp.int32, (B, n_pad), 1) == 0

    valid_i = (lane >= 1) & (lane <= rl)
    end_adj = jnp.where(lane == rl, 0, -clip)
    fresh = jnp.where(lane == 1, 0, -clip)
    fresh_sh = lane - 1

    def shift_down(x, fill):
        r = pltpu.roll(x, shift=1, axis=1)
        return jnp.where(lane == 0, fill, r)

    # derive loop-carry inits from a real input so Mosaic assigns them the
    # same (non-replicated) layout the loop body produces
    zero = jnp.concatenate(
        [reads * 0, jnp.zeros((B, lanes - m), jnp.int32)], axis=1)
    negv = zero + NEG
    H1 = jnp.where(lane == 0, zero, negv)
    carry0 = (H1, negv, negv, negv, zero, zero, zero, zero,
              zero + 5,                             # rdiag
              ref_roll0,
              negv, zero, zero)                     # bestv, bestd, bests

    def step(d, carry):
        (H1, H2, V1, D1, S_H1, S_H2, S_V1, S_D1, rdiag, ref_roll,
         bestv, bestd, bests) = carry
        j_idx = d - lane
        valid = valid_i & (j_idx >= 1) & (j_idx <= nl)

        # lane-0 extraction as a masked reduction (replicated layout)
        col = jnp.sum(jnp.where(rlane0, ref_roll, 0), axis=1,
                      keepdims=True, dtype=jnp.int32)
        rdiag = shift_down(rdiag, col)
        ref_roll = pltpu.roll(ref_roll, shift=n_pad - 1, axis=1)

        H1_up = shift_down(H1, NEG)
        V1_up = shift_down(V1, NEG)
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

        H2_up = shift_down(H2, NEG)
        SH2_up = shift_down(S_H2, 0)

        sub = jnp.where((read_pad >= 4) | (rdiag >= 4), -1,
                        jnp.where(read_pad == rdiag, match, -mismatch))
        diag_base = jnp.maximum(H2_up, fresh)
        diag_s = jnp.where(H2_up >= fresh, SH2_up, fresh_sh)
        Hdiag = diag_base + sub

        H = jnp.maximum(jnp.maximum(Hdiag, D), V)
        S_H = jnp.where(Hdiag >= jnp.maximum(D, V), diag_s,
                        jnp.where(D >= V, S_D, S_V))
        H = jnp.where(valid, H, NEG)
        V = jnp.where(valid, V, NEG)
        D = jnp.where(valid, D, NEG)

        cand = jnp.where(valid, H + end_adj, NEG)
        improve = cand > bestv
        bestv = jnp.where(improve, cand, bestv)
        bestd = jnp.where(improve, d, bestd)
        bests = jnp.where(improve, S_H, bests)

        return (H, H1, V, D, S_H, S_H1, S_V, S_D, rdiag, ref_roll,
                bestv, bestd, bests)

    carry = jax.lax.fori_loop(1, m + n + 1, step, carry0)
    bestv, bestd, bests = carry[-3:]

    maxv = jnp.max(bestv, axis=1, keepdims=True)
    tie = jnp.where(bestv == maxv, (m + n + 1) - bestd, -1)
    tiemax = jnp.max(tie, axis=1, keepdims=True)
    # argmax = smallest lane among maxima (int argmax unsupported on TPU
    # pallas; a masked min-reduction is equivalent)
    bi = jnp.min(jnp.where(tie == tiemax, lane, lanes), axis=1)
    best = maxv[:, 0]
    bd = jnp.sum(jnp.where(lane == bi[:, None], bestd, 0), axis=1,
                 dtype=jnp.int32)
    bs = jnp.sum(jnp.where(lane == bi[:, None], bests, 0), axis=1,
                 dtype=jnp.int32)

    out_ref[:, 0] = best
    out_ref[:, 1] = bs
    out_ref[:, 2] = bi
    out_ref[:, 3] = bd - bi
    out_ref[:, 4:] = jnp.zeros((B, 4), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "clip", "interpret"))
def sw_score_batch_pallas(reads, read_lens, refs, ref_lens,
                          match: int = 1, mismatch: int = 4,
                          gap_open: int = 6, gap_extend: int = 1,
                          clip: int = 5, interpret: bool = False):
    """Pallas SW scorer; drop-in for sw.sw_score_batch."""
    B, m = reads.shape
    _, n = refs.shape
    lanes = _round_up(m + 1, 128)
    Bp = _round_up(max(B, 1), TILE_B)
    if Bp != B:
        pad = Bp - B
        reads = jnp.pad(reads, ((0, pad), (0, 0)), constant_values=4)
        refs = jnp.pad(refs, ((0, pad), (0, 0)), constant_values=5)
        read_lens = jnp.pad(read_lens, (0, pad))
        ref_lens = jnp.pad(ref_lens, (0, pad))

    kernel = functools.partial(
        _kernel, m=m, n=n, lanes=lanes, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend, clip=clip)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.int32),
        interpret=interpret,
    )(reads.astype(jnp.int32), read_lens.astype(jnp.int32)[:, None],
      refs.astype(jnp.int32), ref_lens.astype(jnp.int32)[:, None])

    return {
        "score": out[:B, 0],
        "qb": out[:B, 1],
        "qe": out[:B, 2],
        "ref_end": out[:B, 3],
    }


_PALLAS_OK: dict = {}


def sw_score_batch_auto(reads, read_lens, refs, ref_lens, **kw):
    """Pallas on TPU with a one-time probe; scan fallback elsewhere."""
    platform = reads.devices().pop().platform if hasattr(
        reads, "devices") else jax.default_backend()
    use_pallas = _PALLAS_OK.get(platform)
    if use_pallas is None:
        if platform not in ("tpu", "axon"):
            use_pallas = False
        else:
            try:
                sw_score_batch_pallas(
                    jnp.zeros((8, 8), jnp.int32), jnp.full(8, 8, jnp.int32),
                    jnp.zeros((8, 16), jnp.int32),
                    jnp.full(8, 16, jnp.int32), **kw)
                use_pallas = True
            except Exception:   # pragma: no cover - compile probe
                use_pallas = False
        _PALLAS_OK[platform] = use_pallas
    if use_pallas:
        return sw_score_batch_pallas(reads, read_lens, refs, ref_lens, **kw)
    return sw_scan.sw_score_batch(reads, read_lens, refs, ref_lens, **kw)


def sw_score_banded_auto(reads, read_lens, refs, ref_lens, w_band, **kw):
    """Banded scorer with backend dispatch: Pallas on TPU (one-time
    probe), XLA banded row-sweep elsewhere — the sharded-step analog of
    sw_score_batch_auto."""
    platform = jax.default_backend()
    key = ("banded", platform)
    use_pallas = _PALLAS_OK.get(key)
    if use_pallas is None:
        if platform not in ("tpu", "axon"):
            use_pallas = False
        else:
            try:
                sw_score_banded_pallas(
                    jnp.zeros((8, 8), jnp.int32), jnp.full(8, 8, jnp.int32),
                    jnp.zeros((8, 144), jnp.int32),
                    jnp.full(8, 144, jnp.int32), 128)
                use_pallas = True
            except Exception:   # pragma: no cover - compile probe
                use_pallas = False
        _PALLAS_OK[key] = use_pallas
    if use_pallas:
        return sw_score_banded_pallas(reads, read_lens, refs, ref_lens,
                                      w_band, **kw)
    return sw_scan.sw_score_banded(reads, read_lens, refs, ref_lens,
                                   w_band, **kw)


def _banded_kernel(reads_ref, rlen_ref, refs_ref, nlen_ref, wl_ref,
                   out_ref, *,
                   m, n_pad, W, match, mismatch, gap_open, gap_extend,
                   clip):
    """Banded row-sweep (see sw.sw_score_banded for the recurrences).

    Lanes hold diagonal offsets k = j - i in [0, W); rows i = 1..m run in
    a fori_loop.  The per-row window slice and read base come from
    left-rotating VMEM buffers (Mosaic only lowers 128-aligned dynamic
    lane slices), and the horizontal-gap prefix scan is log2(W) masked
    rolls.

    When shapes permit (m < 256, W <= 512, |A| < 8192 — every pipeline
    shape), the value+start scan packs (A << 17) | (k << 8) | s0 into one
    int32 and runs a 3-op max scan instead of the 7-op two-array scan:
    ordering is by A first (low bits are an unsigned offset), ties by
    larger k == NEAREST source (exactly the two-array scan's tie rule),
    and the start rides in the low byte for free.  Clamped invalid lanes
    (A -> -8192) can never win a merge: every valid cell has
    Hd >= -(clip + mismatch) > any clamped E, so outputs are bit-exact —
    asserted against the unpacked scan and the XLA kernel in
    tests/test_sw_banded.py.
    """
    B = reads_ref.shape[0]
    goe = gap_open + gap_extend

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    rl = rlen_ref[:, 0][:, None]
    nl = nlen_ref[:, 0][:, None]
    # per-candidate logical corridor (lanes k >= wl excluded)
    kmask = k_idx < wl_ref[:, 0][:, None]
    ke = k_idx * gap_extend

    # rolling buffers: lane 0 of read_roll is read[i-1]; lanes [0, W) of
    # ref_roll are ref[i-1 .. i-1+W)
    m_pad = _round_up(m + 1, 128)
    reads = reads_ref[:].astype(jnp.int32)
    read_roll0 = jnp.concatenate(
        [reads, jnp.full((B, m_pad - m), 4, jnp.int32)], axis=1)
    rlane0 = jax.lax.broadcasted_iota(jnp.int32, (B, m_pad), 1) == 0
    ref_roll0 = refs_ref[:].astype(jnp.int32)

    def shift_left(x, fill):
        r = pltpu.roll(x, shift=W - 1, axis=1)
        return jnp.where(k_idx == W - 1, fill, r)

    def shift_right(x, s, fill):
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(k_idx < s, fill, r)

    zero = jnp.zeros((B, W), jnp.int32)
    negv = zero + NEG
    carry0 = (negv, negv, zero, zero,          # Hp, Fp, SHp, SFp
              negv, zero, zero,                # bestv, besti, bests
              read_roll0, ref_roll0)

    def step(i, carry):
        (Hp, Fp, SHp, SFp, bestv, besti, bests,
         read_roll, ref_roll) = carry

        read_col = jnp.sum(jnp.where(rlane0, read_roll, 0), axis=1,
                           keepdims=True, dtype=jnp.int32)
        ref_row = ref_roll[:, :W]
        valid = (i <= rl) & (i + k_idx <= nl) & kmask

        sub = jnp.where((read_col >= 4) | (ref_row >= 4), -1,
                        jnp.where(read_col == ref_row, match, -mismatch))
        fresh = jnp.where(i == 1, 0, -clip)

        Hd = jnp.maximum(Hp, fresh) + sub
        Sd = jnp.where(Hp >= fresh, SHp, i - 1)

        f_open = shift_left(Hp, NEG) - goe
        f_ext = shift_left(Fp, NEG) - gap_extend
        F = jnp.maximum(f_open, f_ext)
        SF = jnp.where(f_open >= f_ext,
                       shift_left(SHp, 0), shift_left(SFp, 0))

        H0 = jnp.maximum(Hd, F)
        S0 = jnp.where(Hd >= F, Sd, SF)
        packed = (m < 256 and W <= 512
                  and m * max(match, 1) + W * gap_extend < 8191
                  and clip + mismatch < 8191)
        if packed:
            A = jnp.where(valid, H0 + ke, -8192)
            AK = (A << 17) | (k_idx << 8) | S0
            NEGPACK = (-8192) << 17
            P = shift_right(AK, 1, NEGPACK)
            s = 1
            while s < W:
                P = jnp.maximum(P, shift_right(P, s, NEGPACK))
                s *= 2
            E = (P >> 17) - ke - gap_open
            PS = P & 255
        else:
            A = jnp.where(valid, H0 + ke, NEG)
            P = shift_right(A, 1, NEG)
            PS = shift_right(S0, 1, 0)
            s = 1
            while s < W:
                P2 = shift_right(P, s, NEG)
                PS2 = shift_right(PS, s, 0)
                PS = jnp.where(P2 > P, PS2, PS)
                P = jnp.maximum(P, P2)
                s *= 2
        E = E if packed else P - ke - gap_open
        H = jnp.maximum(H0, E)
        SH = jnp.where(Hd >= jnp.maximum(E, F), Sd,
                       jnp.where(E >= F, PS, SF))
        H = jnp.where(valid, H, NEG)
        F = jnp.where(valid, F, NEG)

        end_adj = jnp.where(i == rl, 0, -clip)
        cand = jnp.where(valid, H + end_adj, NEG)
        improve = cand > bestv
        bestv = jnp.where(improve, cand, bestv)
        besti = jnp.where(improve, i, besti)
        bests = jnp.where(improve, SH, bests)

        read_roll = pltpu.roll(read_roll, shift=m_pad - 1, axis=1)
        ref_roll = pltpu.roll(ref_roll, shift=n_pad - 1, axis=1)
        return (H, F, SH, SF, bestv, besti, bests, read_roll, ref_roll)

    carry = jax.lax.fori_loop(1, m + 1, step, carry0)
    bestv, besti, bests = carry[4:7]

    maxv = jnp.max(bestv, axis=1, keepdims=True)
    d_key = (2 * besti + k_idx) * 1024 + besti
    key = jnp.where(bestv == maxv, d_key, jnp.int32(1 << 30))
    minkey = jnp.min(key, axis=1, keepdims=True)
    bk = jnp.min(jnp.where(key == minkey, k_idx, W), axis=1)
    sel = k_idx == bk[:, None]
    bi = jnp.sum(jnp.where(sel, besti, 0), axis=1, dtype=jnp.int32)
    bs = jnp.sum(jnp.where(sel, bests, 0), axis=1, dtype=jnp.int32)

    out_ref[:, 0] = maxv[:, 0]
    out_ref[:, 1] = bs
    out_ref[:, 2] = bi
    out_ref[:, 3] = bi + bk
    out_ref[:, 4:] = jnp.zeros((B, 4), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "w_band", "match", "mismatch", "gap_open", "gap_extend", "clip",
    "interpret", "tile_b"))
def sw_score_banded_pallas(reads, read_lens, refs, ref_lens, w_band,
                           match: int = 1, mismatch: int = 4,
                           gap_open: int = 6, gap_extend: int = 1,
                           clip: int = 5, interpret: bool = False,
                           tile_b: int = TILE_B, wl=None):
    """Pallas banded SW scorer; drop-in for sw.sw_score_banded."""
    B, m = reads.shape
    _, n = refs.shape
    W = w_band
    assert W % 128 == 0, "w_band must be lane-aligned"
    # tie-break packing (d_key) reserves 10 low bits for the row index
    if m >= 1024:
        raise ValueError(f"banded SW tie-break packing requires read "
                         f"length < 1024 (got m={m})")
    n_pad = _round_up(m + W, 128)
    TB = tile_b
    Bp = _round_up(max(B, 1), TB)
    reads = jnp.pad(reads.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                    constant_values=4)
    refs = jnp.pad(refs.astype(jnp.int32),
                   ((0, Bp - B), (0, n_pad - n)), constant_values=5)
    read_lens = jnp.pad(read_lens.astype(jnp.int32), (0, Bp - B))
    ref_lens = jnp.pad(ref_lens.astype(jnp.int32), (0, Bp - B))
    wl_arr = (jnp.full(B, W, jnp.int32) if wl is None
              else wl.astype(jnp.int32))
    wl_arr = jnp.pad(wl_arr, (0, Bp - B))

    kernel = functools.partial(
        _banded_kernel, m=m, n_pad=n_pad, W=W, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend,
        clip=clip)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.int32),
        interpret=interpret,
    )(reads, read_lens[:, None], refs, ref_lens[:, None],
      wl_arr[:, None])

    return {
        "score": out[:B, 0],
        "qb": out[:B, 1],
        "qe": out[:B, 2],
        "ref_end": out[:B, 3],
    }


NEG16 = -16384   # int16 sentinel; worst-case per-row decrements stay > -32768


def _banded_kernel16(reads_ref, rlen_ref, refs_ref, nlen_ref, wl_ref,
                     out_ref, *,
                     m, n_pad, W, match, mismatch, gap_open, gap_extend,
                     clip):
    """int16 variant of _banded_kernel: scores/trackers fit comfortably
    in int16 (|score| <= read_len * match + slack; positions <= 512),
    which doubles VPU lanes per op.  Mosaic supports only i32 SCALARS,
    so every scalar stays int32 and per-row values materialize as [B, 1]
    int16 columns; the final cross-lane reduce runs in int32."""
    B = reads_ref.shape[0]
    i16 = jnp.int16
    goe = gap_open + gap_extend

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    rl = rlen_ref[:, 0][:, None].astype(jnp.int32)
    nl = nlen_ref[:, 0][:, None].astype(jnp.int32)
    # per-candidate logical corridor (lanes k >= wl excluded)
    kmask = k_idx < wl_ref[:, 0][:, None].astype(jnp.int32)
    ke = (k_idx * gap_extend).astype(i16)

    m_pad = _round_up(m + 1, 128)
    reads = reads_ref[:].astype(jnp.int32)
    read_roll0 = jnp.concatenate(
        [reads, jnp.full((B, m_pad - m), 4, jnp.int32)], axis=1)
    rlane0 = jax.lax.broadcasted_iota(jnp.int32, (B, m_pad), 1) == 0
    ref_roll0 = refs_ref[:].astype(jnp.int32)

    zero = jnp.zeros((B, W), i16)
    negv = zero + NEG16
    zcol = jnp.zeros((B, 1), i16)
    ncol = zcol + NEG16

    def shift_left(x, fillcol):
        r = pltpu.roll(x, shift=W - 1, axis=1)
        return jnp.where(k_idx == W - 1, fillcol, r)

    def shift_right(x, s, fillcol):
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(k_idx < s, fillcol, r)

    carry0 = (negv, negv, zero, zero,
              negv, zero, zero,
              read_roll0, ref_roll0)

    def step(i, carry):
        (Hp, Fp, SHp, SFp, bestv, besti, bests,
         read_roll, ref_roll) = carry

        read_col = jnp.sum(jnp.where(rlane0, read_roll, 0), axis=1,
                           keepdims=True, dtype=jnp.int32)
        ref_row = ref_roll[:, :W]
        valid = (i <= rl) & (i + k_idx <= nl) & kmask
        icol = jnp.full((B, 1), 0, jnp.int32) + i    # [B,1] row index

        sub = jnp.where(
            (read_col >= 4) | (ref_row >= 4), -1,
            jnp.where(read_col == ref_row, match, -mismatch)
        ).astype(i16)
        fresh = jnp.where(icol == 1, 0, -clip).astype(i16)
        row16 = icol.astype(i16)

        Hd = jnp.maximum(Hp, fresh) + sub
        Sd = jnp.where(Hp >= fresh, SHp, row16 - jnp.full((B, 1), 1, i16))

        f_open = shift_left(Hp, ncol) - jnp.full((B, 1), goe, i16)
        f_ext = shift_left(Fp, ncol) - jnp.full((B, 1), gap_extend, i16)
        F = jnp.maximum(f_open, f_ext)
        SF = jnp.where(f_open >= f_ext,
                       shift_left(SHp, zcol), shift_left(SFp, zcol))

        H0 = jnp.maximum(Hd, F)
        S0 = jnp.where(Hd >= F, Sd, SF)
        A = jnp.where(valid, H0 + ke, negv)
        P = shift_right(A, 1, ncol)
        PS = shift_right(S0, 1, zcol)
        s = 1
        while s < W:
            P2 = shift_right(P, s, ncol)
            PS2 = shift_right(PS, s, zcol)
            PS = jnp.where(P2 > P, PS2, PS)
            P = jnp.maximum(P, P2)
            s *= 2
        E = P - ke - jnp.full((B, 1), gap_open, i16)
        H = jnp.maximum(H0, E)
        SH = jnp.where(Hd >= jnp.maximum(E, F), Sd,
                       jnp.where(E >= F, PS, SF))
        H = jnp.where(valid, H, negv)
        F = jnp.where(valid, F, negv)

        end_adj = jnp.where(icol == rl, 0, -clip).astype(i16)
        cand = jnp.where(valid, H + end_adj, negv)
        improve = cand > bestv
        bestv = jnp.where(improve, cand, bestv)
        besti = jnp.where(improve, row16, besti)
        bests = jnp.where(improve, SH, bests)

        read_roll = pltpu.roll(read_roll, shift=m_pad - 1, axis=1)
        ref_roll = pltpu.roll(ref_roll, shift=n_pad - 1, axis=1)
        return (H, F, SH, SF, bestv, besti, bests, read_roll, ref_roll)

    carry = jax.lax.fori_loop(1, m + 1, step, carry0)
    bestv, besti, bests = (c.astype(jnp.int32) for c in carry[4:7])

    maxv = jnp.max(bestv, axis=1, keepdims=True)
    d_key = (2 * besti + k_idx) * 1024 + besti
    key = jnp.where(bestv == maxv, d_key, jnp.int32(1 << 30))
    minkey = jnp.min(key, axis=1, keepdims=True)
    bk = jnp.min(jnp.where(key == minkey, k_idx, W), axis=1)
    sel = k_idx == bk[:, None]
    bi = jnp.sum(jnp.where(sel, besti, 0), axis=1, dtype=jnp.int32)
    bs = jnp.sum(jnp.where(sel, bests, 0), axis=1, dtype=jnp.int32)

    out_ref[:, 0] = maxv[:, 0]
    out_ref[:, 1] = bs
    out_ref[:, 2] = bi
    out_ref[:, 3] = bi + bk
    out_ref[:, 4:] = jnp.zeros((B, 4), jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "w_band", "match", "mismatch", "gap_open", "gap_extend", "clip",
    "interpret"))
def sw_score_banded_pallas16(reads, read_lens, refs, ref_lens, w_band,
                             match: int = 1, mismatch: int = 4,
                             gap_open: int = 6, gap_extend: int = 1,
                             clip: int = 5, interpret: bool = False,
                             wl=None):
    """int16 Pallas banded SW scorer (NEG reported as the int32 NEG so
    outputs remain drop-in comparable)."""
    B, m = reads.shape
    _, n = refs.shape
    W = w_band
    assert W % 128 == 0
    if m >= 1024:
        raise ValueError(f"banded SW tie-break packing requires read "
                         f"length < 1024 (got m={m})")
    n_pad = _round_up(m + W, 128)
    Bp = _round_up(max(B, 1), TILE_B)
    reads = jnp.pad(reads.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                    constant_values=4)
    refs = jnp.pad(refs.astype(jnp.int32),
                   ((0, Bp - B), (0, n_pad - n)), constant_values=5)
    read_lens = jnp.pad(read_lens.astype(jnp.int32), (0, Bp - B))
    ref_lens = jnp.pad(ref_lens.astype(jnp.int32), (0, Bp - B))
    wl_arr = (jnp.full(B, W, jnp.int32) if wl is None
              else wl.astype(jnp.int32))
    wl_arr = jnp.pad(wl_arr, (0, Bp - B))

    kernel = functools.partial(
        _banded_kernel16, m=m, n_pad=n_pad, W=W, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend,
        clip=clip)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.int32),
        interpret=interpret,
    )(reads, read_lens[:, None], refs, ref_lens[:, None],
      wl_arr[:, None])

    score = out[:B, 0]
    # normalize the int16 sentinel to the common NEG for no-alignment rows
    score = jnp.where(score <= NEG16 // 2, NEG, score)
    return {
        "score": score,
        "qb": out[:B, 1],
        "qe": out[:B, 2],
        "ref_end": out[:B, 3],
    }


# ---------------------------------------------------------------------------
# Pair-packed 64-diagonal tier.
#
# BENCH_SW_r04 measured the banded kernel ALU-bound at the chip's real
# int32 rate with a 2.56x corridor-padding waste: the mean per-candidate
# logical corridor is ~50 diagonals but the physical vector is 128 lanes.
# This kernel serves candidates whose corridor fits 64 diagonals by
# packing TWO candidates per 128-lane vector row (candidate A in lanes
# 0..63, B in 64..127).  All shifts/scans are segment-masked on the local
# diagonal kk = k & 63 (the log2 prefix scan also stops at 32), so each
# row-step advances two candidates for the price the 128-lane kernel
# paid for one.

SEG = 64


def _banded_kernel_packed(reads_ref, aux_ref, refs_ref, out_ref, *,
                          m, n_pad, m_pad, match, mismatch, gap_open,
                          gap_extend, clip):
    """Two candidates per vector row; see _banded_kernel for the
    recurrences and the packed-scan trick (reused here with kk)."""
    B = reads_ref.shape[0]
    W = 2 * SEG
    goe = gap_open + gap_extend

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    kk = k_idx & (SEG - 1)
    seg = k_idx >= SEG

    def seg_vec(col_a, col_b):
        return jnp.where(seg, col_b, col_a)

    rl = seg_vec(aux_ref[:, 0][:, None], aux_ref[:, 1][:, None])
    nl = seg_vec(aux_ref[:, 2][:, None], aux_ref[:, 3][:, None])
    wl = seg_vec(aux_ref[:, 4][:, None], aux_ref[:, 5][:, None])
    kmask = kk < wl
    ke = kk * gap_extend

    # A's read at buffer lanes [0, m), B's at [m_pad, m_pad + m)
    read_roll0 = reads_ref[:].astype(jnp.int32)
    rlaneA = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * m_pad), 1) == 0
    rlaneB = jax.lax.broadcasted_iota(
        jnp.int32, (B, 2 * m_pad), 1) == m_pad
    ref_roll0 = refs_ref[:].astype(jnp.int32)

    def shift_left(x, fill):
        r = pltpu.roll(x, shift=W - 1, axis=1)
        return jnp.where(kk == SEG - 1, fill, r)

    def shift_right(x, s, fill):
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(kk < s, fill, r)

    zero = jnp.zeros((B, W), jnp.int32)
    negv = zero + NEG
    carry0 = (negv, negv, zero, zero,          # Hp, Fp, SHp, SFp
              negv, zero, zero,                # bestv, besti, bests
              read_roll0, ref_roll0)

    def step(i, carry):
        (Hp, Fp, SHp, SFp, bestv, besti, bests,
         read_roll, ref_roll) = carry

        colA = jnp.sum(jnp.where(rlaneA, read_roll, 0), axis=1,
                       keepdims=True, dtype=jnp.int32)
        colB = jnp.sum(jnp.where(rlaneB, read_roll, 0), axis=1,
                       keepdims=True, dtype=jnp.int32)
        read_col = seg_vec(colA, colB)
        # A's window at buffer lanes [0, SEG); B's at [n_pad, n_pad+SEG)
        # -> rotate B's window down into compute lanes [SEG, 2*SEG)
        rowB = pltpu.roll(ref_roll, shift=n_pad + SEG, axis=1)
        ref_row = jnp.where(seg, rowB[:, :W], ref_roll[:, :W])
        valid = (i <= rl) & (i + kk <= nl) & kmask

        sub = jnp.where((read_col >= 4) | (ref_row >= 4), -1,
                        jnp.where(read_col == ref_row, match, -mismatch))
        fresh = jnp.where(i == 1, 0, -clip)

        Hd = jnp.maximum(Hp, fresh) + sub
        Sd = jnp.where(Hp >= fresh, SHp, i - 1)

        f_open = shift_left(Hp, NEG) - goe
        f_ext = shift_left(Fp, NEG) - gap_extend
        F = jnp.maximum(f_open, f_ext)
        SF = jnp.where(f_open >= f_ext,
                       shift_left(SHp, 0), shift_left(SFp, 0))

        H0 = jnp.maximum(Hd, F)
        S0 = jnp.where(Hd >= F, Sd, SF)
        # packed scan (see _banded_kernel): valid whenever
        # m * match + SEG * gap_extend < 8191 — every pipeline shape
        A = jnp.where(valid, H0 + ke, -8192)
        AK = (A << 17) | (kk << 8) | S0
        NEGPACK = (-8192) << 17
        P = shift_right(AK, 1, NEGPACK)
        s = 1
        while s < SEG:
            P = jnp.maximum(P, shift_right(P, s, NEGPACK))
            s *= 2
        E = (P >> 17) - ke - gap_open
        PS = P & 255
        H = jnp.maximum(H0, E)
        SH = jnp.where(Hd >= jnp.maximum(E, F), Sd,
                       jnp.where(E >= F, PS, SF))
        H = jnp.where(valid, H, NEG)
        F = jnp.where(valid, F, NEG)

        end_adj = jnp.where(i == rl, 0, -clip)
        cand = jnp.where(valid, H + end_adj, NEG)
        improve = cand > bestv
        bestv = jnp.where(improve, cand, bestv)
        besti = jnp.where(improve, i, besti)
        bests = jnp.where(improve, SH, bests)

        read_roll = pltpu.roll(read_roll, shift=2 * m_pad - 1, axis=1)
        ref_roll = pltpu.roll(ref_roll, shift=2 * n_pad - 1, axis=1)
        return (H, F, SH, SF, bestv, besti, bests, read_roll, ref_roll)

    carry = jax.lax.fori_loop(1, m + 1, step, carry0)
    bestv, besti, bests = carry[4:7]

    d_key = (2 * besti + kk) * 1024 + besti
    for half in (0, 1):
        mask = seg if half else ~seg
        bv = jnp.where(mask, bestv, NEG)
        maxv = jnp.max(bv, axis=1, keepdims=True)
        key = jnp.where(bv == maxv, d_key, jnp.int32(1 << 30))
        minkey = jnp.min(key, axis=1, keepdims=True)
        bk = jnp.min(jnp.where((key == minkey) & mask, kk, SEG), axis=1)
        sel = mask & (kk == bk[:, None])
        bi = jnp.sum(jnp.where(sel, besti, 0), axis=1, dtype=jnp.int32)
        bs = jnp.sum(jnp.where(sel, bests, 0), axis=1, dtype=jnp.int32)
        o = 4 * half
        out_ref[:, o + 0] = maxv[:, 0]
        out_ref[:, o + 1] = bs
        out_ref[:, o + 2] = bi
        out_ref[:, o + 3] = bi + bk


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "clip",
    "interpret", "tile_b"))
def sw_score_banded_pallas_packed(reads, read_lens, refs, ref_lens, wl,
                                  match: int = 1, mismatch: int = 4,
                                  gap_open: int = 6, gap_extend: int = 1,
                                  clip: int = 5, interpret: bool = False,
                                  tile_b: int = TILE_B):
    """Pair-packed banded SW scorer for corridors wl <= 64.

    Drop-in output contract of sw_score_banded_pallas(w_band=64) on the
    same candidates (bit-exact; tests/test_sw_banded.py) at ~2x the
    effective cell rate: two candidates share each 128-lane vector row.
    """
    B, m = reads.shape
    _, n = refs.shape
    if m >= 1024:
        raise ValueError(f"banded SW tie-break packing requires read "
                         f"length < 1024 (got m={m})")
    # the kernel reads window columns [0, m + SEG); narrower inputs pad
    n_eff = m + SEG
    n_pad = _round_up(n_eff, 128)
    m_pad = _round_up(m + 1, 128)
    B2 = (B + 1) // 2
    TB = min(tile_b, _round_up(max(B2, 1), 8))
    B2p = _round_up(max(B2, 1), TB)

    def pack_pairs(x, fill, width, src_w):
        """[B, src_w] -> [B2p, 2*width]: even rows -> lanes [0, width),
        odd rows -> [width, 2*width)."""
        Bp2 = 2 * B2p
        xp = jnp.full((Bp2, width), fill, jnp.int32)
        w = min(src_w, width)
        xp = xp.at[:B, :w].set(x[:, :w].astype(jnp.int32))
        return xp.reshape(B2p, 2 * width)

    reads_p = pack_pairs(reads, 4, m_pad, m)
    refs_p = pack_pairs(refs, 5, n_pad, n)

    def col(v, fill=0):
        vp = jnp.full(2 * B2p, fill, jnp.int32)
        vp = vp.at[:B].set(v.astype(jnp.int32))
        return vp.reshape(B2p, 2)

    aux = jnp.concatenate(
        [col(read_lens), col(ref_lens), col(wl),
         jnp.zeros((B2p, 2), jnp.int32)], axis=1)    # [B2p, 8]

    kernel = functools.partial(
        _banded_kernel_packed, m=m, n_pad=n_pad, m_pad=m_pad,
        match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, clip=clip)
    out = pl.pallas_call(
        kernel,
        grid=(B2p // TB,),
        in_specs=[
            pl.BlockSpec((TB, 2 * m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2 * n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B2p, 8), jnp.int32),
        interpret=interpret,
    )(reads_p, aux, refs_p)

    flat = out.reshape(2 * B2p, 4)[:B]
    return {
        "score": flat[:, 0],
        "qb": flat[:, 1],
        "qe": flat[:, 2],
        "ref_end": flat[:, 3],
    }
