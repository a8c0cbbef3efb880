"""Per-barcode-group processing: clouds, EM, selection, duplicate marking.

This is the TPU build's equivalent of the heart of the reference
(find_clouds_and_align, src/align.c:214-630, plus samdict.c).  The
pointer-chasing dict/linked-list design becomes: a single sweep that builds
padded [entries x candidates] arrays, a union-find over clouds replacing
the parent/child chains (samdict.c:91-112), and EM iterations as batched
float64 array ops.

Faithfulness notes:
  - The reference updates entry gammas *in place* while iterating entries
    in reverse-insertion order, so within a mate pair the later-inserted
    entry is recomputed first and its partner then sees the *new* gammas
    (align.c:444-521).  We replicate this exactly with a two-phase update
    (phase A: later-inserted/unpaired entries, phase B: earlier-inserted).
  - Collision handling (a read appearing twice in one cloud) re-adds the
    cloud's records in name-sorted order with force, after dropping the
    earlier additions (align.c:369-404, samdict.c:76-148).
  - EM runs only for groups of >= 30 pairs (align.c:345); gamma init is
    score-normalized per entry either way.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ema_tpu import config
from ema_tpu.utils.logprobs import normalize_log_probs, normalize_log_probs_batch


@dataclasses.dataclass
class GroupResult:
    """Selection output for one barcode group.

    All index arrays refer to ``records`` (the sweep-sorted, possibly
    mutated copy of the caller's group records).  ``emit_pairs``: list of
    (rec_idx, mate_rec_idx) with -1 for an unmapped side.
    """

    records: np.ndarray         # sweep-sorted records (active/dup mutated)
    idents: np.ndarray          # matching read-name array
    order: np.ndarray           # records == input[order]
    emit_pairs: List[tuple]
    gamma: np.ndarray           # float64 per record (selected records only)
    cloud_id: np.ndarray        # int64 per record
    cloud_bad: np.ndarray       # int8 per record
    alt_idx: np.ndarray         # int64 per record: second-best record or -1
    selected_mate: np.ndarray   # int64 per record: chosen mate record or -1
    n_clouds: int = 0


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def process_barcode_group(records: np.ndarray, idents: np.ndarray,
                          profile: config.PlatformProfile,
                          cloud_id_start: int = 0,
                          apply_opt: bool = False,
                          rng: Optional[np.random.Generator] = None,
                          n_pairs_in_group: Optional[int] = None,
                          use_device_em: bool = False) -> GroupResult:
    """Run clouds+EM+selection for all records of one barcode.

    records: RECORD_DTYPE array (all same bc); idents: per-record read-name
    strings (np.ndarray of str) used for ordering and entry identity.
    ``n_pairs_in_group``: total read pairs in the barcode group including
    unaligned ones — gates EM like the reference's n_fq1_recs >= 30
    (align.c:345); defaults to the number of pairs holding records.
    """
    n = records.shape[0]
    many = profile.many_clouds

    # --- sort sweep order: (chrom, pos, ident) — record_cmp semantics ----
    order = np.lexsort((idents, records["pos"], records["chrom"]))
    R = records[order]
    RI = idents[order]

    # --- cloud sweep with collision handling -----------------------------
    # entry key: (pair, mate).  Candidates are (sorted-record-index, cloud).
    entries: dict = {}
    entry_keys: List[tuple] = []      # insertion order
    cands_rec: List[List[int]] = []
    cands_cloud: List[List[int]] = []
    uf = _UnionFind()
    cloud_bad: List[int] = []

    def add(sorted_idx: int, cloud: int, force: bool) -> bool:
        """Returns True on same-cloud collision (nothing added)."""
        key = (int(R["pair"][sorted_idx]), int(R["mate"][sorted_idx]))
        eid = entries.get(key)
        if eid is not None:
            cl = cands_cloud[eid]
            if cl:
                last = cl[-1]
                if last == cloud and not force:
                    return True
                if not many and last != cloud:
                    uf.union(last, cloud)
            if len(cl) < config.MAX_CANDIDATES:
                cands_rec[eid].append(sorted_idx)
                cl.append(cloud)
        else:
            eid = len(entry_keys)
            entries[key] = eid
            entry_keys.append(key)
            cands_rec.append([sorted_idx])
            cands_cloud.append([cloud])
        return False

    chrom = R["chrom"]
    pos = R["pos"]
    i = 0
    while i < n:
        cloud = len(cloud_bad)
        cloud_bad.append(0)
        add(i, cloud, False)
        j = i
        collision = False
        while (j + 1 < n and chrom[j + 1] == chrom[j]
               and pos[j + 1] - pos[j] <= profile.dist_thresh):
            j += 1
            if not collision and add(j, cloud, False):
                collision = True
                # drop the earlier additions of this cloud (samdict del)
                for k in range(i, j):
                    key = (int(R["pair"][k]), int(R["mate"][k]))
                    eid = entries[key]
                    cands_rec[eid].pop()
                    cands_cloud[eid].pop()
        if collision:
            cloud_bad[cloud] = 1
            members = list(range(i, j + 1))
            # name order: (ident, mate) — align.c name_cmp
            members.sort(key=lambda k: (RI[k], int(R["mate"][k])))
            if apply_opt:
                from ema_tpu.core.split import mark_optimal_alignments_in_cloud
                mark_optimal_alignments_in_cloud(R, RI, members, profile, rng)
            for k in members:
                add(k, cloud, True)
        i = j + 1

    n_entries = len(entry_keys)
    n_clouds = len(cloud_bad)

    # --- pad to [E, C] arrays -------------------------------------------
    C = max((len(c) for c in cands_rec), default=1)
    cand_rec = np.zeros((n_entries, C), np.int64)
    cand_cloud = np.zeros((n_entries, C), np.int64)
    cmask = np.zeros((n_entries, C), bool)
    for e in range(n_entries):
        k = len(cands_rec[e])
        cand_rec[e, :k] = cands_rec[e]
        cand_cloud[e, :k] = cands_cloud[e]
        cmask[e, :k] = True

    # mate links: entry with same pair, other mate
    mate_entry = np.full(n_entries, -1, np.int64)
    for e, (pair, mate) in enumerate(entry_keys):
        other = entries.get((pair, 1 - mate))
        if other is not None:
            mate_entry[e] = other
            mate_entry[other] = e

    # cloud chain components for weight normalization
    comp = np.array([uf.find(c) for c in range(n_clouds)], np.int64) \
        if n_clouds else np.zeros(0, np.int64)

    # --- gamma init (align.c:410-429) ------------------------------------
    scores = np.where(cmask, R["score"][cand_rec], 0.0)
    gammas = normalize_log_probs_batch(scores, cmask)

    exp_cov = np.zeros(n_clouds, np.float64)
    np.add.at(exp_cov, cand_cloud[cmask], gammas[cmask])
    weights = exp_cov.copy()
    if not many and n_clouds:
        weights = _normalize_chains(weights, comp)

    # --- EM iterations (align.c:431-543) ---------------------------------
    n_pairs = (n_pairs_in_group if n_pairs_in_group is not None
               else len({int(p) for p, _ in entry_keys}))
    if n_pairs >= config.MIN_PAIRS_FOR_EM:
        active = R["active"][cand_rec] & ~R["duplicate"][cand_rec] & cmask
        rec_chrom = R["chrom"][cand_rec]
        rec_pos = R["pos"][cand_rec]
        rec_rev = R["rev"][cand_rec]
        raw_score = R["score"][cand_rec]

        if use_device_em and n_entries:
            gammas = _run_em_device(
                raw_score, cmask, active, cand_cloud, rec_chrom, rec_pos,
                rec_rev, mate_entry, comp, n_clouds, many)
        else:
            # phase split: later-inserted mate-pair member updates first
            e_idx = np.arange(n_entries)
            phase_b = (mate_entry >= 0) & (e_idx < mate_entry)
            phase_a = ~phase_b
            for _ in range(config.EM_ITERS):
                for phase in (phase_a, phase_b):
                    if not phase.any():
                        continue
                    sel = np.nonzero(phase)[0]
                    gammas[sel] = _recompute_gammas(
                        sel, gammas, weights, mate_entry, cand_cloud, cmask,
                        rec_chrom, rec_pos, rec_rev, raw_score, many)
                exp_cov[:] = 0.0
                np.add.at(exp_cov, cand_cloud[active], gammas[active])
                weights = exp_cov.copy()
                if not many and n_clouds:
                    weights = _normalize_chains(weights, comp)

    # --- selection (align.c:545-572, samdict.c:166-243) ------------------
    gamma_out = np.zeros(n, np.float64)
    cloud_out = np.zeros(n, np.int64)
    alt_out = np.full(n, -1, np.int64)
    selected_mate = np.full(n, -1, np.int64)
    emit_pairs: List[tuple] = []
    visited_entry = np.zeros(n_entries, bool)

    masked_g = np.where(cmask & R["active"][cand_rec], gammas, -np.inf)

    def find_best(e: int) -> int:
        g = masked_g[e]
        if np.isinf(g).all():
            best = 0
            best_gamma = -1.0
        else:
            best = int(np.argmax(g))        # first max wins
            best_gamma = float(g[best])
            if best_gamma == -np.inf:
                best, best_gamma = 0, -1.0
        ridx = int(cand_rec[e, best])
        gamma_out[ridx] = best_gamma if best_gamma > -1.0 else -1.0
        cloud_out[ridx] = cand_cloud[e, best]
        if best_gamma <= config.SECONDARY_ALIGN_THRESH:
            g2 = g.copy()
            g2[best] = -np.inf
            if not np.isinf(g2).all():
                second = int(np.argmax(g2))
                if g2[second] > 0:
                    alt_out[ridx] = int(cand_rec[e, second])
        return ridx

    # head order = reverse insertion order
    for e in range(n_entries - 1, -1, -1):
        if visited_entry[e]:
            continue
        m = int(mate_entry[e])
        best = find_best(e)
        best_mate = find_best(m) if m >= 0 else -1
        emit_pairs.append((best, best_mate))
        if best_mate >= 0:
            selected_mate[best] = best_mate
            selected_mate[best_mate] = best
        visited_entry[e] = True
        if m >= 0:
            visited_entry[m] = True

    # --- duplicate marking (align.c:574-585) -----------------------------
    if not many and emit_pairs:
        finals: List[int] = []
        for a, b in emit_pairs:
            finals.append(a)
            if b >= 0:
                finals.append(b)
        fa = np.array(finals, np.int64)
        mates = selected_mate[fa]
        has_mate = mates >= 0
        mchrom = np.where(has_mate, R["chrom"][np.maximum(mates, 0)],
                          np.iinfo(np.int64).max)
        mpos = np.where(has_mate, R["pos"][np.maximum(mates, 0)],
                        np.iinfo(np.int64).max)
        keys = np.stack([
            R["mate"][fa], R["rev"][fa], R["chrom"][fa], R["pos"][fa],
            mchrom, mpos], axis=1)
        order2 = np.lexsort(tuple(keys.T[::-1]))
        sk = keys[order2]
        same = np.zeros(len(fa), bool)
        same[1:] = (sk[1:] == sk[:-1]).all(axis=1)
        R["duplicate"][fa[order2[same]]] = True

    return GroupResult(
        records=R,
        idents=RI,
        order=order,
        emit_pairs=emit_pairs,
        gamma=gamma_out,
        cloud_id=cloud_out + cloud_id_start,
        cloud_bad=np.array(cloud_bad, np.int8)[
            np.clip(cloud_out, 0, max(n_clouds - 1, 0))] if n_clouds
        else np.zeros(n, np.int8),
        alt_idx=alt_out,
        selected_mate=selected_mate,
        n_clouds=n_clouds,
    )


def _run_em_device(raw_score, cmask, active, cand_cloud, rec_chrom, rec_pos,
                   rec_rev, mate_entry, comp, n_clouds, many) -> np.ndarray:
    """Run the EM iterations on device (ema_tpu.core.em_jax), G=1 batch."""
    import jax.numpy as jnp

    from ema_tpu.core import em_jax

    nc = max(int(n_clouds), 1)
    comp_full = np.arange(nc, dtype=np.int32) if many else np.asarray(
        comp, np.int64).astype(np.int32)
    if comp_full.shape[0] < nc:
        comp_full = np.concatenate(
            [comp_full, np.arange(comp_full.shape[0], nc, dtype=np.int32)])
    inp = em_jax.EMInputs(
        score=jnp.asarray(np.where(cmask, raw_score, 0.0)[None]),
        cmask=jnp.asarray(cmask[None]),
        active=jnp.asarray(active[None]),
        cand_cloud=jnp.asarray(cand_cloud[None].astype(np.int32)),
        rec_chrom=jnp.asarray(rec_chrom[None].astype(np.int32)),
        rec_pos=jnp.asarray(rec_pos[None].astype(np.int32)),
        rec_rev=jnp.asarray(rec_rev[None].astype(np.int32)),
        mate_entry=jnp.asarray(mate_entry[None].astype(np.int32)),
        emask=jnp.asarray(np.ones((1, cmask.shape[0]), bool)),
        comp=jnp.asarray(comp_full[None]),
        run_em=jnp.asarray(np.ones(1, bool)),
    )
    gammas, _ = em_jax.em_run(inp, many=many)
    return np.asarray(gammas[0], dtype=np.float64)


def _normalize_chains(weights: np.ndarray, comp: np.ndarray) -> np.ndarray:
    """Normalize cloud weights within each disjoint-set chain
    (align.c:125-143)."""
    totals = np.zeros(comp.max() + 1, np.float64)
    np.add.at(totals, comp, weights)
    t = totals[comp]
    return np.where(t > 0, weights / np.where(t > 0, t, 1.0), weights)


def _recompute_gammas(sel, gammas, weights, mate_entry, cand_cloud, cmask,
                      rec_chrom, rec_pos, rec_rev, raw_score, many):
    """Vectorized gamma update for a set of entries (align.c:444-521)."""
    E = sel.shape[0]
    C = gammas.shape[1]
    mask = cmask[sel]

    cloud_w = weights[cand_cloud[sel]]
    if many:
        tot = np.where(mask, cloud_w, 0.0).sum(axis=1, keepdims=True)
        cloud_w = np.where(tot > 0, cloud_w / np.where(tot > 0, tot, 1.0), 0.0)
    with np.errstate(divide="ignore"):
        log_w = np.log(np.where(cloud_w > 0, cloud_w, 1e-300))

    # best mate score
    best_mate = np.full((E, C), config.UNPAIRED_PENALTY)
    has_mate = mate_entry[sel] >= 0
    if has_mate.any():
        hm = np.nonzero(has_mate)[0]
        me = mate_entry[sel][hm]
        m_chrom = rec_chrom[me][:, None, :]      # [H, 1, C]
        m_pos = rec_pos[me][:, None, :]
        m_rev = rec_rev[me][:, None, :]
        m_cloud = cand_cloud[me][:, None, :]
        m_gamma = gammas[me][:, None, :]
        m_mask = cmask[me][:, None, :]

        i_chrom = rec_chrom[sel][hm][:, :, None]  # [H, C, 1]
        i_pos = rec_pos[sel][hm][:, :, None]
        i_rev = rec_rev[sel][hm][:, :, None]
        i_cloud = cand_cloud[sel][hm][:, :, None]

        ok = (m_mask & (m_chrom == i_chrom) & (m_rev != i_rev)
              & (m_cloud == i_cloud) & (m_gamma != 0.0))
        d = np.where(i_rev == 1, i_pos - m_pos, m_pos - i_pos)
        pen = np.where((d >= config.INSERT_MIN) & (d <= config.INSERT_MAX),
                       0.0, config.UNPAIRED_PENALTY)
        with np.errstate(divide="ignore", invalid="ignore"):
            ms = pen + np.log(np.where(ok & (m_gamma > 0), m_gamma, 1.0))
        ms = np.where(ok, ms, -np.inf)
        best = ms.max(axis=2)
        best_mate[hm] = np.maximum(best, config.UNPAIRED_PENALTY)

    new = raw_score[sel] + log_w + best_mate
    return normalize_log_probs_batch(np.where(mask, new, 0.0), mask)
