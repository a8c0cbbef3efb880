"""Density-based multimapping resolver ("-d": reference src/split.c).

Chooses one active alignment per multi-mapped read inside a bad cloud by
simulated annealing over a read-density objective.  Unlike the reference
(srand(time) — non-deterministic, split.c:54-59), our SA is seeded from
RunConfig.seed.

Implemented in _sa_optimize below; mark_optimal_alignments_in_cloud mutates
R["active"] in place for the given cloud members.
"""

from __future__ import annotations

import numpy as np

from ema_tpu import config


def _log_density_prob(density: int, log_probs) -> float:
    size = len(log_probs)
    if density < 0:     # reference uses unsigned wraparound -> huge penalty
        return -1e18
    if density < size:
        return log_probs[density]
    return log_probs[size - 1] - (density - size + 1) * np.log(2.0)


def mark_optimal_alignments_in_cloud(R: np.ndarray, RI: np.ndarray,
                                     members, profile: config.PlatformProfile,
                                     rng) -> None:
    """Port of split.c:38-338 over sorted-group record indices ``members``.

    ``members`` must be name-sorted (ident, mate) as the caller guarantees
    (align.c:394).
    """
    n_records = len(members)
    if n_records >= 50_000 or n_records <= 5:
        return
    if rng is None:
        rng = np.random.default_rng(0)
    log_probs = profile.log_density_probs

    # group same-(ident, mate) runs; drop records far from best edit dist
    clean: list = []
    i = 0
    while i < n_records:
        j = i + 1
        while (j < n_records and RI[members[j]] == RI[members[i]]
               and R["mate"][members[j]] == R["mate"][members[i]]):
            j += 1
        run = members[i:j]
        if len(run) > 1:
            ceds = [int(R["clip_edit_dist"][k]) for k in run]
            cutoff = min(ceds) + config.SPLIT_EXTRA_SEARCH_DEPTH
            for k, ced in zip(run, ceds):
                if ced <= cutoff:
                    clean.append(k)
                else:
                    R["active"][k] = False
        else:
            clean.append(run[0])
        i = j

    # partition into unique- and multi-mapped reads; find cloud bounds
    n = len(clean)
    umaps: list = []       # record idx
    mmaps: list = []       # dict(start, n, mate_umap, mate_mmap, active)
    lo, hi = np.iinfo(np.int64).max, 0
    i = 0
    while i < n:
        j = i + 1
        while (j < n and RI[clean[j]] == RI[clean[i]]
               and R["mate"][clean[j]] == R["mate"][clean[i]]):
            j += 1
        run = clean[i:j]
        for k in run:
            p = int(R["pos"][k])
            lo, hi = min(lo, p), max(hi, p)
        if len(run) > 1:
            best = int(np.argmax([R["score"][k] for k in run]))
            mate_umap = mate_mmap = -1
            pair, mate = int(R["pair"][run[0]]), int(R["mate"][run[0]])
            for ui, uk in enumerate(umaps):
                if int(R["pair"][uk]) == pair and int(R["mate"][uk]) == 1 - mate:
                    mate_umap = ui
                    break
            if mate_umap < 0:
                for mi, mm in enumerate(mmaps):
                    k0 = clean[mm["start"]]
                    if int(R["pair"][k0]) == pair and int(R["mate"][k0]) == 1 - mate:
                        mate_mmap = mi
                        mm["mate_mmap"] = len(mmaps)
                        break
            mmaps.append(dict(start=i, n=len(run), mate_umap=mate_umap,
                              mate_mmap=mate_mmap, active=best))
        else:
            for mi, mm in enumerate(mmaps):
                k0 = clean[mm["start"]]
                if (int(R["pair"][k0]) == int(R["pair"][run[0]])
                        and int(R["mate"][k0]) == 1 - int(R["mate"][run[0]])):
                    mm["mate_umap"] = len(umaps)
                    break
            umaps.append(run[0])
        i = j

    n_bins = (hi - lo) // config.BIN_SIZE + 1
    if n_bins >= config.MAX_BINS or n <= 5 or not mmaps:
        return

    def bin_of(pos):
        return (int(pos) - lo) // config.BIN_SIZE

    for k in clean:
        R["active"][k] = False

    bins = np.zeros(n_bins + 2, np.int64)
    for uk in umaps:
        bins[bin_of(R["pos"][uk])] += 1
    for mm in mmaps:
        bins[bin_of(R["pos"][clean[mm["start"] + mm["active"]]])] += 1

    from ema_tpu.core.pairing import is_proper_pair

    def is_pair(k1, k2) -> bool:
        return is_proper_pair(R["chrom"][k1], R["pos"][k1], R["rev"][k1],
                              R["chrom"][k2], R["pos"][k2], R["rev"][k2])

    ldp = lambda dens: _log_density_prob(int(dens), log_probs)

    # simulated annealing (split.c:223-325)
    no_move = 0
    tspan = config.SIM_ANNEAL_TMAX_LOG - config.SIM_ANNEAL_TMIN_LOG
    for it in range(config.SIM_ANNEAL_ITERS):
        t = 10.0 ** (config.SIM_ANNEAL_TMAX_LOG - tspan * it / config.SIM_ANNEAL_ITERS)
        r = int(rng.integers(0, len(mmaps)))
        mm = mmaps[r]
        r_old = mm["active"]
        r_new = int(rng.integers(0, mm["n"] - 1))
        if r_new >= r_old:
            r_new += 1

        active_mate = None
        mate_r = 0
        mate_is_mmap = False
        if mm["mate_umap"] >= 0:
            mate_r = mm["mate_umap"]
            active_mate = umaps[mate_r]
        elif mm["mate_mmap"] >= 0:
            mate_r = mm["mate_mmap"]
            active_mate = clean[mmaps[mate_r]["start"] + mmaps[mate_r]["active"]]
            mate_is_mmap = True

        rec_old = clean[mm["start"] + r_old]
        rec_new = clean[mm["start"] + r_new]

        dens_change = 0.0
        score_change = 0.0
        force = False
        mate_new_active = -1
        mate_old_bin = mate_new_bin = 0
        old_paired = active_mate is not None and is_pair(rec_old, active_mate)
        new_paired = active_mate is not None and is_pair(rec_new, active_mate)

        if not old_paired and new_paired:
            force = True
        elif old_paired and not new_paired and mate_is_mmap:
            mmate = mmaps[mate_r]
            for mi in range(mmate["n"]):
                cand = clean[mmate["start"] + mi]
                if is_pair(rec_new, cand):
                    mate_new_active = mi
                    mate_old_bin = bin_of(R["pos"][active_mate])
                    mate_new_bin = bin_of(R["pos"][cand])
                    score_change += (float(R["score"][cand])
                                     - float(R["score"][active_mate])) / config.SCORE_SCALE
                    break

        old_bin = bin_of(R["pos"][rec_old])
        new_bin = bin_of(R["pos"][rec_new])
        p1 = 2 if (mate_new_active >= 0 and old_bin == mate_old_bin) else 1
        p2 = 2 if (mate_new_active >= 0 and new_bin == mate_new_bin) else 1
        dens_change += (ldp(bins[old_bin] - p1) - ldp(bins[old_bin])
                        + ldp(bins[new_bin] + p2) - ldp(bins[new_bin]))
        if p1 == 1 and mate_new_active >= 0:
            dens_change += ldp(bins[mate_old_bin] - 1) - ldp(bins[mate_old_bin])
        if p2 == 1 and mate_new_active >= 0:
            dens_change += ldp(bins[mate_new_bin] + 1) - ldp(bins[mate_new_bin])

        score_change += (float(R["score"][rec_new])
                         - float(R["score"][rec_old])) / config.SCORE_SCALE
        change = dens_change + score_change

        if force or change > 0 or np.exp(min(change / t, 50.0)) >= rng.random():
            mm["active"] = r_new
            bins[old_bin] -= 1
            bins[new_bin] += 1
            if mate_new_active >= 0:
                mmaps[mate_r]["active"] = mate_new_active
                bins[mate_old_bin] -= 1
                bins[mate_new_bin] += 1
        else:
            no_move += 1
        if no_move >= config.SIM_ANNEAL_MAX_NO_MOVE:
            break

    for uk in umaps:
        R["active"][uk] = True
    for mm in mmaps:
        R["active"][clean[mm["start"] + mm["active"]]] = True
