"""Synthetic linked-read simulator for tests and benchmarks."""

import numpy as np

BASES = "ACGT"


def rand_genome(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def to_str(codes):
    return "".join(BASES[c] for c in codes)


def revcomp_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = BASES[int(rng.integers(0, 4))]
    return "".join(out)


def simulate_pairs(rng, genome_str, n_barcodes=4, frags_per_bc=(1, 3),
                   pairs_per_frag=(8, 20), frag_len=20_000,
                   read_len=100, err=0.003, bc_len=16):
    """Returns (ids, bc_strs, bcs, s1, q1, s2, q2, truth).

    truth: per pair dict(pos1, pos2) of 1-based expected positions.
    """
    from ema_tpu.utils.barcodes import encode_bc_default

    G = len(genome_str)
    ids, bcs, bc_strs, s1, q1, s2, q2, truth = [], [], [], [], [], [], [], []
    pair_no = 0
    for b in range(n_barcodes):
        bc_str = to_str(rng.integers(0, 4, bc_len))
        bc = encode_bc_default(bc_str)
        for _ in range(int(rng.integers(*frags_per_bc))):
            fs = int(rng.integers(0, max(1, G - frag_len)))
            for _ in range(int(rng.integers(*pairs_per_frag))):
                insert = int(rng.integers(read_len + 20, 400))
                p = int(rng.integers(fs, min(fs + frag_len, G) - insert - 1))
                qpos = p + insert - read_len
                r1 = genome_str[p:p + read_len]
                r2 = revcomp_str(genome_str[qpos:qpos + read_len])
                ids.append(f"sim{pair_no}")
                bcs.append(bc)
                bc_strs.append(bc_str)
                s1.append(mutate(rng, r1, err))
                s2.append(mutate(rng, r2, err))
                q1.append("I" * read_len)
                q2.append("I" * read_len)
                truth.append({"pos1": p + 1, "pos2": qpos + 1, "bc": bc_str})
                pair_no += 1
    return ids, bc_strs, bcs, s1, q1, s2, q2, truth


def parse_sam_line(line):
    f = line.rstrip("\n").split("\t")
    d = {
        "qname": f[0], "flag": int(f[1]), "rname": f[2], "pos": int(f[3]),
        "mapq": int(f[4]), "cigar": f[5], "rnext": f[6], "pnext": int(f[7]),
        "tlen": int(f[8]), "seq": f[9], "qual": f[10], "tags": {},
    }
    for t in f[11:]:
        k, typ, v = t.split(":", 2)
        d["tags"][k] = v
    return d
