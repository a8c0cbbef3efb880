"""Import an existing `bwa index` (.pac/.ann/.amb) as contig code arrays.

The reference consumes BWA's on-disk index directly (`bwa_idx_load`,
bwabridge.c:79; SURVEY.md §2.5), so a user with an already-indexed
reference can run it without re-indexing.  This module gives our stack
the same drop-in property: ``ema_tpu index -r ref.fa --from-bwa`` reads
the BWA files next to the FASTA and builds our `.emaidx` from them — no
FASTA parse, and align output is identical to a FASTA-built index
(tests/test_bwa_import.py).

Only the forward-genome files are needed:
  - ``.ann``: text — header ``l_pac n_seqs seed``; per contig a name
    line (``gi name [comment]``) and a ``offset len n_ambs`` line.
  - ``.amb``: text — header ``l_pac n_seqs n_holes``; per hole
    ``offset len char`` (runs of ambiguous bases that BWA randomized
    when packing).
  - ``.pac``: binary 2-bit codes, base ``i`` at byte ``i>>2`` bits
    ``(~i & 3) << 1`` (A/C/G/T = 0..3), with a 1-2 byte length trailer.

The ``.bwt``/``.sa`` halves are deliberately NOT consumed: our FM layout
(both-strand text, flat occ checkpoints, adaptive sampled SA —
index/fmindex.py) differs from BWA's interleaved-occ single-strand
format by design, and rebuilding from the 2-bit pac is fast while
guaranteeing the index matches what the rest of the pipeline expects.
Hole runs are restored to code 255 (= N), so build_index re-randomizes
them exactly as it does for FASTA input.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _read_ann(path: str) -> Tuple[int, List[Tuple[str, int, int]]]:
    """Parse `.ann`: returns (l_pac, [(name, offset, length), ...])."""
    with open(path, "r") as f:
        toks = f.read().split("\n")
    head = toks[0].split()
    l_pac, n_seqs = int(head[0]), int(head[1])
    seqs: List[Tuple[str, int, int]] = []
    li = 1
    for _ in range(n_seqs):
        parts = toks[li].split()
        name = parts[1]
        off_len = toks[li + 1].split()
        seqs.append((name, int(off_len[0]), int(off_len[1])))
        li += 2
    return l_pac, seqs


def _read_amb(path: str) -> np.ndarray:
    """Parse `.amb`: returns int64 [k, 2] (offset, length) hole runs in
    global pac coordinates."""
    with open(path, "r") as f:
        toks = f.read().split()
    n_holes = int(toks[2])
    holes = np.zeros((n_holes, 2), np.int64)
    # each record is "offset len char" = 3 tokens after the 3-token header
    for i in range(n_holes):
        holes[i, 0] = int(toks[3 + 3 * i])
        holes[i, 1] = int(toks[4 + 3 * i])
    return holes


def _read_pac(path: str, l_pac: int) -> np.ndarray:
    """Unpack `.pac` into uint8 codes [l_pac] (0..3)."""
    with open(path, "rb") as f:
        data = np.frombuffer(f.read(), np.uint8)
    need = (l_pac + 3) // 4
    if data.shape[0] < need:
        raise ValueError(
            f"{path}: {data.shape[0]} bytes < {need} needed for "
            f"l_pac={l_pac}")
    b = data[:need]
    codes = np.empty((need, 4), np.uint8)
    codes[:, 0] = (b >> 6) & 3
    codes[:, 1] = (b >> 4) & 3
    codes[:, 2] = (b >> 2) & 3
    codes[:, 3] = b & 3
    return codes.reshape(-1)[:l_pac]


def load_bwa_contigs(prefix: str) -> Dict[str, np.ndarray]:
    """Read `<prefix>.ann/.amb/.pac` (the files `bwa index ref.fa` leaves
    next to the FASTA) into {name: uint8 codes}, with ambiguous runs
    restored to 255 — the same representation parse_fasta produces, so
    build_index output is identical to indexing the FASTA."""
    l_pac, seqs = _read_ann(prefix + ".ann")
    holes = _read_amb(prefix + ".amb")
    text = _read_pac(prefix + ".pac", l_pac)
    if holes.shape[0]:
        text = text.copy()
        for off, ln in holes:
            text[off:off + ln] = 255
    out: Dict[str, np.ndarray] = {}
    for name, off, ln in seqs:
        out[name] = np.ascontiguousarray(text[off:off + ln])
    return out
