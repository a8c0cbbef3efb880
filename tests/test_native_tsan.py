"""ThreadSanitizer pass over the threaded native kernels (SURVEY §5's
race-detection row; the reference CI's sanitizer analog).

Builds the native lib with -fsanitize=thread and drives the threaded
entry points (greedy/SMEM seeding, locate, banded SW, traceback) in a
subprocess with libtsan preloaded; any data race makes TSAN print
"WARNING: ThreadSanitizer" and (with halt_on_error) exit non-zero.
jax is deliberately not imported in the driver — TSAN would drown in
third-party runtime threads; the subject here is OUR pthread pools.

Skips when libtsan is not installed.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import os, sys
os.environ["EMA_TPU_NATIVE_SANITIZE"] = "thread"
sys.path.insert(0, "@REPO@")
import numpy as np
from ema_tpu import native
from ema_tpu.index import build

rng = np.random.default_rng(0)
text = rng.integers(0, 4, 60_000).astype(np.uint8)
idx = build.build_index({"c1": text}, sa_rate=4)

B, m = 256, 100
starts = rng.integers(0, text.shape[0] - m, B)
reads = np.stack([text[s:s + m] for s in starts]).astype(np.uint8)
mut = rng.random((B, m)) < 0.01
reads = np.where(mut, rng.integers(0, 4, reads.shape), reads).astype(np.uint8)
lens = np.full(B, m, np.int32)

g = native.greedy_seed_batch(idx.occ_blocks, idx.counts, idx.primary,
                             idx.fm_n, reads, lens, n_threads=4)
s = native.smem_seed_batch(idx.occ_blocks, idx.counts, idx.primary,
                           idx.fm_n, reads, lens, n_threads=4)
rows = np.asarray(g[0][:64], np.int64).reshape(-1) % (idx.fm_n)
native.locate_batch(idx, rows.astype(np.int64), n_threads=4)

owners = np.arange(B, dtype=np.int64)
win_lo = (starts - 16).astype(np.int64)
win_len = np.full(B, m + 48, np.int32)
sw = native.sw_banded_native(reads, lens, idx.text, owners, win_lo,
                             win_len, 128, n_threads=4)
assert (np.asarray(sw["score"]) > 0).any()
tb = native.traceback_batch(reads, lens, owners.astype(np.int32),
                            idx.text, win_lo, win_len, sw, n_threads=4)

print("TSAN-DRIVE-OK")
"""


def _libtsan():
    for p in ("/usr/lib/x86_64-linux-gnu/libtsan.so.2",
              "/usr/lib/x86_64-linux-gnu/libtsan.so.0",
              "/usr/lib/gcc/x86_64-linux-gnu/12/libtsan.so"):
        if os.path.exists(p):
            return p
    import ctypes.util
    return ctypes.util.find_library("tsan")


def test_threaded_kernels_race_free(tmp_path):
    tsan = _libtsan()
    if tsan is None:
        pytest.skip("libtsan not installed")
    drv = tmp_path / "drive.py"
    drv.write_text(DRIVER.replace("@REPO@", REPO))
    env = dict(os.environ,
               LD_PRELOAD=tsan,
               TSAN_OPTIONS="halt_on_error=1 exitcode=66",
               EMA_TPU_NATIVE_SANITIZE="thread",
               PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, str(drv)], env=env,
                       capture_output=True, text=True, timeout=600)
    out = r.stdout + r.stderr
    assert "WARNING: ThreadSanitizer" not in out, out[-4000:]
    assert r.returncode == 0, out[-4000:]
    assert "TSAN-DRIVE-OK" in out
