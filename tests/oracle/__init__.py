"""Build helpers for reference-oracle binaries.

The reference checkout's bwa submodule is empty, so the full `ema`
binary cannot be linked.  But two large pieces compile standalone and
serve as byte-/record-level oracles for parity tests:

  * the C++ preprocessor (cpp/count.cc, cpp/correct.cc): plain C++11 +
    the vendored fmtlib — `build_preproc_oracle()` links it behind a
    ~50-line driver (tests/oracle/preproc_driver.cc).
  * the C align core (src/align.c, samdict.c, samrecord.c, split.c,
    techs.c, util.c): depends on bwa only through bwabridge.h —
    `build_align_oracle()` links it against a stub bwabridge that
    replays externally supplied candidates (tests/oracle/bwabridge_stub.c
    + align_driver.c).

Everything is compiled OUT of the repo tree (objects under a cache dir
in /tmp); no reference source is copied into the repository.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

REFERENCE = Path(os.environ.get("EMA_REFERENCE_DIR", "/root/reference"))
_HERE = Path(__file__).resolve().parent
_CACHE = Path(os.environ.get("EMA_ORACLE_BUILD_DIR",
                             "/tmp/ema_oracle_build"))


def reference_available() -> bool:
    return (REFERENCE / "cpp" / "count.cc").exists()


def _newest_mtime(paths) -> float:
    return max(p.stat().st_mtime for p in paths)


def _stale(binary: Path, sources) -> bool:
    return (not binary.exists()
            or binary.stat().st_mtime < _newest_mtime(sources))


def build_preproc_oracle() -> Path | None:
    """Compile the reference preprocessor + driver; returns the binary
    path, or None when the reference tree is unavailable."""
    if not reference_available():
        return None
    _CACHE.mkdir(parents=True, exist_ok=True)
    binary = _CACHE / "preproc_oracle"
    cpp_sources = sorted((REFERENCE / "cpp").glob("*.cc"))
    driver = _HERE / "preproc_driver.cc"
    if not _stale(binary, cpp_sources + [driver]):
        return binary
    objs = []
    for src in cpp_sources:
        obj = _CACHE / (src.stem + ".o")
        if _stale(obj, [src]):
            subprocess.run(
                ["g++", "-c", "-I", str(REFERENCE / "cpp"), "-std=c++11",
                 "-O2", "-DGITVER=\"oracle\"", str(src), "-o", str(obj)],
                check=True, capture_output=True, text=True)
        objs.append(str(obj))
    subprocess.run(
        ["g++", "-std=c++11", "-O2", str(driver), *objs,
         "-o", str(binary), "-lpthread"],
        check=True, capture_output=True, text=True)
    return binary


ALIGN_SRCS = ["align.c", "samdict.c", "samrecord.c", "split.c",
              "techs.c", "util.c", "barcodes.c"]


def build_align_oracle() -> Path | None:
    """Compile the reference align core against the candidate-replay
    bwabridge stub; returns the binary path or None."""
    if not (REFERENCE / "src" / "align.c").exists():
        return None
    _CACHE.mkdir(parents=True, exist_ok=True)
    binary = _CACHE / "align_oracle"
    srcs = [REFERENCE / "src" / s for s in ALIGN_SRCS]
    ours = [_HERE / "bwabridge_stub.c", _HERE / "align_driver.c"]
    headers = (list((REFERENCE / "include").glob("*.h"))
               + list((_HERE / "bwa_stub" / "bwa").glob("*.h")))
    if not _stale(binary, srcs + ours + headers):
        return binary
    inc = ["-I", str(REFERENCE / "include"),
           "-I", str(_HERE / "bwa_stub")]
    objs = []
    for src in srcs + ours:
        obj = _CACHE / ("aln_" + src.stem + ".o")
        subprocess.run(
            ["gcc", "-c", "-std=gnu99", "-O2", "-fopenmp", *inc,
             str(src), "-o", str(obj)],
            check=True, capture_output=True, text=True)
        objs.append(str(obj))
    subprocess.run(
        ["gcc", "-fopenmp", *objs, "-o", str(binary), "-lm"],
        check=True, capture_output=True, text=True)
    return binary


def run_align_oracle(replay, special_fastq, out_sam, platform="10x",
                     apply_opt=0) -> None:
    binary = build_align_oracle()
    assert binary is not None
    subprocess.run(
        [str(binary), str(replay), "s", str(special_fastq), "-",
         str(out_sam), platform, str(int(apply_opt))],
        check=True, capture_output=True, text=True)


def run_align_oracle_paired(replay, fq1, fq2, out_sam, platform="10x",
                            apply_opt=0) -> None:
    binary = build_align_oracle()
    assert binary is not None
    subprocess.run(
        [str(binary), str(replay), "p", str(fq1),
         str(fq2) if fq2 else "-", str(out_sam), platform,
         str(int(apply_opt))],
        check=True, capture_output=True, text=True)


def run_preproc_oracle(args, stdin_bytes: bytes, cwd=None) -> None:
    binary = build_preproc_oracle()
    assert binary is not None
    subprocess.run([str(binary), *[str(a) for a in args]],
                   input=stdin_bytes, check=True, cwd=cwd,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
