"""JAX backend guard: retry flaky accelerator init, fall back to CPU.

The attached-TPU tunnel admits one client at a time; back-to-back CLI
invocations (e.g. a shell loop over buckets, the reference's own
orchestration style — README.md:127-130) can race a predecessor's
teardown.  ``ensure_backend`` retries briefly and then falls back to
whatever platform initializes, so an align job never dies on a transient
backend error.
"""

from __future__ import annotations

import sys
import time


_malloc_tuned = False


def _tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of mmap.

    The batched pipeline allocates multi-MB arrays (seed planes, record
    tables, SAM blobs) fresh every chunk; glibc serves >128 KB requests
    via mmap and returns them to the kernel on free, so every chunk
    re-faults its pages (measured ~2% of align wall on the bench world,
    and the live-vs-warm-replay emit gap).  Raising M_MMAP_THRESHOLD and
    disabling trim makes freed blocks reusable.  mallopt applies to the
    running process, so this works without a launcher env.
    """
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 256 << 20)
        libc.mallopt(M_TRIM_THRESHOLD, 256 << 20)
    except Exception:
        pass           # non-glibc platforms: nothing to tune


def ensure_backend(retries: int = 3, delay_s: float = 3.0,
                   probe: bool = False):
    """Return jax.devices(), retrying init and falling back to CPU.

    ``EMA_TPU_PLATFORM=cpu`` (or any platform name) pins the backend via
    jax.config — needed because the attached-TPU plugin ignores the
    JAX_PLATFORMS environment variable.

    ``probe=True`` additionally runs a real device roundtrip in a
    subprocess under a deadline before this process initializes its own
    backend: an attached-TPU tunnel can wedge in a state where init
    succeeds but the first transfer never completes, which would hang a
    long align job at startup.  On probe failure the process pins CPU.
    Disable with EMA_TPU_NO_PROBE=1.
    """
    import os

    import jax

    _tune_malloc()

    # persistent compilation cache: repeated CLI invocations (bucket
    # loops, bench reruns) skip recompiles; harmless no-op where the
    # backend doesn't support executable serialization
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ.get("EMA_TPU_CACHE_DIR",
                                             "/tmp/ema_tpu_jax_cache"))
            jax.config.update("jax_enable_compilation_cache", True)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    no_probe = os.environ.get("EMA_TPU_NO_PROBE", "").lower() \
        in ("1", "true", "yes")
    plat = os.environ.get("EMA_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    elif (probe and not no_probe
            and not str(jax.config.jax_platforms or "").startswith("cpu")):
        # a recent successful probe is cached: back-to-back CLI runs
        # (per-bucket shell loops) skip the extra init through the
        # one-client tunnel
        import subprocess
        marker = os.environ.get("EMA_TPU_PROBE_MARKER",
                                "/tmp/ema_tpu_probe_ok")
        ttl = float(os.environ.get("EMA_TPU_PROBE_TTL", "600"))
        try:
            fresh = (time.time() - os.path.getmtime(marker)) < ttl
        except OSError:
            fresh = False
        if not fresh:
            try:
                subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp, numpy as np; "
                     "np.asarray(jnp.arange(8) + 1)"],
                    timeout=int(os.environ.get("EMA_TPU_PROBE_TIMEOUT",
                                               "180")),
                    check=True, capture_output=True)
                with open(marker, "w"):
                    pass
            except Exception as e:
                sys.stderr.write(
                    f"ema_tpu: device probe failed ({type(e).__name__}); "
                    "pinning this run to CPU\n")
                jax.config.update("jax_platforms", "cpu")

    last = None
    for i in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:      # backend failed to initialize
            last = e
            if i + 1 < retries:
                time.sleep(delay_s)
    sys.stderr.write(f"ema_tpu: accelerator init failed ({last}); "
                     "falling back to CPU\n")
    # request the CPU platform explicitly: once a backend init has failed,
    # flipping jax_platforms post-init is not reliable on all JAX versions
    try:
        return jax.devices("cpu")
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        return jax.devices()
