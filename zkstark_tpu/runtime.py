"""Process-level runtime knobs: persistent compilation cache + profiler.

The reference is a single static binary with zero startup cost; the TPU
framework's equivalent of "startup" is XLA compilation of the fused prover
(~minutes cold on a remote-compile backend). The persistent compilation
cache makes that a once-per-machine cost instead of once-per-process:
every jit miss is written to disk and later processes deserialize instead
of recompiling (BENCH records warmup_prove_seconds trending down).
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/zkstark_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache dir, or None if disabled (ZKSTARK_NO_CACHE=1).

    History: in rounds ≤3 the cache wedged the axon tunnel — the fused
    prover executable was huge (its jaxpr→MLIR lowering alone took 777 s)
    and (de)serializing it never returned. After the round-4 host-numpy
    constants redesign the same executable serializes at ~9.5 MB and both
    cache write and read were measured clean (cold prove 68 s writing,
    42.6 s reading — the read skips the ~39 s remote backend compile), so
    the cache now defaults ON everywhere. bench.py still switches it off
    for its one-off giant kernel programs (2^24 NTT scan, batch-32 fused),
    whose entries are the untested-large case."""
    import jax

    if os.environ.get("ZKSTARK_NO_CACHE"):
        return None
    cache_dir = path or os.environ.get("ZKSTARK_CACHE_DIR") or _DEFAULT_CACHE_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: the prover's many small kernels all add up
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:
        return None


_warm_thread = None


def warm_transfer_path() -> None:
    """Start warming the device→host data path in a daemon thread (idempotent).

    On the axon remote tunnel the FIRST d2h transfer of a process stalls for
    a long, highly variable time (measured 10 s to 470 s) while every later
    transfer is instant. The prover can't avoid d2h (roots/challenges must
    reach the Fiat-Shamir host chain), but the stall clock can start NOW and
    run concurrently with tracing/lowering/compilation instead of serializing
    after them. No-op on CPU-default processes (tests)."""
    global _warm_thread
    if _warm_thread is not None:
        return
    import threading

    def poke():
        try:
            import numpy as np

            import jax

            np.asarray(jax.device_put(np.zeros(8, np.uint32)))
        except Exception:
            pass  # warming is best-effort; real transfers will just pay

    _warm_thread = threading.Thread(target=poke, daemon=True)
    _warm_thread.start()


def profiler_trace(path: str):
    """Context manager: capture a jax.profiler trace (Perfetto/XProf) to
    `path` (SURVEY.md §5 tracing). Usage:

        with profiler_trace("/tmp/trace"):
            prove(...)
    """
    import jax

    return jax.profiler.trace(path)
