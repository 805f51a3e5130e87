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


def _axon_backend() -> bool:
    """True when JAX runs through the experimental `axon` remote TPU tunnel.

    The axon PJRT plugin reports platform "tpu", so jax.default_backend()
    can't distinguish it — but the plugin only loads when JAX_PLATFORMS
    selects it, and its sitecustomize sets that env var."""
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        import jax

        return jax.default_backend() == "axon"
    except Exception:
        return True  # can't tell — keep the cache off rather than wedge


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache dir, or None if disabled. On the experimental `axon`
    remote-compile backend, (de)serializing the large fused-prover
    executable wedges the tunnel — observed twice: a compile that takes
    ~200 s cache-off never returns with the cache on, and a second process
    reading the written entry hangs >12 min with zero progress — so the
    cache defaults OFF there. Force with ZKSTARK_CACHE_DIR."""
    import jax

    cache_dir = path or os.environ.get("ZKSTARK_CACHE_DIR")
    if cache_dir is None:
        if _axon_backend():
            return None
        cache_dir = _DEFAULT_CACHE_DIR
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
