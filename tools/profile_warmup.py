"""Diagnose where fresh-process warm-up time goes (VERDICT r2 #6).

Counts and times every XLA compile during one cold prove() using
JAX_LOG_COMPILES-style monitoring: we wrap jax's backend_compile via the
monitoring event listeners, then print a sorted table of compile spans.

    PYTHONPATH=/root/repo python tools/profile_warmup.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

compiles = []


def _install_listener():
    from jax._src import monitoring

    def on_event_dur(event, duration, **kw):
        if "backend_compile" in event or "compile" in event.lower():
            compiles.append((duration, event, kw.get("fun_name", "")))

    try:
        monitoring.register_event_duration_secs_listener(
            lambda event, dur, **kw: on_event_dur(event, dur, **kw)
        )
        return True
    except Exception as e:
        print("listener install failed:", e)
        return False


def main():
    _install_listener()
    t0 = time.perf_counter()
    from zkstark_tpu.protocol import STARK101, STARK101_SECRET, prove

    t_import = time.perf_counter() - t0
    print(f"import: {t_import:.1f}s", flush=True)

    t0 = time.perf_counter()
    proof = prove(STARK101, STARK101_SECRET)
    t_prove = time.perf_counter() - t0
    assert len(proof.data) == 7836
    print(f"cold prove: {t_prove:.1f}s", flush=True)

    total = sum(d for d, _, _ in compiles)
    print(f"compile events: {len(compiles)}, total {total:.1f}s")
    for dur, event, name in sorted(compiles, reverse=True)[:25]:
        print(f"  {dur:8.2f}s  {event}  {name}")


if __name__ == "__main__":
    main()
