"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: end-to-end stark-101 prove latency (trace 1023 → 7836-byte proof,
including the host Fiat-Shamir spine and decommitments), verified after
timing. vs_baseline is the speedup over the only measurable reference point
in this environment (BASELINE.md): the survey's single-core Python replay of
the reference pipeline at 9.1 s (no Rust toolchain exists here and the
reference publishes no numbers).

Detailed per-kernel metrics (NTT points/s, Merkle hashes/s) go to stderr as
JSON lines; run with --all for the larger-domain sweep.
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_REPLAY_SECONDS = 9.1  # BASELINE.md: survey Python replay, 1 CPU core


def eprint(obj):
    print(json.dumps(obj), file=sys.stderr, flush=True)


def bench_stark101(repeats: int) -> float:
    from zkstark_tpu.protocol import STARK101, STARK101_SECRET, prove, verify

    # warm-up: compile everything once
    t0 = time.perf_counter()
    proof = prove(STARK101, STARK101_SECRET)
    eprint({"phase": "warmup_prove_seconds", "value": time.perf_counter() - t0})
    assert len(proof.data) == 7836

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        proof = prove(STARK101, STARK101_SECRET)
        times.append(time.perf_counter() - t0)
    best = min(times)

    t0 = time.perf_counter()
    verify(proof, STARK101)
    eprint({"phase": "verify_seconds", "value": time.perf_counter() - t0})
    eprint({"phase": "prove_seconds_all", "value": times})
    return best


def bench_ntt(log_n: int, repeats: int = 5) -> float:
    """Points/sec for a size-2^log_n forward NTT (device-only, fenced)."""
    import jax
    import jax.numpy as jnp
    from zkstark_tpu import ntt
    from zkstark_tpu.field import fp

    n = 1 << log_n
    plan = ntt.forward_plan(n)
    fn = jax.jit(lambda v: ntt.ntt(v, plan))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        fp.host_to_mont(rng.integers(0, fp.P, n, dtype=np.uint64).astype(np.uint32))
    )
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_merkle(log_n: int, repeats: int = 5) -> float:
    """SHA-256 hashes/sec for a full 2^log_n-leaf commitment (≈2n hashes)."""
    import jax
    import jax.numpy as jnp
    from zkstark_tpu.hash import merkle

    n = 1 << log_n
    fn = jax.jit(lambda v: merkle.build_levels(v)[-1])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, time.perf_counter() - t0)
    return (2 * n - 1) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="also run kernel sweep")
    args = ap.parse_args()

    import jax

    eprint({"phase": "devices", "value": [str(d) for d in jax.devices()]})

    if args.all:
        for log_n in (16, 20, 22):
            eprint(
                {
                    "metric": f"ntt_points_per_sec_2e{log_n}",
                    "value": bench_ntt(log_n),
                    "unit": "points/s",
                }
            )
        eprint(
            {
                "metric": "merkle_hashes_per_sec_2e20",
                "value": bench_merkle(20),
                "unit": "hashes/s",
            }
        )

    best = bench_stark101(args.repeats)
    print(
        json.dumps(
            {
                "metric": "stark101_prove_latency",
                "value": round(best, 4),
                "unit": "seconds",
                "vs_baseline": round(BASELINE_REPLAY_SECONDS / best, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
