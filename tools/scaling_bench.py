"""Domain-scaling bench: the 2^24-point sharded pipeline + scaling efficiency.

Runs LDE + commit + full FRI schedule (the device side of a proof, challenges
as inputs — parallel/pipeline.py) at a given eval-domain size over 1/2/4/8
mesh devices and reports points/s + scaling efficiency eff(S) = t(1)/(S·t(S)).

On the CI box this uses the virtual CPU mesh (the standard JAX multi-host
simulation, SURVEY.md §4) — it validates that the 2^24 program compiles,
shards, and runs without OOM (the round-2 blocker was 64 MB replicated
twiddles; now UV-factored + powers_iota constants) and measures collective
overhead. On real multi-chip hardware the same code path gives the
BASELINE.md ≥80%-efficiency number.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --bits 24 --devices 1 2 4 8
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=24, help="log2(eval domain)")
    ap.add_argument("--blowup", type=int, default=8)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--backend", default="cpu")
    ap.add_argument("--fri-rounds", type=int, default=None,
                    help="cap FRI rounds (default: full schedule)")
    args = ap.parse_args()

    if args.backend == "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from jax.sharding import Mesh
    from zkstark_tpu.field import fp
    from zkstark_tpu.parallel.mesh import DOMAIN_AXIS
    from zkstark_tpu.parallel.pipeline import proof_core
    from zkstark_tpu.protocol.config import StarkConfig

    n = 1 << args.bits
    trace_domain = n // args.blowup
    trace_len = trace_domain - 1

    # synthetic witness: any vector works — the device pipeline doesn't
    # check the boundary (that's the host's job); keep generation O(n) numpy
    rng = np.random.default_rng(0)
    trace = rng.integers(0, fp.P, trace_len, dtype=np.uint64).astype(np.uint32)
    cfg = StarkConfig(
        trace_len=trace_len,
        blowup=args.blowup,
        boundary_first=int(trace[0]),
        boundary_last=int(trace[-1]),
    )
    trace_mont = jnp.asarray(fp.host_to_mont(trace))
    alphas = jnp.asarray(
        fp.host_to_mont(rng.integers(0, fp.P, 3, dtype=np.uint64).astype(np.uint32))
    )
    betas = jnp.asarray(
        fp.host_to_mont(
            rng.integers(0, fp.P, cfg.fri_rounds, dtype=np.uint64).astype(np.uint32)
        )
    )

    devices = jax.devices(args.backend)
    results = {}
    for s in args.devices:
        if len(devices) < s:
            print(json.dumps({"skip": s, "reason": "not enough devices"}))
            continue
        # a 1-device mesh (not mesh=None) keeps the SAME six-step/sharded
        # algorithm at every size — the honest scaling baseline, and it
        # avoids the whole-size radix-2 program whose ~64 MB of embedded
        # twiddles the CPU compiler chews on for an hour at 2^24
        mesh = Mesh(np.array(devices[:s]), (DOMAIN_AXIS,))
        fn = jax.jit(proof_core(cfg, mesh=mesh))
        t0 = time.perf_counter()
        out = fn(trace_mont, alphas, betas)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(trace_mont, alphas, betas))
            best = min(best, time.perf_counter() - t0)
        results[s] = best
        s0 = min(results)  # smallest measured mesh = the efficiency baseline
        print(
            json.dumps(
                {
                    "devices": s,
                    "bits": args.bits,
                    "seconds": round(best, 3),
                    "compile_seconds": round(compile_s, 1),
                    "points_per_sec": round(n / best),
                    "scaling_efficiency": round(
                        (results[s0] * s0) / (best * s), 3
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
