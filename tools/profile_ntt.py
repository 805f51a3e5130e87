"""Scratch profiler: honest device-side NTT timing via jitted iteration loops.

Each measurement jits ONE program that runs the transform `reps` times
back-to-back (output feeds input, so nothing is DCE'd) — per-call RPC latency
of the axon tunnel is amortized away.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import functools
import time

import jax
import jax.numpy as jnp

from zkstark_tpu.field import fp
from zkstark_tpu.ntt import core as ntt_core
from zkstark_tpu.ops import ntt_kernel

REPS = 10


def timed(fn, x):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = fn(x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / REPS


def loop(body):
    @jax.jit
    def fn(x):
        def step(v, _):
            return body(v), None
        v, _ = jax.lax.scan(step, x, None, length=REPS)
        return v
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, nargs="+", default=[20, 22, 24])
    ap.add_argument("--radix2", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    for bits in args.bits:
        n = 1 << bits
        w = fp.subgroup_generator(n)
        x = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(fp.P)

        t_fs = timed(loop(lambda v: ntt_kernel.ntt_fourstep(v, n, w)), x)
        line = f"n=2^{bits}: fourstep={t_fs*1e3:.3f}ms"
        if args.radix2 and bits <= 22:
            plan = ntt_core.make_plan(n, w)
            t_r2 = timed(
                loop(
                    lambda v: ntt_core._butterflies(jnp.take(v, plan.bitrev), plan)
                ),
                x,
            )
            line += f" radix2={t_r2*1e3:.3f}ms"
        sol = 6 * n * 4 / 819e9
        line += (
            f" SoL~{sol*1e3:.3f}ms ratio={t_fs/sol:.1f}x pts/s={n/t_fs/1e6:.0f}M"
        )
        print(line, flush=True)


if __name__ == "__main__":
    main()
