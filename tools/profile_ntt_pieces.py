"""Scratch: time the individual steps of ntt_fourstep via jitted scan loops."""
import sys
import time

import jax
import jax.numpy as jnp

from zkstark_tpu.field import fp
from zkstark_tpu.ops import ntt_kernel

REPS = 10


def timed(name, body, x):
    @jax.jit
    def fn(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(x))
    dt = (time.perf_counter() - t0) / REPS
    print(f"  {name}: {dt*1e3:.3f}ms", flush=True)
    return dt


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << bits
    w = fp.subgroup_generator(n)
    n1, n2, tw1, tw2, br1, br2, u, v_tw = ntt_kernel._fourstep_constants(n, w, None)
    print(f"n=2^{bits} n1={n1} n2={n2}", flush=True)
    x2 = (jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(fp.P)).reshape(n1, n2)

    timed("brtake_rows", lambda v: jnp.take(v, br1, axis=0), x2)
    timed("cols_kernel1", lambda v: ntt_kernel._ntt_cols_call(v, tw1, False), x2)
    timed("twiddle_uv", lambda v: ntt_kernel._apply_twiddle(v, u, v_tw), x2)
    timed("transpose_brtake", lambda v: jnp.take(v.T, br2, axis=0).reshape(n1, n2), x2)
    timed("transpose_only", lambda v: v.T.reshape(n1, n2), x2)
    timed(
        "mont_mul_elt", lambda v: fp.mont_mul(v, v), x2
    )  # one elementwise field mul over the array: HBM floor probe


if __name__ == "__main__":
    main()
