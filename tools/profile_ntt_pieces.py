"""Scratch: time the individual steps of ntt_fourstep via jitted scan loops."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def _bitrev_reshape(v, bits: int):
    """Row bit-reversal as a multi-axis transpose (vs jnp.take's gather)."""
    n1, n2 = v.shape
    t = v.reshape((2,) * bits + (n2,))
    t = t.transpose(tuple(reversed(range(bits))) + (bits,))
    return t.reshape(n1, n2)


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << bits
    w = fp.subgroup_generator(n)
    c = ntt_kernel._fourstep_constants(n, w, None)
    n1, n2 = c.n1, c.n2
    rbits = n1.bit_length() - 1
    print(f"n=2^{bits} n1={n1} n2={n2}", flush=True)
    x2 = (jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(fp.P)).reshape(n1, n2)

    # cheap probes first so a timeout still yields the decomposition
    timed("mont_mul_elt", lambda v: fp.mont_mul(v, v), x2)  # HBM floor probe
    timed("copy_only", lambda v: v + jnp.uint32(1), x2)
    timed("brtake_rows", lambda v: jnp.take(v, c.br1, axis=0), x2)
    timed("br_reshape_transpose", lambda v: _bitrev_reshape(v, rbits), x2)
    timed("twiddle_uv", lambda v: ntt_kernel._apply_twiddle(v, c.u, c.v), x2)
    timed("transpose_only", lambda v: v.T.reshape(n1, n2), x2)
    timed(
        "transpose_brtake", lambda v: jnp.take(v.T, c.br2, axis=0).reshape(n1, n2), x2
    )
    timed(
        "brtake_twiddle_fused",
        lambda v: ntt_kernel._apply_twiddle(jnp.take(v, c.br1, axis=0), c.u, c.v),
        x2,
    )
    timed("cols_kernel1_dit", lambda v: ntt_kernel._ntt_cols_call(v, c.tw1, False), x2)
    if "--pease" in sys.argv:
        timed(
            "cols_kernel1_pease",
            lambda v: ntt_kernel._pease_cols_call(v, c.twp1, False),
            x2,
        )


if __name__ == "__main__":
    main()
