"""Round-5 hardware probes (run on the real TPU): one JSON line per result.

  --ntt     : 2^24 NTT points/s, ZKSTARK_MXU off vs on (bit-exactness asserted)
  --merkle  : Merkle commit hashes/s at several sizes, pairs vs folded-planar
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_once(fn, x, reps):
    import jax

    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def probe_ntt(log_n: int, reps: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkstark_tpu import ntt
    from zkstark_tpu.field import fp

    n = 1 << log_n
    plan = ntt.forward_plan(n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        fp.host_to_mont(rng.integers(0, fp.P, n, dtype=np.uint64).astype(np.uint32))
    )

    outs = {}
    for mode in ("off", "on"):
        os.environ["ZKSTARK_MXU"] = mode

        @jax.jit
        def fn(v):
            def step(c, _):
                return ntt.ntt(c, plan), None

            c, _ = jax.lax.scan(step, v, None, length=reps)
            return c

        t0 = time.perf_counter()
        best = bench_once(fn, x, reps)
        outs[mode] = np.asarray(fn(x))
        emit(
            probe=f"ntt_2e{log_n}",
            mxu=mode,
            points_per_sec=round(n / best),
            seconds=round(best, 5),
            compile_s=round(time.perf_counter() - t0, 1),
        )
    assert (outs["on"] == outs["off"]).all(), "MXU route not bit-exact!"
    emit(probe=f"ntt_2e{log_n}", bit_exact=True)


def probe_merkle(log_n: int, reps: int = 4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkstark_tpu.hash import merkle

    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))

    for planar_min in (1 << 30, 1 << 10):  # pairs-only vs planar-everywhere
        merkle.PLANAR_MIN = planar_min
        merkle.PLANAR_STOP = min(planar_min, merkle.PLANAR_STOP)

        @jax.jit
        def fn(v):
            def step(c, _):
                root = merkle.build_levels(v)[-1][0]
                return c + root[0], root

            _, roots = jax.lax.scan(step, v, None, length=reps)
            return roots

        best = bench_once(fn, x, reps)
        emit(
            probe=f"merkle_2e{log_n}",
            layout="pairs" if planar_min > n else "planar",
            hashes_per_sec=round((2 * n - 1) / best),
            seconds=round(best, 5),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ntt", action="store_true")
    ap.add_argument("--merkle", action="store_true")
    ap.add_argument("--log-n", type=int, default=24)
    ap.add_argument("--merkle-sizes", type=str, default="20,22,24")
    args = ap.parse_args()

    from zkstark_tpu.runtime import enable_compilation_cache, warm_transfer_path

    enable_compilation_cache()
    warm_transfer_path()

    if args.ntt:
        probe_ntt(args.log_n)
    if args.merkle:
        for s in args.merkle_sizes.split(","):
            probe_merkle(int(s))


if __name__ == "__main__":
    main()
