"""Regression: the constant caches must survive MIXED prover programs in one
process (round-3 regression, VERDICT r3 #1).

composition_constants / fri_layer_constants are lru_cached and are normally
first populated INSIDE a jit trace (_phase2 / fused_core). If the cached
values were trace-local tracers instead of concrete arrays, the first prover
variant would poison every subsequent DIFFERENT trace (fused vs legacy vs
batched vs sharded) with UnexpectedTracerError. This test runs every prover
variant against the same config in the same process, in the order that
reproduced the round-3 failure (legacy host-synced first, then batch/mesh).
"""

import numpy as np

import jax
from jax.sharding import Mesh

from zkstark_tpu.parallel.mesh import DOMAIN_AXIS
from zkstark_tpu.protocol import batch
from zkstark_tpu.protocol.air import fibonacci_sq_trace
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.protocol.prover import prove
from zkstark_tpu.protocol.verifier import verify


def test_all_prover_variants_one_process():
    trace = fibonacci_sq_trace(63, 31415)
    cfg = StarkConfig(trace_len=63, boundary_last=int(trace[-1]))

    # legacy host-synced path first: it populates the constant caches from
    # inside _phase2's trace — exactly the poisoning order of the regression
    legacy = prove(cfg, 31415, fused=False)
    fused = prove(cfg, 31415, fused=True)
    assert fused.data == legacy.data and fused.state == legacy.state

    proofs = batch.prove_batch(cfg, [31415] * 2)
    for p in proofs:
        assert p.data == legacy.data

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), (DOMAIN_AXIS,))
    sharded = prove(cfg, 31415, mesh=mesh)
    assert sharded.data == legacy.data

    # and back to solo after the mesh-pinned prove (platform-keyed caches)
    again = prove(cfg, 31415)
    assert again.data == legacy.data
    verify(again, cfg)
