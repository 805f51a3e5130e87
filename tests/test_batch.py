"""Data-parallel batched proving: per-proof transcripts must be byte-identical
to solo proving of the same witness."""

import numpy as np
import pytest

from zkstark_tpu.protocol import batch
from zkstark_tpu.protocol.air import fibonacci_sq_trace
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.protocol.prover import prove
from zkstark_tpu.protocol.verifier import verify


@pytest.fixture(scope="module")
def small_cfg():
    trace = fibonacci_sq_trace(63, 3141592)
    return StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))


def test_batch_matches_solo(small_cfg):
    solo = prove(small_cfg, fused=False)
    proofs = batch.prove_batch(small_cfg, [3141592] * 4)
    assert len(proofs) == 4
    for p in proofs:
        assert p.data == solo.data
        assert p.state == solo.state


def test_batch_proofs_verify(small_cfg):
    proofs = batch.prove_batch(small_cfg, [3141592] * 2)
    for p in proofs:
        verify(p, small_cfg)


def test_batch_rejects_bad_witness(small_cfg):
    with pytest.raises(ValueError):
        batch.prove_batch(small_cfg, [3141592, 1234])


def test_batch_sharded_over_data_axis(small_cfg):
    """DP over a mesh: the batch axis sharded across devices via
    NamedSharding (SURVEY.md §2 DP row) — proofs byte-identical to solo."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    solo = prove(small_cfg, fused=False)
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))
    proofs = batch.prove_batch(small_cfg, [3141592] * 4, mesh=mesh)
    assert len(proofs) == 4
    for p in proofs:
        assert p.data == solo.data
        assert p.state == solo.state
