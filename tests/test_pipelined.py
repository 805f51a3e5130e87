"""prove_pipelined: overlapped device/host proving is byte-identical to solo
prove() for every proof in the stream (the Fiat-Shamir chain runs on device,
so proofs have no cross-dependency to get wrong)."""

from zkstark_tpu.protocol import prove, prove_pipelined
from zkstark_tpu.protocol.air import fibonacci_sq_trace
from zkstark_tpu.protocol.config import StarkConfig


def test_pipelined_bytes_identical():
    trace = fibonacci_sq_trace(63, 3141592)
    cfg = StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))
    solo = prove(cfg, 3141592)
    proofs = prove_pipelined(cfg, [3141592] * 5, depth=2)
    assert len(proofs) == 5
    for p in proofs:
        assert p.data == solo.data and p.state == solo.state


def test_batch_pipelined_bytes_identical():
    from zkstark_tpu.protocol.batch import prove_batch_pipelined

    trace = fibonacci_sq_trace(63, 3141592)
    cfg = StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))
    solo = prove(cfg, 3141592)
    proofs = prove_batch_pipelined(cfg, [[3141592] * 3] * 3, depth=2)
    assert len(proofs) == 9
    for p in proofs:
        assert p.data == solo.data and p.state == solo.state
