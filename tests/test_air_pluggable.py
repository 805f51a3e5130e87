"""Pluggable-AIR and multi-query tests.

The reference welds FibonacciSq into prover (prover.rs:101-145) and verifier
(proof.rs:63-77) and draws a single query (prover.rs:263). Here the constraint
system is one definition with three consumers (device composition, host point
checks, C++ RPN verifier) and the query count is a config parameter — these
tests pin all three consumers against each other and the golden preset.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zkstark_tpu import field as fp
from zkstark_tpu import native as zn
from zkstark_tpu.protocol import Proof, VerificationError, prove, verify
from zkstark_tpu.protocol import air
from zkstark_tpu.protocol.config import StarkConfig


def small_cfg(air_obj=None, secret=31415, n_queries=1):
    a = air_obj or air.FIBONACCI_SQ
    trace = a.trace(63, secret)
    return StarkConfig(
        trace_len=63,
        boundary_first=int(trace[0]),
        boundary_last=int(trace[-1]),
        n_queries=n_queries,
        air=a,
    )


# ---------------------------------------------------------------------------
# The three consumers of one constraint definition agree
# ---------------------------------------------------------------------------


def test_numerator_program_rpn():
    prog = air.numerator_program(air._fib_sq_numerator, (0, 1, 2))
    # sub(sub(f(2), f(1)²), f(0)²) in postfix
    assert prog == [
        (air.OP_F, 2),
        (air.OP_F, 1),
        (air.OP_F, 1),
        (air.OP_MUL, 0),
        (air.OP_SUB, 0),
        (air.OP_F, 0),
        (air.OP_F, 0),
        (air.OP_MUL, 0),
        (air.OP_SUB, 0),
    ]


def test_device_composition_matches_host_point_eval():
    """composition_eval (DeviceOps, Montgomery vectors) == composition_at_point
    (HostOps, exact ints) at every domain index."""
    from zkstark_tpu import ntt
    from zkstark_tpu.protocol import prover as pr

    cfg = small_cfg()
    trace = cfg.air.trace(cfg.trace_len, 31415)
    coeffs = air.interpolate_trace(
        jnp.asarray(fp.host_to_mont(trace)), cfg.trace_domain
    )
    f_eval = ntt.coset_ntt(coeffs, cfg.eval_domain, cfg.coset_offset)
    alphas = [7, 11, 13]
    alphas_mont = jnp.asarray(fp.host_to_mont(np.array(alphas, np.uint32)))
    cp = np.asarray(fp.from_mont(pr.composition_eval(cfg, f_eval, alphas_mont)))

    f_res = np.asarray(fp.from_mont(f_eval))
    h = cfg.domain_generator
    b = cfg.blowup
    d = cfg.eval_domain
    for j in (0, 1, 5, 100, d - 17):
        x = cfg.coset_offset * pow(h, j, fp.P) % fp.P
        f_vals = {k: int(f_res[(j + k * b) % d]) for k in cfg.air.shifts}
        assert int(cp[j]) == air.composition_at_point(cfg, x, f_vals, alphas)


# ---------------------------------------------------------------------------
# Multi-query proving
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def q3_proof():
    cfg = small_cfg(n_queries=3)
    return cfg, prove(cfg, 31415)


def test_q3_roundtrip_python(q3_proof):
    cfg, proof = q3_proof
    verify(proof, cfg)


def test_q3_roundtrip_native(q3_proof):
    cfg, proof = q3_proof
    if zn.native() is None:
        pytest.skip("native toolchain unavailable")
    zn.verify_native(proof, cfg)


def test_q3_transcript_longer_and_prefix_differs_only_after_free_term(q3_proof):
    """q=1 and q=3 transcripts share every byte through the free term; the
    first query draw differs (it self-commits its own position in the chain
    is the same, so the draw value is identical) and q=3 appends two more
    draw+opening groups."""
    cfg3, p3 = q3_proof
    cfg1 = small_cfg(n_queries=1)
    p1 = prove(cfg1, 31415)
    assert len(p3.data) > len(p1.data)
    # find the common prefix length: everything up to the first opening is
    # draw-order identical; the first divergence is the 2nd/3rd query draws
    prefix = 0
    for a, b in zip(p1.data, p3.data):
        if a != b:
            break
        prefix += 1
    # at least: roots + alphas + betas/roots + free term + first draw
    assert prefix >= 32 + 12 + 32 + cfg1.fri_rounds * 36 + 4 + 4


def test_q3_tamper_extra_openings_rejected(q3_proof):
    """Flipping bytes in the 2nd/3rd query opening regions must fail both
    verifiers (fault-injection coverage for the added openings)."""
    cfg, proof = q3_proof
    n = len(proof.data)
    third = n // 3
    for offset in (n - 1, n - third // 2, n - third):
        raw = bytearray(proof.data)
        raw[offset] ^= 1
        bad = Proof(state=proof.state, data=bytes(raw))
        with pytest.raises(VerificationError):
            verify(bad, cfg)
        if zn.native() is not None:
            with pytest.raises(VerificationError):
                zn.verify_native(bad, cfg)


def test_query_count_mismatch_rejected(q3_proof):
    cfg3, p3 = q3_proof
    cfg1 = small_cfg(n_queries=1)
    with pytest.raises(VerificationError):
        verify(p3, cfg1)
    with pytest.raises(VerificationError):
        verify(prove(cfg1, 31415), cfg3)


# ---------------------------------------------------------------------------
# A second AIR end-to-end — the framework is actually pluggable
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fib_proof():
    cfg = small_cfg(air_obj=air.FIBONACCI, secret=2)
    return cfg, prove(cfg, 2)


def test_second_air_trace():
    tr = air.FIBONACCI.trace(8, 1)
    assert list(tr) == [1, 1, 2, 3, 5, 8, 13, 21]


def test_second_air_roundtrip_python(fib_proof):
    cfg, proof = fib_proof
    verify(proof, cfg)


def test_second_air_roundtrip_native(fib_proof):
    cfg, proof = fib_proof
    if zn.native() is None:
        pytest.skip("native toolchain unavailable")
    zn.verify_native(proof, cfg)


def test_second_air_rejects_wrong_air(fib_proof):
    """A proof generated under FibonacciAir must not verify as FibonacciSq
    (same shape, different transition constraint)."""
    cfg, proof = fib_proof
    sq_cfg = StarkConfig(
        trace_len=cfg.trace_len,
        boundary_first=cfg.boundary_first,
        boundary_last=cfg.boundary_last,
        n_queries=cfg.n_queries,
        air=air.FIBONACCI_SQ,
    )
    with pytest.raises(VerificationError):
        verify(proof, sq_cfg)


def test_second_air_wrong_witness_rejected():
    cfg = small_cfg(air_obj=air.FIBONACCI, secret=2)
    with pytest.raises(ValueError, match="boundary"):
        prove(cfg, secret=3)


# ---------------------------------------------------------------------------
# serialize_air blob sanity
# ---------------------------------------------------------------------------


def test_serialize_air_layout():
    cfg = small_cfg()
    blob = list(air.serialize_air(cfg))
    n = cfg.trace_domain
    assert blob[:5] == [3, 0, 1, 2, 3]  # 3 shifts (0,1,2), 3 constraints
    # first constraint: Boundary(0, boundary_first)
    assert blob[5:8] == [0, 0, cfg.boundary_first]
    # second: Boundary(trace_len-1, boundary_last)
    assert blob[8:11] == [0, cfg.trace_len - 1, cfg.boundary_last]
    # third: Transition with exempt (n-3, n-2, n-1)
    assert blob[11] == 1
    assert blob[12] == 3
    assert blob[13:16] == [n - 3, n - 2, n - 1]


# ---------------------------------------------------------------------------
# Third AIR: MiMC-style square chain (secret = chain seed, only the output
# is public; transitions use ops.const → exercises the RPN OP_CONST path)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chain_proof():
    a = air.SQUARE_CHAIN
    trace = a.trace(63, 271828)
    cfg = StarkConfig(
        trace_len=63,
        boundary_last=int(trace[-1]),  # boundary_first unused: seed is secret
        air=a,
    )
    return cfg, prove(cfg, 271828)


def test_square_chain_trace():
    tr = air.SQUARE_CHAIN.trace(3, 7)
    c = air.SQUARE_CHAIN_C
    assert list(tr) == [7, (49 + c) % fp.P, ((49 + c) ** 2 + c) % fp.P]


def test_square_chain_roundtrip_python(chain_proof):
    cfg, proof = chain_proof
    verify(proof, cfg)


def test_square_chain_roundtrip_native(chain_proof):
    cfg, proof = chain_proof
    if zn.native() is None:
        pytest.skip("native toolchain unavailable")
    zn.verify_native(proof, cfg)


def test_square_chain_const_in_rpn():
    prog = air.numerator_program(air._square_chain_numerator, (0, 1))
    assert (air.OP_CONST, air.SQUARE_CHAIN_C) in prog


def test_square_chain_two_shift_openings(chain_proof):
    """shifts (0,1): each query opens 2 trace values + cp (query_range moves
    accordingly: eval_domain − 1·blowup)."""
    cfg, proof = chain_proof
    assert cfg.query_range == cfg.eval_domain - cfg.blowup
    verify(proof, cfg)


def test_square_chain_wrong_witness_rejected():
    a = air.SQUARE_CHAIN
    trace = a.trace(63, 271828)
    cfg = StarkConfig(trace_len=63, boundary_last=int(trace[-1]), air=a)
    with pytest.raises(ValueError, match="boundary"):
        prove(cfg, secret=5)


@pytest.mark.parametrize("blowup", [4, 16])
def test_nondefault_blowup_roundtrip(blowup):
    """Blowup is a real parameter, not a baked-in 8 (prover.rs:57): the FRI
    schedule, query range and constants all follow eval_domain."""
    from zkstark_tpu.protocol.air import fibonacci_sq_trace

    tr = fibonacci_sq_trace(63, 777)
    cfg = StarkConfig(trace_len=63, blowup=blowup, boundary_last=int(tr[-1]))
    p = prove(cfg, 777)
    verify(p, cfg)
    if zn.native() is not None:
        zn.verify_native(p, cfg)
