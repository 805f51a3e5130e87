"""Degree contracts: the asserts the reference runs in production
(prover.rs:154-156 constraint degrees, prover.rs:228-238 FRI halving schedule)
as test-only INTT checks, per SURVEY.md §7.4.

A fold bug that preserves evaluations at the query point but breaks the
low-degree structure would pass the transcript goldens — these tests close
that hole. Run at trace 63 / domain 512 (same algebra, CPU-fast); the exact
reference degrees (1021/1021/1023, 1023→…→0) are the trace-1023 instance of
the same formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkstark_tpu import ntt
from zkstark_tpu.field import fp
from zkstark_tpu.protocol import air
from zkstark_tpu.protocol import prover as pr
from zkstark_tpu.protocol.config import StarkConfig


def _degree(evals_mont, layer: int, cfg) -> int:
    """Exact polynomial degree of a layer's evaluations via coset INTT."""
    offset = pow(cfg.coset_offset, 1 << layer, fp.P)
    coeffs = np.asarray(fp.from_mont(ntt.coset_intt(evals_mont, offset)))
    nz = np.nonzero(coeffs)[0]
    return -1 if len(nz) == 0 else int(nz[-1])


@pytest.fixture(scope="module")
def setup():
    trace = air.fibonacci_sq_trace(63, 3141592)
    cfg = StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))
    trace_mont = jnp.asarray(fp.host_to_mont(trace))
    f_eval, _, _ = pr._phase1(cfg, trace_mont)
    return cfg, f_eval


def test_f_degree(setup):
    # reference: deg f = 1022 = trace_len − 1 (prover.rs:60-66)
    cfg, f_eval = setup
    assert _degree(f_eval, 0, cfg) == cfg.trace_len - 1


def test_constraint_degrees(setup):
    # reference asserts degrees 1021, 1021, 1023 (prover.rs:154-156):
    # boundary constraints trace_len − 2, transition trace_domain − 1.
    # Derived per-constraint from the pluggable AIR, exactly as
    # composition_eval builds its terms (minus the alpha weights).
    cfg, f_eval = setup
    c = pr.composition_constants(cfg)
    b = cfg.blowup
    shifted = {
        k: f_eval if k == 0 else jnp.roll(f_eval, -k * b) for k in cfg.air.shifts
    }
    degrees = []
    for con, inv_den in zip(cfg.constraints, c["inv_dens"]):
        if isinstance(con, air.Boundary):
            num = fp.sub(
                shifted[0],
                jnp.broadcast_to(pr._mont_scalar(con.value), f_eval.shape),
            )
        else:
            num = con.numerator(air.DeviceOps, lambda k: shifted[k], c["xs"])
        degrees.append(_degree(fp.mont_mul(num, inv_den), 0, cfg))
    assert degrees == [cfg.trace_len - 2, cfg.trace_len - 2, cfg.trace_domain - 1]


def test_fri_degree_schedule(setup):
    # reference prover.rs:228-251: degrees 1023→511→…→1→0 and sizes halving.
    cfg, f_eval = setup
    rng = np.random.default_rng(11)
    alphas = jnp.stack(
        [pr._mont_scalar(int(v)) for v in rng.integers(0, fp.P, 3)]
    )
    cp, _, _ = pr._phase2(cfg, f_eval, alphas)
    assert _degree(cp, 0, cfg) == cfg.trace_domain - 1
    evals = cp
    for layer in range(cfg.fri_rounds):
        beta = pr._mont_scalar(int(rng.integers(0, fp.P)))
        evals, _, _ = pr._fri_fold(cfg, layer, evals, beta)
        expect = (cfg.trace_domain >> (layer + 1)) - 1
        assert evals.shape[0] == cfg.eval_domain >> (layer + 1)
        assert _degree(evals, layer + 1, cfg) == expect
    # final layer is a constant polynomial: all evaluations equal
    final = np.asarray(evals)
    assert (final == final[0]).all()
