"""Trace + interpolation goldens lifted from the reference's inline asserts."""

import numpy as np

import jax.numpy as jnp

from zkstark_tpu import field as fp
from zkstark_tpu import ntt
from zkstark_tpu.protocol import air


def test_trace_endpoint_golden():
    # prover.rs:42: assert_eq!(a[1022].residue(), 2338775057)
    trace = air.fibonacci_sq_trace()
    assert trace.shape == (1023,)
    assert trace[0] == 1
    assert trace[1] == 3141592
    assert int(trace[1022]) == 2338775057


def test_interpolation_hits_all_points():
    # prover.rs:64-66: f(g[i]) == a[i] for all i <= 1022
    trace = air.fibonacci_sq_trace()
    coeffs = air.interpolate_trace(jnp.asarray(fp.host_to_mont(trace)), 1024)
    evals = np.asarray(fp.from_mont(ntt.ntt(coeffs, ntt.forward_plan(1024))))
    np.testing.assert_array_equal(evals[:1023], trace)
    # degree <= 1022: top INTT coefficient vanished by construction
    assert int(np.asarray(fp.from_mont(coeffs))[1023]) == 0


def test_lde_golden_values():
    # prover.rs:73-78: f_eval spot values on the coset 5*<h>, domain 8192
    trace = air.fibonacci_sq_trace()
    coeffs = air.interpolate_trace(jnp.asarray(fp.host_to_mont(trace)), 1024)
    f_eval = np.asarray(fp.from_mont(ntt.coset_ntt(coeffs, 8192, 5)))
    assert int(f_eval[0]) == 576067152
    assert int(f_eval[1]) == 3100214617
    assert int(f_eval[2]) == 2091264768
    assert int(f_eval[8189]) == 800520420
    assert int(f_eval[8190]) == 1199720174
    assert int(f_eval[8191]) == 1076821037
