"""AIR (algebraic intermediate representation) framework + the FibonacciSq AIR.

The reference welds its three FibonacciSq constraints into the prover
(prover.rs:101-145) and duplicates them in the verifier (proof.rs:63-77).
Here an `Air` is a first-class pluggable object: it generates the witness
trace and declares an ordered list of constraints — `Boundary(step, value)`
and `Transition(numerator, exempt)` — from which the framework derives both
the device-side eval-form composition (batched inversions against
precomputed vanishing denominators, no polynomial division) and the
host-side point checks the verifier performs at each query.

Constraint numerators are written once against an `ops` namespace (mul/add/
sub/const) and run in two modes: vectorized Montgomery arrays on device, and
exact Python ints mod p on the verifier host — one source of truth for the
protocol math.

Reference semantics for FibonacciSq: prover.rs:32-39 builds a 1023-step trace
a[0]=1, a[1]=secret, a[i]=a[i-2]²+a[i-1]², then Lagrange-interpolates through
(g^i, a[i]) for i ≤ 1022 — an O(n³) CPU loop (polynomial.rs:337-383).

TPU-native replacement (SURVEY.md §7.1): the trace lives on the size-1024
subgroup ⟨g⟩ with the last point free. Since deg f ≤ 1022, the degree-1023
INTT coefficient must vanish; the INTT is linear in the unknown a[1023], so
one size-1024 INTT plus a rank-1 correction yields exactly the reference's
f_poly. Validated against the reference's own evaluation goldens
(prover.rs:73-78) and interpolation asserts (prover.rs:64-66).

Trace generation itself is an inherently sequential recurrence (a[i] depends
on a[i-1], a[i-2]); it is O(trace_len) scalar work, negligible next to the
O(n log n) device phases, and is done host-side with exact ints.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from zkstark_tpu.field import fp
from zkstark_tpu import ntt


def fibonacci_sq_trace(length: int = 1023, secret: int = 3141592) -> np.ndarray:
    """a[0]=1, a[1]=secret, a[i]=a[i-2]²+a[i-1]² over F_p (prover.rs:32-39)."""
    a = np.empty(length, dtype=np.uint32)
    prev2, prev1 = 1, secret % fp.P
    a[0] = prev2
    if length > 1:
        a[1] = prev1
    for i in range(2, length):
        cur = (prev2 * prev2 + prev1 * prev1) % fp.P
        a[i] = cur
        prev2, prev1 = prev1, cur
    return a


@functools.lru_cache(maxsize=None)
def _endpoint_basis(n: int):
    """Constants for the missing-point trick at subgroup size n.

    v = INTT(e_{n-1}) has v[j] = n^{-1}·g^{-(n-1)j}; we need the full vector
    (Montgomery form, device) and 1/v[n-1] (to solve for the free trace value).
    """
    with jax.ensure_compile_time_eval():
        return _endpoint_basis_impl(n)


def _endpoint_basis_impl(n: int):
    g = fp.subgroup_generator(n)
    g_inv = pow(g, fp.P - 2, fp.P)
    n_inv = pow(n, fp.P - 2, fp.P)
    base = pow(g_inv, n - 1, fp.P)
    v = (fp.host_powers(base, n).astype(np.uint64) * n_inv % fp.P).astype(np.uint32)
    v_last_inv = pow(int(v[n - 1]), fp.P - 2, fp.P)
    return (
        jnp.asarray(fp.host_to_mont(v)),
        jnp.uint32(fp.host_to_mont(np.array([v_last_inv], dtype=np.uint32))[0]),
    )


def interpolate_trace(trace_mont, n: int):
    """Coefficients (Montgomery form, natural order, degree ≤ n−2) of the unique
    poly through (g^i, trace[i]) for i < n−1 — the reference's lagrange()
    output (prover.rs:60-61) computed as one INTT + rank-1 correction.

    Last axis = the trace; leading axes are independent batch proofs (DP)."""
    assert trace_mont.shape[-1] == n - 1
    padded = jnp.concatenate(
        [trace_mont, jnp.zeros(trace_mont.shape[:-1] + (1,), dtype=jnp.uint32)],
        axis=-1,
    )
    c0 = ntt.intt(padded, ntt.inverse_plan(n))
    v, v_last_inv = _endpoint_basis(n)
    # choose the free endpoint a_{n-1} so that coefficient n−1 vanishes:
    #   c0[n−1] + a_{n-1}·v[n−1] = 0
    a_last = fp.mont_mul(fp.neg(c0[..., n - 1 : n]), v_last_inv)
    coeffs = fp.add(c0, fp.mont_mul(v, a_last))
    return coeffs
