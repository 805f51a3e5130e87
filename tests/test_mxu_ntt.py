"""MXU matmul NTT (ops/mxu_ntt.py): exactness of the limb-matrix DFT and
bit-identity with the radix-2 path — the correctness contract behind both
the ≤2^26 A/B lever and the automatic >2^26 four-step extension.

Runs the REAL production code on CPU: the bf16 matmul exactness bound
(255²·256 < 2^24) is dtype math, not hardware-specific."""

import numpy as np
import pytest

import jax.numpy as jnp

from zkstark_tpu import ntt
from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, FIELD_ALT
from zkstark_tpu.ops import mxu_ntt


@pytest.mark.parametrize("field", [FIELD101, FIELD_ALT])
@pytest.mark.parametrize("m", [64, 1024, 4096])
def test_col_transform_matches_radix2(field, m):
    rng = np.random.default_rng(m)
    L = 8
    x = rng.integers(0, field.p, (m, L), dtype=np.uint64).astype(np.uint32)
    xm = jnp.asarray(field.host_to_mont(x))
    w = field.subgroup_generator(m)
    got = np.asarray(mxu_ntt.col_transform_mxu(xm, w, field))
    want = np.asarray(ntt.ntt(xm.T, ntt.make_plan(m, w, field=field)).T)
    np.testing.assert_array_equal(got, want)


def test_radix128_chunked_contraction():
    """k=128 chunks the contraction into two exact-f32 matmuls (the bound
    255²·512 would NOT be exact unchunked) — pins the chunked path that
    carries the four-step past 2^26."""
    field = FIELD101
    m = 16384  # k1 = k2 = 128
    rng = np.random.default_rng(1)
    x = rng.integers(0, field.p, (m, 2), dtype=np.uint64).astype(np.uint32)
    xm = jnp.asarray(field.host_to_mont(x))
    w = field.subgroup_generator(m)
    got = np.asarray(mxu_ntt.col_transform_mxu(xm, w, field))
    want = np.asarray(ntt.ntt(xm.T, ntt.make_plan(m, w, field=field)).T)
    np.testing.assert_array_equal(got, want)


def test_dft_matmul_vs_bigint():
    """Straight y[i] = Σ w^{ij} x[j] mod p against exact Python ints."""
    field = FIELD101
    k = 64
    rng = np.random.default_rng(2)
    x = rng.integers(0, field.p, (k, 3), dtype=np.uint64).astype(np.uint32)
    xm = jnp.asarray(field.host_to_mont(x))
    w = field.subgroup_generator(k)
    got = np.asarray(field.from_mont(mxu_ntt.dft_matmul(xm, k, w, field, 0)))
    for i in range(k):
        for c in range(3):
            want = sum(
                pow(w, i * j, field.p) * int(x[j, c]) for j in range(k)
            ) % field.p
            assert int(got[i, c]) == want


def test_fourstep_supported_extends_past_2e26():
    from zkstark_tpu.ops import ntt_kernel

    assert ntt_kernel.fourstep_supported(1 << 26)
    assert ntt_kernel.fourstep_supported(1 << 27)  # MXU route
    assert ntt_kernel.fourstep_supported(1 << 28)  # MXU route
    assert not ntt_kernel.fourstep_supported(1 << 29)  # n1 = 2^15 > 16384
