"""Four-step Pallas NTT vs the radix-2 jnp path — bit-exact.

The column-kernel body runs via ops.testing.emulate_kernel with `pltpu.roll`
patched to `jnp.roll` (identical semantics); the four-step composition is then
checked end-to-end through the same emulation. Exact field arithmetic means
equality must hold to the bit.
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from zkstark_tpu.field import fp
import zkstark_tpu.ntt.core as ntt_mod
from zkstark_tpu.ops import ntt_kernel, testing


@pytest.fixture(autouse=True)
def jnp_roll(monkeypatch):
    monkeypatch.setattr(ntt_kernel, "_roll", jnp.roll)


def _rand_mont(n, seed=7):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, fp.P, n, dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(fp.host_to_mont(vals))


def _jnp_ntt(x, plan):
    """The pure radix-2 path, bypassing the pallas dispatch."""
    y = jnp.take(x, plan.bitrev, axis=-1)
    return ntt_mod._butterflies(y, plan)


def _emulated_fourstep(x, n, w, inverse_scale=None, pease=False):
    c = ntt_kernel._fourstep_constants(n, w, inverse_scale)
    if pease:
        a_br = testing.emulate_kernel(
            functools.partial(ntt_kernel._ntt_cols_pease_kernel, fp.FIELD101),
            (c.n1, c.n2),
            jnp.uint32,
            x.reshape(c.n1, c.n2),
            c.twp1,
        )
        a = jnp.take(a_br, c.br1, axis=0)
        b = ntt_kernel._apply_twiddle(a, c.u, c.v)
        d_br = testing.emulate_kernel(
            functools.partial(ntt_kernel._ntt_cols_pease_kernel, fp.FIELD101), (c.n2, c.n1), jnp.uint32, b.T, c.twp2
        )
        return jnp.take(d_br, c.br2, axis=0).reshape(n)
    xb = jnp.take(x.reshape(c.n1, c.n2), c.br1, axis=0)
    a = testing.emulate_kernel(
        functools.partial(ntt_kernel._ntt_cols_kernel, fp.FIELD101), (c.n1, c.n2), jnp.uint32, xb, c.tw1
    )
    b = ntt_kernel._apply_twiddle(a, c.u, c.v)
    bt = jnp.take(b.T, c.br2, axis=0)
    d = testing.emulate_kernel(
        functools.partial(ntt_kernel._ntt_cols_kernel, fp.FIELD101), (c.n2, c.n1), jnp.uint32, bt, c.tw2
    )
    return d.reshape(n)


def test_cols_kernel_single_transform():
    """(m, lanes) column transforms == batched radix-2 row transforms."""
    m, lanes = 512, 128
    x = _rand_mont(m * lanes).reshape(m, lanes)
    plan = ntt_mod.forward_plan(m)
    tw = jnp.asarray(ntt_kernel._stage_twiddle_table(m, plan.root))
    xb = jnp.take(x, jnp.asarray(ntt_mod.bit_reverse_indices(m)), axis=0)
    got = testing.emulate_kernel(
        functools.partial(ntt_kernel._ntt_cols_kernel, fp.FIELD101), (m, lanes), jnp.uint32, xb, tw
    )
    want = ntt_mod.ntt(x.T, plan).T  # row transforms of the transpose
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pease_cols_kernel_single_transform():
    """Pease kernel: natural input rows → bit-reversed output rows."""
    m, lanes = 512, 128
    x = _rand_mont(m * lanes).reshape(m, lanes)
    plan = ntt_mod.forward_plan(m)
    tw = jnp.asarray(ntt_kernel._pease_twiddle_table(m, plan.root))
    got = testing.emulate_kernel(
        functools.partial(ntt_kernel._ntt_cols_pease_kernel, fp.FIELD101), (m, lanes), jnp.uint32, x, tw
    )
    br = jnp.asarray(ntt_mod.bit_reverse_indices(m))
    want = jnp.take(ntt_mod.ntt(x.T, plan).T, br, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pease", [False, True])
@pytest.mark.parametrize("n", [1 << 14, 1 << 16])
def test_fourstep_matches_radix2(n, pease):
    x = _rand_mont(n)
    plan = ntt_mod.forward_plan(n)
    got = _emulated_fourstep(x, n, plan.root, pease=pease)
    want = _jnp_ntt(x, plan)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("pease", [False, True])
def test_fourstep_inverse_roundtrip(pease):
    n = 1 << 14
    x = _rand_mont(n)
    fwd = ntt_mod.forward_plan(n)
    inv = ntt_mod.inverse_plan(n)
    y = _emulated_fourstep(x, n, fwd.root, pease=pease)
    back = _emulated_fourstep(
        y, n, pow(fwd.root, fp.P - 2, fp.P), inverse_scale=inv.scale_mont, pease=pease
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
