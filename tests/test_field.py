"""Field-layer tests: uint32 Montgomery vector arithmetic vs exact Python ints.

Mirrors the reference's field semantics (field.rs:8-226) including the
generator-search result (generator()==5, noted at prover.rs:44) and the
subgroup-order structure pinned by generator_test (field.rs:213-226).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zkstark_tpu import field as fp
from zkstark_tpu.field.fp import _mul32_wide

rng = np.random.default_rng(0xF1E1D)


def rand_elems(n, lo=0, hi=fp.P):
    return rng.integers(lo, hi, size=n, dtype=np.uint64).astype(np.uint32)


class TestMontgomeryCore:
    def test_wide_mul_exact(self):
        a = rand_elems(4096, hi=1 << 32)
        b = rand_elems(4096, hi=1 << 32)
        hi, lo = _mul32_wide(jnp.asarray(a), jnp.asarray(b))
        full = a.astype(object) * b.astype(object)
        np.testing.assert_array_equal(
            np.asarray(hi), np.array([int(x) >> 32 for x in full], dtype=np.uint32)
        )
        np.testing.assert_array_equal(
            np.asarray(lo),
            np.array([int(x) & 0xFFFFFFFF for x in full], dtype=np.uint32),
        )

    def test_mont_mul_matches_bigint(self):
        a = rand_elems(8192)
        b = rand_elems(8192)
        am = fp.host_to_mont(a)
        bm = fp.host_to_mont(b)
        got = np.asarray(fp.from_mont(fp.mont_mul(jnp.asarray(am), jnp.asarray(bm))))
        want = (a.astype(np.uint64) * b.astype(np.uint64) % np.uint64(fp.P)).astype(
            np.uint32
        )
        np.testing.assert_array_equal(got, want)

    def test_mont_roundtrip(self):
        a = rand_elems(4096)
        back = np.asarray(fp.from_mont(fp.to_mont(jnp.asarray(a))))
        np.testing.assert_array_equal(back, a)

    def test_edge_values(self):
        edge = np.array([0, 1, 2, fp.P - 1, fp.P - 2, 1 << 30, 3 << 30], dtype=np.uint32)
        a = np.repeat(edge, len(edge))
        b = np.tile(edge, len(edge))
        got = np.asarray(
            fp.from_mont(
                fp.mont_mul(
                    jnp.asarray(fp.host_to_mont(a)), jnp.asarray(fp.host_to_mont(b))
                )
            )
        )
        want = (a.astype(np.uint64) * b.astype(np.uint64) % np.uint64(fp.P)).astype(
            np.uint32
        )
        np.testing.assert_array_equal(got, want)


class TestAddSub:
    def test_add_sub_neg(self):
        a = rand_elems(8192)
        b = rand_elems(8192)
        a64, b64, p64 = a.astype(np.uint64), b.astype(np.uint64), np.uint64(fp.P)
        np.testing.assert_array_equal(
            np.asarray(fp.add(jnp.asarray(a), jnp.asarray(b))),
            ((a64 + b64) % p64).astype(np.uint32),
        )
        np.testing.assert_array_equal(
            np.asarray(fp.sub(jnp.asarray(a), jnp.asarray(b))),
            ((a64 + p64 - b64) % p64).astype(np.uint32),
        )
        np.testing.assert_array_equal(
            np.asarray(fp.neg(jnp.asarray(a))), ((p64 - a64) % p64).astype(np.uint32)
        )


class TestPowInv:
    def test_pow_static(self):
        a = rand_elems(1024)
        for e in (0, 1, 2, 3, 7, 1024, 3145728, 393216):
            got = np.asarray(
                fp.from_mont(fp.pow_static(jnp.asarray(fp.host_to_mont(a)), e))
            )
            want = np.array(
                [pow(int(x), e, fp.P) for x in a], dtype=np.uint32
            )
            np.testing.assert_array_equal(got, want)

    def test_inv(self):
        a = rand_elems(2048, lo=1)
        am = jnp.asarray(fp.host_to_mont(a))
        prod = np.asarray(fp.from_mont(fp.mont_mul(am, fp.inv(am))))
        np.testing.assert_array_equal(prod, np.ones_like(a))

    def test_inv_of_zero_is_zero(self):
        # 0^(p-2) = 0: harmless, matches "no division by zero occurs in protocol".
        z = jnp.zeros(8, dtype=jnp.uint32)
        np.testing.assert_array_equal(np.asarray(fp.inv(z)), np.zeros(8, np.uint32))


class TestGeneratorStructure:
    def test_protocol_generator_is_5(self):
        # reference field.rs:52-86 computes this by trial; for F_3221225473 it is 5
        # (prover.rs:44). Verify 5 truly generates: 5^((p-1)/q) != 1 for q in {2,3}.
        for q in (2, 3):
            assert pow(5, (fp.P - 1) // q, fp.P) != 1

    def test_subgroup_generators(self):
        # prover.rs:48-53: g = 5^3145728 has order 1024, h = 5^393216 has order 8192.
        g = fp.subgroup_generator(1024)
        h = fp.subgroup_generator(8192)
        assert g == pow(5, 3145728, fp.P)
        assert h == pow(5, 393216, fp.P)
        assert pow(g, 1024, fp.P) == 1 and pow(g, 512, fp.P) != 1
        assert pow(h, 8192, fp.P) == 1 and pow(h, 4096, fp.P) != 1

    def test_two_adicity(self):
        assert (fp.P - 1) % (1 << fp.TWO_ADICITY) == 0
        assert (fp.P - 1) // (1 << fp.TWO_ADICITY) == 3


class TestGeneratorSearch:
    """The reference's generator()/order() algorithms (field.rs:45-86),
    property-tested over Gf<4391> exactly like its generator_test
    (field.rs:213-226)."""

    def test_generator_of_4391(self):
        p = 4391
        gen = fp.find_generator(p)
        assert fp.multiplicative_order(gen, p) == p - 1
        # the generator's powers enumerate every nonzero element exactly once
        seen = set()
        acc = 1
        for _ in range(p - 1):
            acc = acc * gen % p
            seen.add(acc)
        assert len(seen) == p - 1

    def test_protocol_field_generator_found_is_5(self):
        # prover.rs:44: the trial search over F_3221225473 lands on 5.
        assert fp.find_generator(fp.P) == 5

    def test_order_divides_group_order(self):
        p = 4391
        for x in (2, 3, 5, 7, 100, 4390):
            d = fp.multiplicative_order(x, p)
            assert (p - 1) % d == 0
            assert pow(x, d, p) == 1
            for q in fp._prime_factors(d):
                assert pow(x, d // q, p) != 1

    def test_order_of_subgroup_elements(self):
        # prover.rs:52-53 asserts orders 1024 and 8192 for g and h.
        assert fp.multiplicative_order(fp.subgroup_generator(1024)) == 1024
        assert fp.multiplicative_order(fp.subgroup_generator(8192)) == 8192
