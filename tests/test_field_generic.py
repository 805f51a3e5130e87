"""Field genericity: the framework is generic over the prime like the
reference's `Gf<const P: u32>` (field.rs:8, main.rs:13).

Mirrors the reference's own multi-prime tests — generator_test over Gf<4391>
(field.rs:213-226) — on DEVICE arrays, property-tests the generic Montgomery
REDC path against Python bigints on several primes, and runs the stark-101
statement END-TO-END over a second 2-adic prime (p = 15·2^27 + 1) with a
pinned self-golden, through every consumer: fused prover, legacy prover,
batched prover, mesh-sharded prover, Python verifier, and the native C++
verifier.
"""

import numpy as np
import pytest

from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, FIELD_ALT, field_for
from zkstark_tpu.protocol.config import STARK101, StarkConfig, alt_field_config
from zkstark_tpu.protocol.prover import prove
from zkstark_tpu.protocol.verifier import VerificationError, verify

PRIMES = [3221225473, 2013265921, 4391, 101, 7]


@pytest.mark.parametrize("p", PRIMES)
def test_mont_ops_vs_bigint(p):
    """mont_mul/add/sub/neg/inv/from_mont over F_p == exact Python ints."""
    f = field_for(p)
    rng = np.random.default_rng(p)
    a = rng.integers(0, p, 2048, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, p, 2048, dtype=np.uint64).astype(np.uint32)
    am, bm = f.host_to_mont(a), f.host_to_mont(b)
    prod = np.asarray(f.from_mont(f.mont_mul(am, bm)))
    np.testing.assert_array_equal(
        prod, (a.astype(np.uint64) * b % p).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(f.add(a, b)), ((a.astype(np.uint64) + b) % p).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(f.sub(a, b)),
        ((a.astype(np.uint64) + p - b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(f.neg(a)), ((p - a.astype(np.uint64)) % p).astype(np.uint32)
    )
    # Fermat inverse on the nonzero elements
    inv = np.asarray(f.from_mont(f.inv(f.to_mont(a))))
    for i in np.where(a % p != 0)[0][:64]:
        assert int(inv[i]) * int(a[i]) % p == 1


def test_gf4391_generator_mirror():
    """The reference's generator_test (field.rs:213-226) over Gf<4391>:
    the generator has order 4390 and its powers enumerate every nonzero
    element exactly once — here with the generator found by the same trial
    algorithm and the order checks run on DEVICE field ops."""
    f = field_for(4391)
    g = f.generator
    assert f.multiplicative_order(g) == 4390
    # device-side: g^((p-1)/q) != 1 for q in {2, 5, 439}; g^(p-1) == 1
    gm = f.to_mont(np.uint32(g))
    one = np.uint32(f.r_mod_p)
    for q in fp._prime_factors(4390):
        assert int(np.asarray(f.pow_static(gm, 4390 // q))) != one
    assert int(np.asarray(f.pow_static(gm, 4390))) == one
    # powers enumerate all nonzero elements exactly once (host ints)
    seen = set()
    x = 1
    for _ in range(4390):
        x = x * g % 4391
        seen.add(x)
    assert len(seen) == 4390


def test_generic_redc_env_lever_matches():
    """The generic _mul32_hi REDC path and the p=3·2^30+1 _mp_hi shortcut
    agree bit-for-bit (the spec path is only auto-selected for that prime)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.integers(0, 1 << 32, 4096, dtype=np.uint64).astype(np.uint32))
    spec = np.asarray(fp._mp_hi(m))
    gen = np.asarray(fp._mul32_hi(m, FIELD101.p_u32))
    np.testing.assert_array_equal(spec, gen)


def test_alt_field_not_spec():
    assert not FIELD_ALT.spec_mp_hi and FIELD101.spec_mp_hi
    assert FIELD_ALT.two_adicity == 27
    assert FIELD_ALT.generator == 31


# ---------------------------------------------------------------------------
# End-to-end over the second prime
# ---------------------------------------------------------------------------

ALT_SECRET = 3141592
# Self-golden, pinned from the first verified run (fused == legacy == sharded;
# accepted by the Python AND native C++ verifiers). Guards the generic-field
# path against drift exactly like the stark-101 goldens guard the default.
ALT_STATE_HEX = "3763466e7ed2695db9b9a28e8e188fbefd3ae9c014cda34b519c9155b41deeb5"
ALT_PROOF_LEN = 7836


@pytest.fixture(scope="module")
def alt_cfg():
    return alt_field_config()


@pytest.fixture(scope="module")
def alt_proof(alt_cfg):
    return prove(alt_cfg, ALT_SECRET)


def test_alt_field_prove_golden(alt_cfg, alt_proof):
    assert len(alt_proof.data) == ALT_PROOF_LEN
    assert alt_proof.state.hex() == ALT_STATE_HEX


def test_alt_field_verify(alt_cfg, alt_proof):
    verify(alt_proof, alt_cfg)
    # negative: a flipped byte must fail
    raw = bytearray(alt_proof.data)
    raw[100] ^= 1
    from zkstark_tpu.protocol.proof import Proof

    with pytest.raises(VerificationError):
        verify(Proof(state=alt_proof.state, data=bytes(raw)), alt_cfg)


def test_alt_field_native_verify(alt_cfg, alt_proof):
    from zkstark_tpu import native as zn

    if zn.native() is None:
        pytest.skip("no native toolchain")
    zn.verify_native(alt_proof, alt_cfg)


def test_alt_field_legacy_path_identical(alt_cfg, alt_proof):
    legacy = prove(alt_cfg, ALT_SECRET, fused=False)
    assert legacy.data == alt_proof.data and legacy.state == alt_proof.state


def test_alt_field_sharded_identical(alt_cfg, alt_proof):
    import jax
    from jax.sharding import Mesh

    from zkstark_tpu.parallel.mesh import DOMAIN_AXIS

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), (DOMAIN_AXIS,))
    sharded = prove(alt_cfg, ALT_SECRET, mesh=mesh)
    assert sharded.data == alt_proof.data and sharded.state == alt_proof.state


def test_alt_field_batched_identical(alt_cfg, alt_proof):
    from zkstark_tpu.protocol.batch import prove_batch

    proofs = prove_batch(alt_cfg, [ALT_SECRET] * 3)
    for pr in proofs:
        assert pr.data == alt_proof.data and pr.state == alt_proof.state


def test_wrong_field_rejects():
    """A stark-101 proof must NOT verify under the alt-field config (the
    challenge replay diverges immediately)."""
    proof = prove(STARK101, 3141592)
    bad_cfg = StarkConfig(field=FIELD_ALT, boundary_last=STARK101.boundary_last % FIELD_ALT.p)
    with pytest.raises(VerificationError):
        verify(proof, bad_cfg)


def test_two_adicity_guard():
    """A domain needing more 2-adicity than p-1 has must be rejected loudly."""
    trace = np.zeros(3, np.uint32)  # content irrelevant — config should assert
    with pytest.raises(AssertionError, match="2-adicity"):
        StarkConfig(trace_len=1023, blowup=8, field=field_for(4391))
