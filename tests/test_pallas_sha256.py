"""Pallas SHA-256 kernel bodies vs the jnp implementation and hashlib.

Kernel bodies run via ops.testing.emulate_kernel (same traced computation the
Mosaic compiler sees; interpret mode is too slow for these straight-line
kernels on CPU). Equality with the jnp twin — itself pinned to the reference's
hard-coded digests (merkle.rs:112-182) in tests/test_merkle.py — carries the
golden contract over. The BlockSpec/grid plumbing is exercised on real TPU by
bench.py and the prover path.
"""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from zkstark_tpu.hash import sha256
from zkstark_tpu.ops import sha256_kernel, testing

N = 1024


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(42)
    return rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)


def test_leaf_kernel_matches_jnp_and_hashlib(values):
    planes = testing.emulate_kernel(
        sha256_kernel._leaf_kernel,
        (8, N // 128, 128),
        jnp.uint32,
        jnp.asarray(values).reshape(N // 128, 128),
    )
    got = np.asarray(planes.reshape(8, N).T)
    want = np.asarray(sha256.leaf_hash(jnp.asarray(values)))
    np.testing.assert_array_equal(got, want)
    for i in (0, 17, N - 1):
        ref = hashlib.sha256(int(values[i]).to_bytes(4, "big")).digest()
        assert sha256.digest_to_bytes(got[i]) == ref


def test_node_kernel_matches_jnp_and_hashlib(values):
    left = sha256.leaf_hash(jnp.asarray(values))
    right = sha256.leaf_hash(jnp.asarray(values[::-1].copy()))
    pairs = jnp.concatenate([left, right], axis=-1)  # (N, 16)
    planes = testing.emulate_kernel(
        sha256_kernel._node_kernel,
        (8, N // 128, 128),
        jnp.uint32,
        pairs.T.reshape(16, N // 128, 128),
    )
    got = np.asarray(planes.reshape(8, N).T)
    want = np.asarray(sha256.node_hash(left, right))
    np.testing.assert_array_equal(got, want)
    lb = sha256.digest_to_bytes(np.asarray(left[3]))
    rb = sha256.digest_to_bytes(np.asarray(right[3]))
    assert sha256.digest_to_bytes(got[3]) == hashlib.sha256(lb + rb).digest()


def test_pad_schedule_constant():
    """The precomputed second-block schedule must equal a live expansion."""
    w16 = [jnp.full((1, 1), int(v), jnp.uint32) for v in sha256_kernel._PAD]
    live = sha256_kernel._schedule(w16)
    for t in range(64):
        want = (int(live[t][0, 0]) + int(sha256_kernel._K[t])) & 0xFFFFFFFF
        assert int(sha256_kernel._PAD_WK[t]) == want
