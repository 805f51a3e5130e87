"""Batched SHA-256 on TPU: N independent hashes per call, pure uint32 VPU ops.

The reference calls a scalar SHA-256 ~33k times per proof for Merkle leaves
and nodes (merkle.rs:27-47). Every add/rotate/xor of the SHA-256 compression
function is a native uint32 vector op on the TPU VPU, so we hash the whole
batch (a full Merkle level) in one fused XLA program: states are (N, 8) and
message blocks are (N, 16) uint32 arrays.

Only the two fixed message shapes the protocol needs are provided:
  * `leaf_hash`    — a single 4-byte big-endian u32 (merkle.rs:30-34), one block;
  * `node_hash`    — 64 bytes = left‖right digests (merkle.rs:42-45), two blocks.
The sequential Fiat-Shamir channel chain stays on the host (hashlib): it is a
~40-hash serial dependency chain per proof, the wrong shape for a vector unit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


def compress(state, block):
    """One SHA-256 compression: state (..., 8), block (..., 16) uint32 arrays.

    The 48 schedule steps and 64 rounds run as `lax.fori_loop`s (compact XLA
    graph, static trip counts); each iteration is a handful of vector ops over
    the whole batch, so the loop overhead amortizes across lanes."""
    import jax

    # Derive the zero-fill and state init from `block` (value-preserving &0)
    # so every fori_loop carry has the same device-varying type under
    # shard_map — mixing replicated constants into the carry is a type error.
    zeros48 = jnp.repeat(block & jnp.uint32(0), 3, axis=-1)
    w0 = jnp.concatenate([block, zeros48], axis=-1)
    state = state + (block[..., :8] & jnp.uint32(0))

    def sched(t, w):
        w15 = jax.lax.dynamic_index_in_dim(w, t - 15, axis=-1, keepdims=False)
        w2 = jax.lax.dynamic_index_in_dim(w, t - 2, axis=-1, keepdims=False)
        w16 = jax.lax.dynamic_index_in_dim(w, t - 16, axis=-1, keepdims=False)
        w7 = jax.lax.dynamic_index_in_dim(w, t - 7, axis=-1, keepdims=False)
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> 3)
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> 10)
        nxt = w16 + s0 + w7 + s1
        return jax.lax.dynamic_update_index_in_dim(w, nxt, t, axis=-1)

    w = jax.lax.fori_loop(16, 64, sched, w0)
    k_arr = jnp.asarray(_K)

    def round_fn(t, carry):
        a, b, c, d, e, f, g, h = carry
        wt = jax.lax.dynamic_index_in_dim(w, t, axis=-1, keepdims=False)
        kt = jax.lax.dynamic_index_in_dim(k_arr, t, axis=0, keepdims=False)
        big_s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + big_s1 + ch + kt + wt
        big_s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = big_s0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    init = tuple(state[..., i] for i in range(8))
    out = jax.lax.fori_loop(0, 64, round_fn, init)
    return jnp.stack(out, axis=-1) + state


def leaf_hash(values):
    """SHA-256 of the 4-byte big-endian encoding of each uint32 value.

    Matches merkle.rs:30-34 (`hasher.update(v.to_be_bytes())`): one padded
    block [v, 0x80000000, 0×13, bitlen=32]. values: (N,) uint32 → (N, 8).

    Large batches route to the fused Pallas kernel (ops/sha256_kernel.py)."""
    from zkstark_tpu import ops

    n = values.shape[0]
    if ops.pallas_enabled():
        from zkstark_tpu.ops import sha256_kernel

        if n >= sha256_kernel.MIN_BATCH and n % sha256_kernel.MIN_BATCH == 0:
            return sha256_kernel.leaf_hash(values)
    z = jnp.zeros((n,), dtype=jnp.uint32)
    block = jnp.stack(
        [values, jnp.full((n,), 0x80000000, dtype=jnp.uint32)]
        + [z] * 13
        + [jnp.full((n,), 32, dtype=jnp.uint32)],
        axis=-1,
    )
    state = jnp.broadcast_to(jnp.asarray(_H0), (n, 8))
    return compress(state, block)


_PAD_BLOCK_512 = np.zeros(16, dtype=np.uint32)
_PAD_BLOCK_512[0] = 0x80000000
_PAD_BLOCK_512[15] = 512  # message length in bits: 64 bytes


def node_hash(left, right):
    """SHA-256 of left‖right digests (merkle.rs:42-45). (N,8),(N,8) → (N,8)."""
    n = left.shape[0]
    block1 = jnp.concatenate([left, right], axis=-1)
    state = compress(jnp.broadcast_to(jnp.asarray(_H0), (n, 8)), block1)
    block2 = jnp.broadcast_to(jnp.asarray(_PAD_BLOCK_512), (n, 16))
    return compress(state, block2)


def digest_to_bytes(digest: np.ndarray) -> bytes:
    """(8,) uint32 words → canonical 32-byte big-endian digest."""
    return np.asarray(digest, dtype=">u4").tobytes()


def bytes_to_digest(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=">u4").astype(np.uint32)
