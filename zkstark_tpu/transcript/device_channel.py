"""Device-resident Fiat-Shamir: the channel hash chain as XLA ops.

The channel (channel.rs:19-32) is a serial SHA-256 chain; run on the host it
forces a device→host→device round trip at every phase boundary (13 per proof).
Running the same chain *on device* — state as an (8,) uint32 word vector,
commits as one or two SHA-256 compressions — lets the whole prover (phases
1–3 and every challenge derivation) compile into ONE XLA program with a single
host sync at the end. The chain is ~40 scalar-width hashes; its compute is
trivial, its value is eliminating latency.

Byte conventions preserved exactly:
  * state words = the 32-byte state interpreted as 8 big-endian u32s (the
    native SHA-256 word order, sha256.digest_to_bytes);
  * commit(hash): payload is 32 raw bytes (bincode [u8;32] framing adds
    nothing), message = state ‖ payload = 64 bytes → 2 compressions;
  * get_u32(): draw = state word 0 (big-endian first 4 bytes, channel.rs:29),
    self-committed as 4 *little-endian* bytes (bincode u32) — as a message
    word that is bswap32(draw); message = 36 bytes → 1 compression.
"""

from __future__ import annotations

import jax.numpy as jnp

from zkstark_tpu.field import fp
from zkstark_tpu.hash import sha256

_H0 = None


def _h0():
    global _H0
    if _H0 is None:
        _H0 = jnp.asarray(sha256._H0)
    return _H0


def zero_state():
    """The channel's initial all-zero 32-byte state (channel.rs:13-16)."""
    return jnp.zeros((8,), dtype=jnp.uint32)


def bswap32(x):
    return (
        ((x & jnp.uint32(0xFF)) << 24)
        | ((x & jnp.uint32(0xFF00)) << 8)
        | ((x >> 8) & jnp.uint32(0xFF00))
        | (x >> 24)
    )


_PAD512 = None


def _pad512():
    global _PAD512
    if _PAD512 is None:
        import numpy as np

        blk = np.zeros(16, dtype=np.uint32)
        blk[0] = 0x80000000
        blk[15] = 512
        _PAD512 = jnp.asarray(blk)
    return _PAD512


def absorb_hash(state, digest):
    """state' = SHA256(state ‖ digest): 64-byte message, two compressions."""
    block = jnp.concatenate([state, digest])
    mid = sha256.compress(_h0(), block)
    return sha256.compress(mid, _pad512())


def absorb_u32_le(state, word):
    """state' = SHA256(state ‖ LE(word)): 36-byte message, one compression."""
    z = jnp.zeros((1,), dtype=jnp.uint32)
    block = jnp.concatenate(
        [
            state,
            bswap32(word).reshape(1),
            jnp.full((1,), 0x80000000, dtype=jnp.uint32),
            z,
            z,
            z,
            z,
            z,
            jnp.full((1,), 36 * 8, dtype=jnp.uint32),
        ]
    )
    return sha256.compress(_h0(), block)


def draw_u32(state):
    """(draw, state'): draw = state word 0, then self-commit its LE bytes
    (channel.rs:28-32)."""
    draw = state[0]
    return draw, absorb_u32_le(state, draw)


def draw_to_mont(draw):
    """Challenge u32 → Montgomery field element (reference From<u32>: value
    mod p). to_mont is a single REDC, valid for any uint32 input."""
    return fp.to_mont(draw)
