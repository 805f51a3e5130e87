"""Device-resident Fiat-Shamir: the channel hash chain as XLA ops.

The channel (channel.rs:19-32) is a serial SHA-256 chain; run on the host it
forces a device→host→device round trip at every phase boundary (13 per proof).
Running the same chain *on device* — state as an (…, 8) uint32 word vector,
commits as one or two SHA-256 compressions — lets the whole prover (phases
1–3 and every challenge derivation) compile into ONE XLA program with a single
host sync at the end (protocol/fused.py). The chain is ~40 scalar-width
hashes; its compute is trivial, its value is eliminating latency.

All functions treat the LAST axis as the state/digest words; leading axes are
independent channels — B data-parallel proofs run B chains in lockstep
(protocol/batch.py).

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
import numpy as np

from zkstark_tpu.field import fp
from zkstark_tpu.hash import sha256

# numpy constants: safe to close over inside any jit trace (a cached jnp
# array created during one trace would leak that trace's tracer into the next)
def _h0():
    return sha256._H0


def zero_state(batch_shape: tuple = ()):
    """The channel's initial all-zero 32-byte state (channel.rs:13-16)."""
    return jnp.zeros(batch_shape + (8,), dtype=jnp.uint32)


def bswap32(x):
    return (
        ((x & jnp.uint32(0xFF)) << 24)
        | ((x & jnp.uint32(0xFF00)) << 8)
        | ((x >> 8) & jnp.uint32(0xFF00))
        | (x >> 24)
    )


_PAD512_NP = np.zeros(16, dtype=np.uint32)
_PAD512_NP[0] = 0x80000000
_PAD512_NP[15] = 512


def _pad512():
    return _PAD512_NP


def absorb_hash(state, digest):
    """state' = SHA256(state ‖ digest): 64-byte message, two compressions."""
    block = jnp.concatenate([state, digest], axis=-1)
    mid = sha256.compress(_h0(), block)
    return sha256.compress(mid, jnp.broadcast_to(_pad512(), state.shape[:-1] + (16,)))


def absorb_u32_le(state, word):
    """state' = SHA256(state ‖ LE(word)): 36-byte message, one compression.

    word: scalar or batch matching state's leading axes."""
    lead = state.shape[:-1]
    w = jnp.broadcast_to(bswap32(jnp.asarray(word, dtype=jnp.uint32)), lead)
    z = jnp.zeros(lead + (1,), dtype=jnp.uint32)
    block = jnp.concatenate(
        [
            state,
            w[..., None],
            jnp.full(lead + (1,), 0x80000000, dtype=jnp.uint32),
            z,
            z,
            z,
            z,
            z,
            jnp.full(lead + (1,), 36 * 8, dtype=jnp.uint32),
        ],
        axis=-1,
    )
    return sha256.compress(_h0(), block)


def draw_u32(state):
    """(draw, state'): draw = state word 0, then self-commit its LE bytes
    (channel.rs:28-32). draw has the state's leading (batch) shape."""
    draw = state[..., 0]
    return draw, absorb_u32_le(state, draw)


def draw_to_mont(draw, field: fp.Field = fp.FIELD101):
    """Challenge u32 → Montgomery field element (reference From<u32>: value
    mod p). to_mont is a single REDC, valid for any uint32 input."""
    return fp.to_mont_f(field, draw)
