"""bincode-1.3 compatible framing for the proof transcript.

The reference serializes every committed value with bincode's legacy config
(Cargo.toml:10-11, channel.rs:20): fixed-width little-endian integers, raw
fixed-size arrays, u64 length prefixes for slices, tuples concatenated.
The transcript layout is I/O, not compute, so this lives host-side
(SURVEY.md §2 native-dependency table). A C++ twin lives in native/ for the
runtime path.

Shapes used by the protocol:
  * Hash  = [u8; 32]            → 32 raw bytes, no prefix
  * u32                         → 4 bytes LE
  * AuthPath = Box<[Hash]>      → u64 LE count + count·32 raw bytes
  * tuples                      → fields concatenated in order
"""

from __future__ import annotations

import struct


def ser_u32(v: int) -> bytes:
    return struct.pack("<I", v & 0xFFFFFFFF)


def ser_u64(v: int) -> bytes:
    return struct.pack("<Q", v)


def ser_hash(h: bytes) -> bytes:
    assert len(h) == 32
    return h


def ser_auth_path(path: list) -> bytes:
    out = [ser_u64(len(path))]
    for h in path:
        assert len(h) == 32
        out.append(h)
    return b"".join(out)


def ser_opening(value: int, path: list) -> bytes:
    """(u32, AuthPath) — the trace decommitment tuple (prover.rs:274-277)."""
    return ser_u32(value) + ser_auth_path(path)


def ser_fri_opening(v0: int, v1: int, path0: list, path1: list) -> bytes:
    """(u32, u32, AuthPath, AuthPath) — FRI decommitment (prover.rs:288)."""
    return ser_u32(v0) + ser_u32(v1) + ser_auth_path(path0) + ser_auth_path(path1)


class Reader:
    """Sequential deserializer over the transcript (verify side, proof.rs:16-46)."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._data):
            raise ValueError(
                f"transcript truncated: need {n} bytes at offset {self._pos}, "
                f"have {len(self._data) - self._pos}"
            )
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        return out

    def u32(self) -> int:
        return struct.unpack("<I", self._take(4))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self._take(8))[0]

    def hash(self) -> bytes:
        return self._take(32)

    def auth_path(self) -> list:
        n = self.u64()
        if n > 64:
            raise ValueError(f"auth path length {n} implausible")
        return [self._take(32) for _ in range(n)]

    def opening(self):
        return self.u32(), self.auth_path()

    def fri_opening(self):
        return self.u32(), self.u32(), self.auth_path(), self.auth_path()

    @property
    def exhausted(self) -> bool:
        return self._pos == len(self._data)

    @property
    def remaining(self) -> int:
        return len(self._data) - self._pos
