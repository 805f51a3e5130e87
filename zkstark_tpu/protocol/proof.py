"""Proof container — mirrors reference Proof{state, data} (proof.rs:5-8)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Proof:
    state: bytes  # final channel state (32 bytes)
    data: bytes  # the serialized transcript

    def size(self) -> int:
        """Reference size(): 48-byte struct (32 + Box fat pointer) + data
        (proof.rs:151-154)."""
        return 48 + len(self.data)

    def to_bytes(self) -> bytes:
        """Stable on-disk form: state ‖ data (data length is implicit)."""
        return self.state + self.data

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Proof":
        if len(raw) < 32:
            raise ValueError("proof blob shorter than a channel state")
        return cls(state=raw[:32], data=raw[32:])
