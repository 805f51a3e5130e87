"""Native C++ runtime tests: channel equivalence and independent verification."""

import hashlib

import pytest

from zkstark_tpu import native as zn
from zkstark_tpu.protocol import STARK101, STARK101_SECRET, Proof, prove
from zkstark_tpu.protocol.verifier import VerificationError
from zkstark_tpu.transcript import Channel


@pytest.fixture(scope="module")
def lib():
    lib = zn.native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_channel_commit_matches_python(lib):
    state = b"\x00" * 32
    payload = b"hello zkstark" * 3
    want = hashlib.sha256(state + payload).digest()
    assert zn.channel_commit(state, payload) == want


def test_channel_draw_matches_python(lib):
    ch = Channel()
    ch.commit_hash(hashlib.sha256(b"seed").digest())
    py_state_before = ch.state
    py_draw = ch.get_u32()
    c_state, c_draw = zn.channel_draw(py_state_before)
    assert c_draw == py_draw
    assert c_state == ch.state


@pytest.fixture(scope="module")
def proof():
    return prove(STARK101, STARK101_SECRET)


def test_native_verify_accepts(lib, proof):
    zn.verify_native(proof, STARK101)  # raises on failure


def test_native_verify_rejects_tamper(lib, proof):
    for offset in (0, 40, 120, 5000, len(proof.data) - 1):
        raw = bytearray(proof.data)
        raw[offset] ^= 1
        with pytest.raises(VerificationError):
            zn.verify_native(Proof(state=proof.state, data=bytes(raw)), STARK101)


def test_native_verify_rejects_truncation(lib, proof):
    with pytest.raises(VerificationError):
        zn.verify_native(Proof(state=proof.state, data=proof.data[:2000]), STARK101)
