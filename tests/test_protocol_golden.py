"""End-to-end golden-transcript tests: the bit-exactness contract.

Every value here was derived by a byte-exact replay of the reference pipeline
validated against all of its inline asserts (SURVEY.md §6 / BASELINE.md):
Merkle roots, Fiat-Shamir challenges, free term, query point, transcript size,
and the final channel state must match the reference's output exactly.
"""

import hashlib

import pytest

from zkstark_tpu.protocol import (
    STARK101,
    STARK101_SECRET,
    Proof,
    VerificationError,
    prove,
    verify,
)
from zkstark_tpu.protocol.prover import ProverArtifacts
from zkstark_tpu.transcript import bincode

F_ROOT = "e7090678303730d51aee399664256de5f6476ec86fb4d45fbf0556535fb09f48"
CP_ROOT = "3607a328263e286599ab2e932debf372d39c88b0fdb349d58846e187ab7fb55d"
ALPHAS = [361545003, 3235878091, 2708123352]
BETAS = [
    4195595581, 3610452991, 724415084, 3295998851, 738561939,
    3410211472, 11579057, 583424291, 2291229637, 890278089,
]
FREE_TERM = 1478590336
QUERY_POINT = 7267
FINAL_STATE = "d7eec91544f72a592145e7d505a2f274de740e0319ede8c983fd84c7736f6712"
TRANSCRIPT_LEN = 7836


@pytest.fixture(scope="module")
def proof_and_artifacts():
    art = ProverArtifacts()
    proof = prove(STARK101, STARK101_SECRET, artifacts=art)
    return proof, art


def test_transcript_layout(proof_and_artifacts):
    proof, art = proof_and_artifacts
    assert len(proof.data) == TRANSCRIPT_LEN
    assert proof.size() == TRANSCRIPT_LEN + 48  # reference prints 7884

    r = bincode.Reader(proof.data)
    assert r.hash().hex() == F_ROOT
    assert [r.u32() for _ in range(3)] == ALPHAS
    assert r.hash().hex() == CP_ROOT
    for i in range(10):
        assert r.u32() == BETAS[i]
        r.hash()
    assert r.u32() == FREE_TERM
    assert r.u32() % 8176 == QUERY_POINT
    assert art.query_index == QUERY_POINT


def test_final_state(proof_and_artifacts):
    """Recompute the full channel hash chain from the raw transcript bytes,
    independently of Channel/ReplayChannel: split the transcript into the
    commit-order payloads (channel.rs:19-26 framing) and chain SHA-256."""
    proof, _ = proof_and_artifacts
    assert proof.state.hex() == FINAL_STATE

    r = bincode.Reader(proof.data)
    payloads = [r.hash()]  # f root
    payloads += [bincode.ser_u32(r.u32()) for _ in range(3)]  # alphas
    payloads.append(r.hash())  # cp root
    for _ in range(10):
        payloads.append(bincode.ser_u32(r.u32()))  # beta
        payloads.append(r.hash())  # layer root
    payloads.append(bincode.ser_u32(r.u32()))  # free term
    payloads.append(bincode.ser_u32(r.u32()))  # query draw
    for _ in range(4):
        payloads.append(bincode.ser_opening(*r.opening()))
    for _ in range(10):
        payloads.append(bincode.ser_fri_opening(*r.fri_opening()))
    assert r.exhausted

    state = b"\x00" * 32
    for payload in payloads:
        state = hashlib.sha256(state + payload).digest()
    assert state == proof.state


def test_verify_accepts(proof_and_artifacts):
    proof, _ = proof_and_artifacts
    report = verify(proof, STARK101)
    assert report.checks_passed == [
        "transcript-replay",
        "composition-identity",
        "trace-auth-paths",
        "fri-consistency",
        "fri-auth-paths",
    ]


def test_proof_roundtrip_bytes(proof_and_artifacts):
    proof, _ = proof_and_artifacts
    blob = proof.to_bytes()
    back = Proof.from_bytes(blob)
    assert back == proof
    verify(back, STARK101)


def test_tampered_proof_rejected(proof_and_artifacts):
    """Fault injection (absent in the reference, SURVEY.md §5): flipping any
    byte region must fail verification with a structured error."""
    proof, _ = proof_and_artifacts
    for offset in (0, 33, 80, 500, 4000, len(proof.data) - 1):
        raw = bytearray(proof.data)
        raw[offset] ^= 0x01
        with pytest.raises(VerificationError):
            verify(Proof(state=proof.state, data=bytes(raw)), STARK101)


def test_truncated_proof_rejected(proof_and_artifacts):
    proof, _ = proof_and_artifacts
    with pytest.raises(VerificationError):
        verify(Proof(state=proof.state, data=proof.data[:1000]), STARK101)


def test_wrong_witness_rejected():
    with pytest.raises(ValueError, match="boundary"):
        prove(STARK101, secret=123456)
