from zkstark_tpu.protocol.config import STARK101, STARK101_Q3, STARK101_SECRET, StarkConfig
from zkstark_tpu.protocol.proof import Proof
from zkstark_tpu.protocol.prover import ProverArtifacts, prove, prove_pipelined
from zkstark_tpu.protocol.verifier import VerificationError, VerifyReport, verify

__all__ = [
    "StarkConfig",
    "STARK101",
    "STARK101_Q3",
    "STARK101_SECRET",
    "Proof",
    "prove",
    "prove_pipelined",
    "ProverArtifacts",
    "verify",
    "VerificationError",
    "VerifyReport",
]
