"""zkstark_tpu — a TPU-native STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Rust stark-101 prover (Crocodoctopus/zkstark, mounted at /root/reference):
FibonacciSq trace → low-degree extension → constraint composition → FRI →
SHA-256 Merkle commitments → Fiat-Shamir transcript, producing proofs that are
byte-identical to the reference's transcript while running every hot loop as
vectorized TPU programs (NTT instead of O(n³) Lagrange, evaluation-form
constraints instead of polynomial long division, batched hash kernels instead
of scalar SHA-256).
"""

__version__ = "0.1.0"
