"""Protocol configuration.

The reference hardcodes every constant as a literal scattered across files
(SURVEY.md §5 config): trace length 1023 + secret (prover.rs:32-39), generator
exponents (prover.rs:48-49), domain 8192 / blowup 8, 10 FRI rounds
(prover.rs:198), query range 8176 (prover.rs:263), boundary values duplicated
in the verifier (proof.rs:69-70), one hardwired query (prover.rs:263) and the
FibonacciSq constraints welded into both sides (prover.rs:101-145 /
proof.rs:63-77). Here they live in one frozen dataclass: the AIR is a
pluggable object (protocol/air.py), the query count is a parameter, and the
stark-101 instance is the golden preset. Mesh/topology configuration is kept
separate (parallel/mesh.py) so the same proof is byte-identical at any
sharding.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, FIELD_ALT, Field
from zkstark_tpu.protocol.air import FIBONACCI_SQ, Air


@dataclass(frozen=True)
class StarkConfig:
    trace_len: int = 1023  # number of trace steps (subgroup size − 1)
    blowup: int = 8
    coset_offset: int = 5  # prover.rs:69: evaluation coset = offset·⟨h⟩
    boundary_first: int = 1  # public input a[0] (proof.rs:69)
    boundary_last: int = 2338775057  # public output a[trace_len−1] (proof.rs:70)
    n_queries: int = 1  # FRI query count (reference draws exactly 1, prover.rs:263)
    air: Air = dc_field(default=FIBONACCI_SQ)  # the constraint system + witness gen
    # The protocol prime, as a first-class config axis — the reference is
    # generic over `Gf<const P: u32>` (field.rs:8, main.rs:13) and its tests
    # instantiate other primes (field.rs:213-226). Any odd p < 2^32 with
    # enough 2-adicity for the domain works end-to-end.
    field: Field = dc_field(default=FIELD101)

    def __post_init__(self):
        n = self.trace_domain
        p = self.field.p
        assert n & (n - 1) == 0, "trace domain must be a power of two"
        assert self.blowup & (self.blowup - 1) == 0, "blowup must be a power of two"
        assert (p - 1) % self.eval_domain == 0, (
            f"domain {self.eval_domain} too large for field: needs 2-adicity "
            f"{self.eval_domain.bit_length() - 1}, p-1 has {self.field.two_adicity}"
        )
        # the coset offset·⟨h⟩ must be disjoint from ⟨h⟩ (else the vanishing
        # denominators hit zero on the evaluation domain)
        assert pow(self.coset_offset, self.eval_domain, p) != 1, (
            "coset offset lies in the evaluation subgroup"
        )
        assert 0 <= self.boundary_first < p and 0 <= self.boundary_last < p
        assert self.n_queries >= 1

    @property
    def trace_domain(self) -> int:
        """Size of the trace subgroup ⟨g⟩ (reference: 1024, prover.rs:52)."""
        return self.trace_len + 1

    @property
    def eval_domain(self) -> int:
        """Size of the evaluation coset (reference: 8192, prover.rs:53)."""
        return self.trace_domain * self.blowup

    @property
    def fri_rounds(self) -> int:
        """Folds until degree 0: log2(trace_domain) (reference: 10, prover.rs:198)."""
        return self.trace_domain.bit_length() - 1

    @property
    def query_range(self) -> int:
        """Query index range: domain − max_shift·blowup, so every shifted
        opening stays in range (reference: 8176 = 8192 − 2·8, prover.rs:263)."""
        return self.eval_domain - self.air.max_shift * self.blowup

    @property
    def constraints(self) -> tuple:
        """The AIR's ordered constraint list (alpha order)."""
        return self.air.constraints(self)

    @property
    def n_constraints(self) -> int:
        return len(self.constraints)

    @property
    def trace_generator(self) -> int:
        return self.field.subgroup_generator(self.trace_domain)

    @property
    def domain_generator(self) -> int:
        return self.field.subgroup_generator(self.eval_domain)


STARK101 = StarkConfig()
STARK101_SECRET = 3141592  # the reference's baked-in witness (prover.rs:34)

# Beyond-reference soundness preset: the same stark-101 statement with THREE
# FRI queries (the reference draws exactly one, prover.rs:263 — a soundness
# quirk, SURVEY.md §3.3(b); stark-101 proper uses 3). Shares the reference
# transcript prefix byte-for-byte through the free term; pinned golden
# transcript in tests/test_protocol_golden_q3.py.
STARK101_Q3 = StarkConfig(n_queries=3)


def alt_field_config(
    trace_len: int = 1023, secret: int = 3141592, **kw
) -> "StarkConfig":
    """The stark-101 statement instantiated over the SECOND prime
    (p = 15·2^27 + 1): the end-to-end witness that the framework is generic
    over P like the reference's Gf<const P>. The boundary output is derived
    from the witness (it differs per field — the recurrence wraps mod p)."""
    trace = FIBONACCI_SQ.trace(trace_len, secret, FIELD_ALT.p)
    return StarkConfig(
        trace_len=trace_len,
        boundary_last=int(trace[-1]),
        field=FIELD_ALT,
        **kw,
    )
