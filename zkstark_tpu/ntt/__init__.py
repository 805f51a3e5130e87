from zkstark_tpu.ntt.core import (
    NttPlan,
    bit_reverse_indices,
    coset_intt,
    coset_ntt,
    forward_plan,
    intt,
    inverse_plan,
    make_plan,
    ntt,
)

__all__ = [
    "NttPlan",
    "bit_reverse_indices",
    "coset_intt",
    "coset_ntt",
    "forward_plan",
    "intt",
    "inverse_plan",
    "make_plan",
    "ntt",
]
