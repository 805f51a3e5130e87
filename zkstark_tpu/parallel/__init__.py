from zkstark_tpu.parallel.mesh import (
    DOMAIN_AXIS,
    make_mesh,
    replicated,
    row_sharding,
    vec_sharding,
)
from zkstark_tpu.parallel.ntt_sharded import coset_ntt_sixstep, ntt_sixstep
from zkstark_tpu.parallel.merkle_sharded import sharded_build_levels, sharded_commit
from zkstark_tpu.parallel.fri_sharded import fold_sharded

__all__ = [
    "DOMAIN_AXIS",
    "make_mesh",
    "replicated",
    "row_sharding",
    "vec_sharding",
    "ntt_sixstep",
    "coset_ntt_sixstep",
    "sharded_build_levels",
    "sharded_commit",
    "fold_sharded",
]
