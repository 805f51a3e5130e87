"""Sharded FRI fold.

The evaluation-form fold pairs e[j] with e[j + m/2]: with the domain
block-sharded over S devices, shard s needs the block owned by shard
s + S/2 — a single pairwise exchange per round, which GSPMD lowers from the
halving slice + sharding constraint (a collective-permute, not a full
all_gather; SURVEY.md §5 long-context row). The folded output is re-spread
over all S shards so every round keeps the whole mesh busy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, Field
from zkstark_tpu.parallel.mesh import vec_sharding


def fold_sharded(
    evals, beta_mont, inv_x, inv2_mont, mesh: Mesh | None = None,
    field: Field = FIELD101,
):
    """One evaluation-form fold (same math as prover._fri_fold), sharded."""
    half = evals.shape[0] // 2
    a, b = evals[:half], evals[half:]
    even = fp.mont_mul_f(field, fp.add_f(field, a, b), inv2_mont)
    odd = fp.mont_mul_f(
        field, fp.mont_mul_f(field, fp.sub_f(field, a, b), inv2_mont), inv_x
    )
    out = fp.add_f(field, even, fp.mont_mul_f(field, odd, beta_mont))
    if mesh is not None:
        out = jax.lax.with_sharding_constraint(out, vec_sharding(mesh))
    return out
