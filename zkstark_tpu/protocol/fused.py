"""Single-program prover: phases 1-3 + the Fiat-Shamir chain, one XLA call.

The host-synced prover (prover.py) blocks on a device→host round trip at
every challenge boundary — 13 per proof (SURVEY.md §3.5). Here the channel
hash chain itself runs on device (transcript/device_channel.py), so
interpolation, LDE, Merkle commits, composition, every FRI fold, and every
challenge derivation compile into ONE XLA program with a single bulk fetch
at the end for decommitment.

The host then *replays* the byte transcript with the host Channel from the
fetched roots/values (≈40 hashlib calls, microseconds) and asserts each
host-derived challenge equals the device-derived one — every proof
cross-checks the device chain against the host chain for free, and the
transcript bytes remain byte-identical to the reference (channel.rs:19-32,
prover.rs:9-293 commit order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zkstark_tpu import ntt
from zkstark_tpu.field import fp
from zkstark_tpu.hash import merkle
from zkstark_tpu.protocol import air
from zkstark_tpu.protocol import prover as pr
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.transcript import device_channel as dc


@functools.partial(jax.jit, static_argnums=(0, 2))
def fused_core(cfg: StarkConfig, trace_mont, mesh=None):
    """trace (Montgomery, (trace_len,)) → everything the transcript and the
    decommitment need, challenges derived on device.

    With `mesh` (static), the whole program is sharded over the evaluation
    domain: six-step NTT LDE (all_to_all transposes), local Merkle subtrees
    + root gathers, cross-shard FRI exchanges — while the transcript stays
    byte-identical to the single-device proof at any mesh size (mesh config
    is separate from protocol config, SURVEY.md §5).

    Returns a dict: roots (2+fri_rounds, 8) u32 digests in commit order,
    alphas (n_constraints,), betas (fri_rounds,), free_term (),
    queries (n_queries,), plus f_res and per-layer residues and Merkle levels
    for phase-4 openings."""
    if mesh is not None:
        from zkstark_tpu.parallel.fri_sharded import fold_sharded
        from zkstark_tpu.parallel.merkle_sharded import sharded_build_levels
        from zkstark_tpu.parallel.mesh import mesh_size, vec_sharding
        from zkstark_tpu.parallel.ntt_sharded import coset_ntt_sixstep

        n_shards = mesh_size(mesh)

        def build_levels(res):
            if res.shape[0] >= n_shards:
                return sharded_build_levels(res, mesh)
            return merkle.build_levels(res)

        def constrain(arr):
            return jax.lax.with_sharding_constraint(arr, vec_sharding(mesh))

        def lde(coeffs):
            return coset_ntt_sixstep(
                coeffs, cfg.eval_domain, cfg.coset_offset, mesh=mesh
            )

        def fold(layer, evals, beta_mont):
            folded = fold_sharded(
                evals,
                beta_mont,
                pr.fri_layer_constants(cfg, layer),
                pr._mont_scalar(pr._INV2),
                mesh=mesh if evals.shape[0] // 2 >= n_shards else None,
            )
            res = fp.from_mont(folded)
            return folded, res, build_levels(res)

    else:
        build_levels = merkle.build_levels
        constrain = lambda arr: arr  # noqa: E731

        def lde(coeffs):
            return ntt.coset_ntt(coeffs, cfg.eval_domain, cfg.coset_offset)

        def fold(layer, evals, beta_mont):
            return pr.fri_fold_eval(cfg, layer, evals, beta_mont)

    # ---- Phase 1: interpolate + LDE + commit (prover.rs:24-85) ----
    coeffs = air.interpolate_trace(trace_mont, cfg.trace_domain)
    f_eval = lde(coeffs)
    f_res = fp.from_mont(f_eval)
    f_levels = build_levels(f_res)

    state = dc.zero_state()
    state = dc.absorb_hash(state, f_levels[-1][0])
    roots = [f_levels[-1][0]]

    # ---- Phase 2: composition (prover.rs:87-180) ----
    alphas = []
    for _ in range(cfg.n_constraints):
        a, state = dc.draw_u32(state)
        alphas.append(a)
    alphas_mont = jnp.stack([dc.draw_to_mont(a) for a in alphas])
    cp = constrain(pr.composition_eval(cfg, f_eval, alphas_mont))
    cp_res = fp.from_mont(cp)
    cp_levels = build_levels(cp_res)
    state = dc.absorb_hash(state, cp_levels[-1][0])
    roots.append(cp_levels[-1][0])

    # ---- Phase 3: FRI (prover.rs:182-254) ----
    layer_res = [cp_res]
    layer_levels = [cp_levels]
    evals = cp
    betas = []
    for layer in range(cfg.fri_rounds):
        b, state = dc.draw_u32(state)
        betas.append(b)
        evals, res, levels = fold(layer, evals, dc.draw_to_mont(b))
        layer_res.append(res)
        layer_levels.append(levels)
        state = dc.absorb_hash(state, levels[-1][0])
        roots.append(levels[-1][0])
    free_term = layer_res[-1][0]
    state = dc.absorb_u32_le(state, free_term)

    # ---- Phase 4 prologue: the query indices (prover.rs:263, generalized
    # to n_queries; all draws precede the openings so the whole chain stays
    # on device — each draw self-commits, so the draws are distinct) ----
    queries = []
    for _ in range(cfg.n_queries):
        q, state = dc.draw_u32(state)
        queries.append(q % jnp.uint32(cfg.query_range))

    return {
        "roots": jnp.stack(roots),
        "alphas": jnp.stack(alphas),
        "betas": jnp.stack(betas) if betas else jnp.zeros(0, jnp.uint32),
        "free_term": free_term,
        "queries": jnp.stack(queries),
        "f_res": f_res,
        "f_levels": f_levels,
        "layer_res": layer_res,
        "layer_levels": layer_levels,
    }
