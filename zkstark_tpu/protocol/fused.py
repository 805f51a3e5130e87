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


@functools.partial(jax.jit, static_argnums=(0,))
def fused_core(cfg: StarkConfig, trace_mont):
    """trace (Montgomery, (trace_len,)) → everything the transcript and the
    decommitment need, challenges derived on device.

    Returns a dict: roots (2+fri_rounds, 8) u32 digests in commit order,
    alphas (3,), betas (fri_rounds,), free_term (), query (), plus f_res and
    per-layer residues and Merkle levels for phase-4 openings."""
    # ---- Phase 1: interpolate + LDE + commit (prover.rs:24-85) ----
    coeffs = air.interpolate_trace(trace_mont, cfg.trace_domain)
    f_eval = ntt.coset_ntt(coeffs, cfg.eval_domain, cfg.coset_offset)
    f_res = fp.from_mont(f_eval)
    f_levels = merkle.build_levels(f_res)

    state = dc.zero_state()
    state = dc.absorb_hash(state, f_levels[-1][0])
    roots = [f_levels[-1][0]]

    # ---- Phase 2: composition (prover.rs:87-180) ----
    alphas = []
    for _ in range(3):
        a, state = dc.draw_u32(state)
        alphas.append(a)
    alphas_mont = jnp.stack([dc.draw_to_mont(a) for a in alphas])
    cp = pr.composition_eval(cfg, f_eval, alphas_mont)
    cp_res = fp.from_mont(cp)
    cp_levels = merkle.build_levels(cp_res)
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
        evals, res, levels = pr.fri_fold_eval(cfg, layer, evals, dc.draw_to_mont(b))
        layer_res.append(res)
        layer_levels.append(levels)
        state = dc.absorb_hash(state, levels[-1][0])
        roots.append(levels[-1][0])
    free_term = layer_res[-1][0]
    state = dc.absorb_u32_le(state, free_term)

    # ---- Phase 4 prologue: the query index (prover.rs:263) ----
    q, state = dc.draw_u32(state)
    query = q % jnp.uint32(cfg.query_range)

    return {
        "roots": jnp.stack(roots),
        "alphas": jnp.stack(alphas),
        "betas": jnp.stack(betas) if betas else jnp.zeros(0, jnp.uint32),
        "free_term": free_term,
        "query_draw": q,
        "query": query,
        "f_res": f_res,
        "f_levels": f_levels,
        "layer_res": layer_res,
        "layer_levels": layer_levels,
    }
