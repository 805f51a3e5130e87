"""Fully device-side sharded proof pipeline (challenges as inputs).

The real prover must sync with the host at each Fiat-Shamir boundary (the
channel is the serial spine, SURVEY.md §3.5). For compile checks, dry runs,
and pure device benchmarking we also expose the whole pipeline as ONE jittable
function taking the challenges (α, β) as inputs: phase 1 (interpolate + LDE +
Merkle), phase 2 (composition), and every FRI fold + commit, sharded over a
mesh when given. This is the "training step" analog for the multi-chip
dry-run: all collectives (six-step NTT all_to_alls, subtree-root gathers,
fold pair exchanges) appear in a single compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from zkstark_tpu import ntt
from zkstark_tpu.field import fp
from zkstark_tpu.hash import merkle
from zkstark_tpu.parallel.fri_sharded import fold_sharded
from zkstark_tpu.parallel.merkle_sharded import sharded_build_levels
from zkstark_tpu.parallel.mesh import mesh_size, vec_sharding
from zkstark_tpu.parallel.ntt_sharded import coset_ntt_sixstep
from zkstark_tpu.protocol import air
from zkstark_tpu.protocol import prover as pr
from zkstark_tpu.protocol.config import StarkConfig


def proof_core(cfg: StarkConfig, mesh: Mesh | None = None):
    """Returns fn(trace_mont, alphas_mont, betas_mont) → outputs dict.

    alphas_mont: (3,) and betas_mont: (fri_rounds,) Montgomery uint32.
    Outputs: all Merkle roots (as (8,) uint32 digests), the final FRI layer,
    and the free term — everything the transcript needs from the device.
    """
    fld = cfg.field
    inv2 = pr._mont_scalar((fld.p + 1) // 2, fld)
    layer_inv_x = [
        pr.fri_layer_constants(cfg, layer) for layer in range(cfg.fri_rounds)
    ]
    shard_ok = mesh is not None

    def build_levels(res):
        if shard_ok and res.shape[0] >= mesh_size(mesh):
            return sharded_build_levels(res, mesh)
        return merkle.build_levels(res)

    def constrain(arr):
        if shard_ok:
            return jax.lax.with_sharding_constraint(arr, vec_sharding(mesh))
        return arr

    def fn(trace_mont, alphas_mont, betas_mont):
        # Phase 1
        coeffs = air.interpolate_trace(trace_mont, cfg.trace_domain, fld)
        if shard_ok:
            f_eval = coset_ntt_sixstep(
                coeffs, cfg.eval_domain, cfg.coset_offset, mesh=mesh, field=fld
            )
        else:
            f_eval = ntt.coset_ntt(coeffs, cfg.eval_domain, cfg.coset_offset, fld)
        f_res = fp.from_mont_f(fld, f_eval)
        f_levels = build_levels(f_res)

        # Phase 2: one source of truth for the composition math
        cp = constrain(pr.composition_eval(cfg, f_eval, alphas_mont))
        roots = [f_levels[-1][0]]
        layer_res = [fp.from_mont_f(fld, cp)]
        levels = build_levels(layer_res[0])
        roots.append(levels[-1][0])

        # Phase 3: all FRI folds
        evals = cp
        for layer in range(cfg.fri_rounds):
            evals = fold_sharded(
                evals,
                betas_mont[layer],
                layer_inv_x[layer],
                inv2,
                mesh=mesh if shard_ok and evals.shape[0] // 2 >= mesh_size(mesh) else None,
                field=fld,
            )
            res = fp.from_mont_f(fld, evals)
            layer_res.append(res)
            levels = build_levels(res)
            roots.append(levels[-1][0])

        return {
            "roots": jnp.stack(roots),  # (2 + fri_rounds, 8)
            "free_term": layer_res[-1][0],
            "final_layer": layer_res[-1],
        }

    return fn
