"""The 4-phase STARK prover, device-resident except the Fiat-Shamir spine.

Phase map (mirrors SURVEY.md §3.2 / prover.rs:9-293, re-shaped for TPU):
  1. trace (host, sequential recurrence) → INTT interpolation + coset-NTT LDE
     + Merkle commit (device) → commit root (host channel sync);
  2. constraint composition evaluated *pointwise on the coset* — the
     polynomial long divisions of prover.rs:101-145 become batched field
     inversions against precomputed vanishing denominators, and the f(g·x),
     f(g²·x) shifts become rolls by ±blowup lanes (g = h^blowup, which is
     also why the reference opens x+8 and x+16, prover.rs:268-271);
  3. FRI: evaluation-form folds (the identity asserted by the reference's own
     fri_test, polynomial.rs:419-425, and verifier, proof.rs:107-113), each
     followed by a Merkle commit and a channel sync for β;
  4. decommit: one query, 4 trace openings + fri_rounds layer-pair openings.

Every device phase is a jitted XLA program; the host only runs the ~40-hash
serial channel chain and O(log n) auth-path gathers. Each channel sync blocks
only on the 32-byte Merkle root, letting XLA pipeline the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zkstark_tpu import ntt
from zkstark_tpu.field import fp
from zkstark_tpu.hash import merkle, sha256
from zkstark_tpu.protocol import air
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.protocol.proof import Proof
from zkstark_tpu.transcript import Channel, bincode


def _mont_scalar(v: int) -> jnp.ndarray:
    return jnp.uint32(fp.host_to_mont(np.array([v % fp.P], np.uint32))[0])


@functools.lru_cache(maxsize=None)
def composition_constants(cfg: StarkConfig):
    """Device-resident denominators for the pointwise constraint evaluation.

    The coset offset·⟨h⟩ is disjoint from ⟨h⟩ ⊇ ⟨g⟩ (offset=5 generates all of
    F_p^*), so every denominator is invertible on the evaluation domain and the
    reference's exact polynomial divisions (no remainder, prover.rs:148-151)
    equal these pointwise quotients.
    """
    # jitted: one cached XLA program instead of hundreds of eager dispatches
    # (each eager op costs a compile round trip on a remote-compile backend).
    with jax.ensure_compile_time_eval():
        return jax.jit(_composition_constants_impl, static_argnums=0)(cfg)


def _composition_constants_impl(cfg: StarkConfig):
    n, d, o = cfg.trace_domain, cfg.eval_domain, cfg.coset_offset
    g = cfg.trace_generator
    h = cfg.domain_generator

    xs = fp.mont_mul(fp.device_powers(h, d), _mont_scalar(o))  # the coset domain
    one = jnp.full((d,), jnp.uint32(fp.R_MOD_P))

    g_last = pow(g, cfg.trace_len - 1, fp.P)  # g^1022
    inv_first = fp.inv(fp.sub(xs, one))
    inv_last = fp.inv(fp.sub(xs, jnp.broadcast_to(_mont_scalar(g_last), (d,))))

    # 1/Z(x) where Z = (x^n − 1) / ((x−g^{n−3})(x−g^{n−2})(x−g^{n−1}))
    x_pow_n = fp.pow_static(xs, n)
    num = fp.sub(x_pow_n, one)
    den = one
    for e in (n - 3, n - 2, n - 1):
        den = fp.mont_mul(
            den, fp.sub(xs, jnp.broadcast_to(_mont_scalar(pow(g, e, fp.P)), (d,)))
        )
    z_inv = fp.mont_mul(den, fp.inv(num))

    return {
        "xs": xs,
        "inv_first": inv_first,
        "inv_last": inv_last,
        "z_inv": z_inv,
    }


@functools.lru_cache(maxsize=None)
def fri_layer_constants(cfg: StarkConfig, layer: int):
    """Inverse first-half domain for the evaluation-form fold at `layer`.

    Layer-k domain is {offset^{2^k}·(h^{2^k})^j}; we need 1/x_j for j < m/2
    plus the constant 1/2."""
    with jax.ensure_compile_time_eval():
        return jax.jit(_fri_layer_constants_impl, static_argnums=(0, 1))(cfg, layer)


def _fri_layer_constants_impl(cfg: StarkConfig, layer: int):
    d = cfg.eval_domain >> layer
    base = pow(cfg.domain_generator, 1 << layer, fp.P)
    off = pow(cfg.coset_offset, 1 << layer, fp.P)
    inv_base = pow(base, fp.P - 2, fp.P)
    inv_off = pow(off, fp.P - 2, fp.P)
    inv_x = fp.mont_mul(fp.device_powers(inv_base, d // 2), _mont_scalar(inv_off))
    return inv_x


_INV2 = (fp.P + 1) // 2  # 1/2 in F_p


@functools.partial(jax.jit, static_argnums=(0,))
def _phase1(cfg: StarkConfig, trace_mont):
    """Interpolate + LDE + leaf residues + Merkle levels, one XLA program."""
    coeffs = air.interpolate_trace(trace_mont, cfg.trace_domain)
    f_eval = ntt.coset_ntt(coeffs, cfg.eval_domain, cfg.coset_offset)
    f_res = fp.from_mont(f_eval)
    levels = merkle.build_levels(f_res)
    return f_eval, f_res, levels


def composition_eval(cfg: StarkConfig, f_eval, alphas_mont):
    """Pointwise constraint composition on the coset (prover.rs:87-180).

    The single source of truth for the phase-2 math — used by the host-synced
    prover, the fused device-channel prover, and the sharded pipeline. Works
    on any leading batch shape (last axis = the evaluation domain)."""
    c = composition_constants(cfg)
    b = cfg.blowup
    one_first = jnp.broadcast_to(_mont_scalar(cfg.boundary_first), f_eval.shape)
    one_last = jnp.broadcast_to(_mont_scalar(cfg.boundary_last), f_eval.shape)

    c0 = fp.mont_mul(fp.sub(f_eval, one_first), c["inv_first"])
    c1 = fp.mont_mul(fp.sub(f_eval, one_last), c["inv_last"])
    f_gx = jnp.roll(f_eval, -b, axis=-1)
    f_ggx = jnp.roll(f_eval, -2 * b, axis=-1)
    num2 = fp.sub(
        fp.sub(f_ggx, fp.mont_mul(f_gx, f_gx)), fp.mont_mul(f_eval, f_eval)
    )
    c2 = fp.mont_mul(num2, c["z_inv"])

    return fp.add(
        fp.add(
            fp.mont_mul(c0, alphas_mont[..., 0:1]),
            fp.mont_mul(c1, alphas_mont[..., 1:2]),
        ),
        fp.mont_mul(c2, alphas_mont[..., 2:3]),
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _phase2(cfg: StarkConfig, f_eval, alphas_mont):
    cp = composition_eval(cfg, f_eval, alphas_mont)
    cp_res = fp.from_mont(cp)
    levels = merkle.build_levels(cp_res)
    return cp, cp_res, levels


def fri_fold_eval(cfg: StarkConfig, layer: int, evals, beta_mont, build=None):
    """Evaluation-form FRI fold: P'(x²) = (P(x)+P(−x))/2 + β·(P(x)−P(−x))/(2x).

    Identical to the reference's coefficient fold (polynomial.rs:385-400) on
    the halved-and-squared domain — the identity its verifier checks at
    proof.rs:107-113. Returns (folded_evals, residues, merkle levels).

    Last axis = the layer domain; leading axes are batch proofs (beta_mont
    must then carry matching leading axes). `build` overrides the Merkle
    builder (the batched prover passes its leading-axis-aware twin)."""
    inv_x = fri_layer_constants(cfg, layer)
    half = evals.shape[-1] // 2
    a, b = evals[..., :half], evals[..., half:]
    inv2 = _mont_scalar(_INV2)
    even = fp.mont_mul(fp.add(a, b), inv2)
    odd = fp.mont_mul(fp.mont_mul(fp.sub(a, b), inv2), inv_x)
    folded = fp.add(even, fp.mont_mul(odd, beta_mont))
    res = fp.from_mont(folded)
    levels = (build or merkle.build_levels)(res)
    return folded, res, levels


_fri_fold = jax.jit(fri_fold_eval, static_argnums=(0, 1))


def _root_bytes(levels) -> bytes:
    return sha256.digest_to_bytes(np.asarray(levels[-1][0]))


class ProverArtifacts:
    """Per-phase outputs kept for decommitment, inspection and checkpointing."""

    def __init__(self):
        self.f_res = None
        self.f_tree = None
        self.layer_res = []  # residues per FRI layer, layer 0 = cp_eval
        self.layer_trees = []
        self.query_index = None


class DeviceChannelMismatch(RuntimeError):
    """The device-derived Fiat-Shamir chain disagreed with the host replay."""


def _decommit(cfg, channel, art, f_res_h, f_tree_h, layer_res_h, trees_h, x):
    """Phase 4: one query, 4 trace openings + per-layer pair openings
    (prover.rs:256-289). All inputs are host arrays — zero device syncs."""
    b = cfg.blowup
    for idx in (x, x + b, x + 2 * b):
        channel.commit_bytes(
            bincode.ser_opening(int(f_res_h[idx]), f_tree_h.auth_path(idx))
        )
    channel.commit_bytes(
        bincode.ser_opening(int(layer_res_h[0][x]), trees_h[0].auth_path(x))
    )
    for layer in range(cfg.fri_rounds):
        size = cfg.eval_domain >> layer
        xi = x % size
        nxi = (xi + size // 2) % size
        channel.commit_bytes(
            bincode.ser_fri_opening(
                int(layer_res_h[layer][xi]),
                int(layer_res_h[layer][nxi]),
                trees_h[layer].auth_path(xi),
                trees_h[layer].auth_path(nxi),
            )
        )
    art.f_res, art.f_tree = f_res_h, f_tree_h
    art.layer_res, art.layer_trees = layer_res_h, trees_h
    art.query_index = x


def _trace_to_device(cfg: StarkConfig, secret: int):
    trace = air.fibonacci_sq_trace(cfg.trace_len, secret)
    if int(trace[-1]) != cfg.boundary_last:
        raise ValueError(
            "witness does not satisfy the public boundary: trace endpoint "
            f"{int(trace[-1])} != {cfg.boundary_last}"
        )
    return jnp.asarray(fp.host_to_mont(trace))


def prove(
    cfg: StarkConfig = StarkConfig(),
    secret: int = 3141592,
    channel: Channel | None = None,
    artifacts: ProverArtifacts | None = None,
    fused: bool = True,
) -> Proof:
    """Generate a proof byte-identical to the reference's generate_proof
    (prover.rs:9-293) for the same config and witness.

    fused=True (default): phases 1-3 and all challenge derivation run as ONE
    XLA program with the channel chain on device (protocol/fused.py); the host
    replays the ~40-hash transcript from the fetched roots and asserts every
    challenge matches — a per-proof cross-check of the device chain.
    fused=False: the legacy host-synced path (one round trip per challenge)."""
    channel = channel or Channel()
    art = artifacts if artifacts is not None else ProverArtifacts()
    trace_mont = _trace_to_device(cfg, secret)

    if fused:
        from zkstark_tpu.protocol import fused as fused_mod

        out = jax.device_get(fused_mod.fused_core(cfg, trace_mont))
        roots = out["roots"]
        channel.commit_hash(sha256.digest_to_bytes(roots[0]))
        for k in range(3):
            a = channel.get_u32()
            if a != int(out["alphas"][k]):
                raise DeviceChannelMismatch(f"alpha[{k}]")
        channel.commit_hash(sha256.digest_to_bytes(roots[1]))
        for layer in range(cfg.fri_rounds):
            beta = channel.get_u32()
            if beta != int(out["betas"][layer]):
                raise DeviceChannelMismatch(f"beta[{layer}]")
            channel.commit_hash(sha256.digest_to_bytes(roots[2 + layer]))
        channel.commit_u32(int(out["free_term"]))
        x = channel.get_u32() % cfg.query_range
        if x != int(out["query"]):
            raise DeviceChannelMismatch("query index")

        f_tree_h = merkle.MerkleTree(levels=out["f_levels"])
        trees_h = [merkle.MerkleTree(levels=lv) for lv in out["layer_levels"]]
        _decommit(
            cfg, channel, art, out["f_res"], f_tree_h, out["layer_res"], trees_h, x
        )
        state, data = channel.finalize()
        return Proof(state=state, data=data)

    # ---- Legacy host-synced path ----
    # Phase 1: trace → LDE → commit (prover.rs:24-85)
    f_eval, f_res, f_levels = _phase1(cfg, trace_mont)
    f_tree = merkle.MerkleTree(levels=f_levels)
    channel.commit_hash(_root_bytes(f_levels))

    # Phase 2: composition (prover.rs:87-180)
    alphas = [channel.get_u32() for _ in range(3)]
    alphas_mont = jnp.stack([_mont_scalar(a) for a in alphas])
    cp_eval, cp_res, cp_levels = _phase2(cfg, f_eval, alphas_mont)
    channel.commit_hash(_root_bytes(cp_levels))

    # Phase 3: FRI (prover.rs:182-254)
    layer_res = [cp_res]
    layer_trees = [merkle.MerkleTree(levels=cp_levels)]
    evals = cp_eval
    for layer in range(cfg.fri_rounds):
        beta = channel.get_u32()
        evals, res, levels = _fri_fold(cfg, layer, evals, _mont_scalar(beta))
        layer_res.append(res)
        layer_trees.append(merkle.MerkleTree(levels=levels))
        channel.commit_hash(_root_bytes(levels))
    free_term = int(np.asarray(layer_res[-1][0]))
    channel.commit_u32(free_term)

    # Phase 4: one bulk device→host transfer for everything decommitment
    # needs (~1 MB); per-element fetches would cost hundreds of round trips.
    f_res_h, f_levels_h, layer_res_h, layer_levels_h = jax.device_get(
        (f_res, f_tree.levels, layer_res, [t.levels for t in layer_trees])
    )
    f_tree_h = merkle.MerkleTree(levels=f_levels_h)
    trees_h = [merkle.MerkleTree(levels=lv) for lv in layer_levels_h]

    x = channel.get_u32() % cfg.query_range
    _decommit(cfg, channel, art, f_res_h, f_tree_h, layer_res_h, trees_h, x)

    state, data = channel.finalize()
    return Proof(state=state, data=data)
