"""Fused NTT as a Pallas TPU kernel: four-step decomposition with a
column-transform kernel that runs every butterfly stage in VMEM.

Why: the jnp radix-2 path (ntt/ntt.py) materializes the array between stages,
so a size-n transform pays ~2·log2(n) HBM passes. Here a transform of size
m ≤ 4096 is one kernel: the (m, 128) block is loaded once, all log2(m) stages
run on-chip, and the block is written once — the transform becomes HBM-bound
at ~2 passes instead of ~2·log2(n).

Column orientation is the TPU-native choice: butterflies pair *rows* of an
(m, lanes) block, so every stage is sublane arithmetic vectorized across 128
lanes — no lane shuffles ever. The pairing at distance `half` is expressed
with two `pltpu.roll`s and a parity select, which keeps a single Montgomery
multiply per stage:

    operand = where(even_half, x[r+half], x[r])      # rolls + select
    prod    = W[r] · operand                          # one mont_mul
    x       = where(even_half, x[r] + prod, x[r−half] − prod)

A flat size-n transform (n = n1·n2) is the classic four-step factorization —
the single-chip twin of the sharded six-step in parallel/ntt_sharded.py:

    X[k1 + n1·k2] = Σ_{j2} ω^{j2·k1} (ω^{n1})^{j2·k2} · Σ_{j1} x[j1·n2+j2] (ω^{n2})^{j1·k1}

    1. column NTTs of the (n1, n2) view, root ω^{n2}   [kernel]
    2. twiddle by T[k1, j2] = ω^{k1·j2}                [jnp, fuses into 3]
    3. transpose + bit-reverse rows                     [jnp]
    4. column NTTs of the (n2, n1) view, root ω^{n1}   [kernel]
    5. flatten — already natural order

Outputs are bit-identical to ntt.ntt / ntt.intt (pure field identities; no
rounding anywhere). Replaces the reference's O(n²)/O(n³) polynomial algebra
(polynomial.rs:49-57, 337-383) at TPU speed-of-light.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, Field
from zkstark_tpu.ops import pallas_interpret

# (m, 128) uint32 column block; 8192×128×4B = 4 MB, ~6 live values at the
# deepest unrolled stage ≈ 24 MB — inside the 96 MB VMEM cap below. The
# m=8192 kernel is validated bit-exact against the radix-2 path, extending
# four-step coverage to n = 2^26.
MAX_COLS_SIZE = 8192
MIN_FOURSTEP = 1 << 14  # below this both factors can't reach 128 lanes


def pease_enabled() -> bool:
    """Column kernel flavor. Default: the roll+select DIT kernel.

    ZKSTARK_PEASE=on selects the constant-geometry Pease kernel — it halves
    the Montgomery multiplies on paper, but Mosaic lowers its per-stage
    sublane interleave (stack+reshape) catastrophically: >10 min to compile
    at m=4096 and ~2× SLOWER at runtime (measured 2^24: 1.13 G pts/s vs the
    DIT kernel's 1.62 G — BENCH_local_r04.jsonl ntt_points_per_sec_2e24).
    Kept as a measured negative result + CPU-tested reference
    implementation."""
    return os.environ.get("ZKSTARK_PEASE", "off") == "on"


def _roll(x, shift: int, axis: int):
    """Indirection so ops.testing can emulate the kernel off-TPU (jnp.roll)."""
    return pltpu.roll(x, shift, axis)


def _ntt_cols_kernel(field, x_ref, tw_ref, out_ref):
    """All log2(m) DIT stages over the sublane axis of an (m, 128) block.

    Rows must arrive bit-reversed; output is natural order. tw_ref lane s
    holds the stage-s twiddle column W_s[r] = ω_{2^{s+1}}^{r mod 2^s}.
    `field` is closed over (functools.partial) — its constants lower as
    numpy literals, so one kernel body serves every prime."""
    x = x_ref[:]
    m = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    for s in range(m.bit_length() - 1):
        half = 1 << s
        w_col = tw_ref[:, s : s + 1]
        even = (r & (2 * half - 1)) < half
        # pltpu.roll requires a non-negative shift: roll by -half ≡ m - half.
        up = _roll(x, m - half, 0)
        down = _roll(x, half, 0)
        prod = fp.mont_mul_f(field, w_col, jnp.where(even, up, x))
        x = jnp.where(even, fp.add_f(field, x, prod), fp.sub_f(field, down, prod))
    out_ref[:] = x


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ntt_cols_call(x2d, tw, interpret: bool, field: Field = FIELD101):
    m, lanes = x2d.shape
    # The unrolled log2(m)-stage body needs ~6 (m,128) u32 live values at the
    # deepest stage; at m = 4096 that exceeds Mosaic's default 16 MB scoped
    # VMEM, so raise the cap (v5e has 128 MB physical VMEM).
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        )
    return pl.pallas_call(
        functools.partial(_ntt_cols_kernel, field),
        grid=(lanes // 128,),
        in_specs=[
            pl.BlockSpec((m, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.uint32),
        interpret=interpret,
        **params,
    )(x2d, tw)


def _ntt_cols_pease_kernel(field, x_ref, tw_ref, out_ref):
    """Constant-geometry (Pease) radix-2 DIF column transform: natural-order
    input rows, BIT-REVERSED output rows. Every stage has the identical form

        a = T + B ; b = W_t ⊙ (T − B) ; x' = interleave(a, b)

    (T/B = top/bottom halves; x'[2i]=a[i], x'[2i+1]=b[i]). The twiddle
    multiplies only the difference half — HALF the Montgomery multiplies of
    the roll+select DIT kernel above, which evaluates the product redundantly
    on both partner rows — and there are no rolls or selects at all; the
    interleave is one sublane shuffle. tw_ref lane t holds
    W_t[i] = w^{(i >> t) << t} over i < m/2; the last stage's exponents are
    all zero, so its multiply is skipped entirely."""
    x = x_ref[:]
    m = x.shape[0]
    h = m // 2
    stages = m.bit_length() - 1
    for t in range(stages):
        top, bot = x[:h], x[h:]
        a = fp.add_f(field, top, bot)
        d = fp.sub_f(field, top, bot)
        b = fp.mont_mul_f(field, tw_ref[:, t : t + 1], d) if t < stages - 1 else d
        x = jnp.stack([a, b], axis=1).reshape(m, a.shape[-1])
    out_ref[:] = x


@functools.partial(jax.jit, static_argnums=(2, 3))
def _pease_cols_call(x2d, tw, interpret: bool, field: Field = FIELD101):
    m, lanes = x2d.shape
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        )
    return pl.pallas_call(
        functools.partial(_ntt_cols_pease_kernel, field),
        grid=(lanes // 128,),
        in_specs=[
            pl.BlockSpec((m, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m // 2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, lanes), jnp.uint32),
        interpret=interpret,
        **params,
    )(x2d, tw)


def _pease_twiddle_table(m: int, w: int, field: Field = FIELD101) -> np.ndarray:
    """(m/2, 128) uint32 Montgomery: lane t = stage-t Pease twiddle column
    W_t[i] = w^{(i >> t) << t}. Only log2(m) lanes are used; the rest pad to
    the TPU lane width."""
    h = m // 2
    stages = m.bit_length() - 1
    i = np.arange(h)
    tw = np.zeros((h, 128), dtype=np.uint32)
    for t in range(stages):
        exps = (i >> t) << t
        col = np.array([pow(w, int(e), field.p) for e in exps], dtype=np.uint32)
        tw[:, t] = field.host_to_mont(col)
    return tw


def _stage_twiddle_table(m: int, w: int, field: Field = FIELD101) -> np.ndarray:
    """(m, 128) uint32: lane s = full-length stage-s twiddle column (period
    2^s), Montgomery form. Only log2(m) lanes are used; the rest pad to the
    TPU lane width."""
    stages = m.bit_length() - 1
    tw = np.zeros((m, 128), dtype=np.uint32)
    for s in range(stages):
        half = 1 << s
        wm = pow(w, m >> (s + 1), field.p)  # root of order 2^{s+1}
        col = field.host_to_mont(field.host_powers(wm, half))
        tw[:, s] = np.tile(col, m // half)
    return tw


_VBLK = 128  # inner factor of the twiddle-matrix decomposition (lane width)


class FourStepPlan(NamedTuple):
    """Constants for one (n, w, scale) four-step instance. Named fields so
    adding a table can't silently break unpacking call sites again."""

    n1: int
    n2: int
    tw1: jnp.ndarray  # DIT stage tables (ZKSTARK_PEASE=off path)
    tw2: jnp.ndarray
    twp1: jnp.ndarray  # Pease stage tables (default path)
    twp2: jnp.ndarray
    br1: jnp.ndarray
    br2: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


@functools.lru_cache(maxsize=None)
def _fourstep_constants(
    n: int, w: int, inverse_scale: int | None, field: Field = FIELD101
) -> FourStepPlan:
    """Factor n = n1·n2 (n1 ≥ n2 ≥ 128), stage tables and twiddle factors.

    The step-B twiddle matrix T[k1, j2] = w^{k1·j2} is NOT materialized (at
    n = 2^24 it would be a 64 MB array — one extra HBM round trip per
    transform and a constant the compiler chokes on). Instead j2 = 128·jh + jl
    gives the exact rank-structured factorization
        T[k1, j2] = U[k1, jh] · V[k1, jl],
    U = (w^{128})^{k1·jh} (n1 × n2/128), V = w^{k1·jl} (n1 × 128) — two tiny
    tables and one extra fused mont_mul per element. The INTT 1/n scale folds
    into U (every element passes through it exactly once).

    Every table is HOST numpy (exact u64 modmuls): host constants embed into
    the lowered module directly, where device-array constants would each pay
    a device→host fetch at lowering — minutes-long stalls on a remote-device
    (axon) link, formerly the bulk of cold warm-up."""
    bits = n.bit_length() - 1
    b1 = (bits + 1) // 2
    n1, n2 = 1 << b1, 1 << (bits - b1)
    assert n2 >= _VBLK
    from zkstark_tpu.ntt.core import bit_reverse_indices

    w1, w2 = pow(w, n2, field.p), pow(w, n1, field.p)
    if n1 <= MAX_COLS_SIZE:
        tw1 = _stage_twiddle_table(n1, w1, field)
        tw2 = _stage_twiddle_table(n2, w2, field)
        twp1 = _pease_twiddle_table(n1, w1, field)
        twp2 = _pease_twiddle_table(n2, w2, field)
    else:
        # beyond the Pallas column cap only the MXU route runs — skip its
        # (n1, 128) stage tables (8 MB each at n1 = 16384)
        tw1 = tw2 = twp1 = twp2 = None
    br1 = bit_reverse_indices(n1)
    br2 = bit_reverse_indices(n2)
    u, v = _twiddle_uv_host(n1, n2, w, inverse_scale, field)
    return FourStepPlan(n1, n2, tw1, tw2, twp1, twp2, br1, br2, u, v)


def _twiddle_uv_host(
    n1: int, n2: int, w: int, inverse_scale: int | None, field: Field = FIELD101
):
    """U, V as uint32 Montgomery-form numpy. inverse_scale (if given) is a
    Montgomery-form scalar folded into U: mont_mul(to_mont(u), to_mont(s)) ==
    to_mont(u·s), so the fold is a plain residue multiply before the final
    to_mont. The INTT caller passes to_mont(n^{-1})."""
    rows = field.host_powers_pow2(w, n1)  # w^{k1} residues
    v = field.host_vandermonde(rows, _VBLK)  # (n1, 128): w^{k1·jl}
    rows_blk = field.host_pow_vec(rows, _VBLK)  # (w^{128})^{k1}
    u = field.host_vandermonde(rows_blk, n2 // _VBLK).astype(np.uint64)
    if inverse_scale is not None:
        # fold the ACTUAL passed scale (not a recomputed n^{-1} — a caller
        # folding a different scale must not get silently wrong output):
        # Montgomery form -> residue via one exact host REDC inverse.
        s = inverse_scale * pow(fp.R, field.p - 2, field.p) % field.p
        u = (u * np.uint64(s)) % np.uint64(field.p)
    return field.host_to_mont(u.astype(np.uint32)), field.host_to_mont(v)


def _apply_twiddle(a, u, v, field: Field = FIELD101):
    """a[k1, j2] · w^{k1·j2} via the U·V factorization (fused elementwise)."""
    n1, n2 = a.shape
    a3 = a.reshape(n1, n2 // _VBLK, _VBLK)
    a3 = fp.mont_mul_f(field, fp.mont_mul_f(field, a3, u[:, :, None]), v[:, None, :])
    return a3.reshape(n1, n2)


def _vandermonde(bases, n: int, field: Field = FIELD101):
    v = jnp.full(bases.shape + (1,), jnp.uint32(field.r_mod_p))
    bm = bases
    while v.shape[-1] < n:
        step = min(v.shape[-1], n - v.shape[-1])
        v = jnp.concatenate(
            [v, fp.mont_mul_f(field, v[..., :step], bm[..., None])], axis=-1
        )
        bm = fp.mont_mul_f(field, bm, bm)
    return v


def fourstep_supported(n: int) -> bool:
    if n < MIN_FOURSTEP:
        return False
    bits = n.bit_length() - 1
    n1 = 1 << ((bits + 1) // 2)
    if n1 <= MAX_COLS_SIZE:  # Pallas column kernel path: n ≤ 2^26
        return True
    # beyond 2^26 the MXU matmul columns (always-on fallback there) carry
    # the four-step to n ≤ 2^28
    from zkstark_tpu.ops import mxu_ntt

    return mxu_ntt.mxu_supported(n1) and mxu_ntt.mxu_supported(
        n >> ((bits + 1) // 2)
    )


def ntt_fourstep(
    x, n: int, w: int, inverse_scale: int | None = None, field: Field = FIELD101
):
    """Size-n transform of a flat Montgomery vector with root w (standard
    form), natural order in/out — bit-identical to ntt.ntt with the same
    effective root. If inverse_scale (Montgomery n^{-1}) is given it is folded
    in, making this a complete INTT.

    Default path: the roll+select DIT kernel (see pease_enabled — the Pease
    kernel is a measured negative result, opt-in via ZKSTARK_PEASE=on). On
    the Pease path the kernels take natural-order rows and emit bit-reversed
    rows, so the row bit-reversal gathers move AFTER each kernel (take∘br is
    an involution un-permuting the output) — same pass count as the DIT
    path, half the in-kernel multiplies, but Mosaic lowers its interleave
    ~2× slower end-to-end (bench: ntt_points_per_sec_2e24)."""
    c = _fourstep_constants(n, w, inverse_scale, field)
    interp = pallas_interpret()
    from zkstark_tpu.ops import mxu_ntt

    if (mxu_ntt.mxu_enabled() or c.n1 > MAX_COLS_SIZE) and (
        mxu_ntt.mxu_supported(c.n1) and mxu_ntt.mxu_supported(c.n2)
    ):
        # MXU route: radix-64 bf16 matmul stages (ops/mxu_ntt.py) — plain
        # column DFTs, so the bit-reversal gathers disappear entirely.
        w1, w2 = pow(w, c.n2, field.p), pow(w, c.n1, field.p)
        a = mxu_ntt.col_transform_mxu(x.reshape(c.n1, c.n2), w1, field)
        b = _apply_twiddle(a, c.u, c.v, field)
        d = mxu_ntt.col_transform_mxu(b.T, w2, field)
        return d.reshape(n)
    if pease_enabled():
        a_br = _pease_cols_call(x.reshape(c.n1, c.n2), c.twp1, interp, field)
        a = jnp.take(a_br, c.br1, axis=0)  # rows back to natural k1
        b = _apply_twiddle(a, c.u, c.v, field)  # fused with the gather by XLA
        d_br = _pease_cols_call(b.T, c.twp2, interp, field)  # (n2, n1) column NTTs
        d = jnp.take(d_br, c.br2, axis=0)  # rows back to natural k2
        return d.reshape(n)
    xb = jnp.take(x.reshape(c.n1, c.n2), c.br1, axis=0)
    a = _ntt_cols_call(xb, c.tw1, interp, field)  # (n1, n2) column NTTs
    b = _apply_twiddle(a, c.u, c.v, field)  # step-B twiddles (fused by XLA)
    bt = jnp.take(b.T, c.br2, axis=0)  # (n2, n1)
    d = _ntt_cols_call(bt, c.tw2, interp, field)  # (n2, n1) column NTTs
    return d.reshape(n)
