"""MXU-based NTT sub-transforms: radix-64 DFT stages as bf16 matmuls.

The Pallas column kernel (ops/ntt_kernel.py) is pure VPU work — u32
Montgomery butterflies — and measures ~2.8× the VPU speed-of-light
(BENCH_r04 ntt_vpu_ratio_2e24) while the MXU sits idle. This module moves
the O(m log m) butterfly arithmetic onto the MXU as exact integer matmuls:

  * A field element x̃ (Montgomery u32) splits into four 8-bit limbs, each
    EXACT in bf16 (≤255 needs 8 significand bits; bf16 has 8).
  * A radix-64 DFT stage is y[i] = Σ_j W[i,j]·x̃[j] mod p. Fold the limb
    weight 2^{8a} AND the Montgomery R into the matrix on the HOST:
        A[64c+i, 64a+j] = byte_c( (to_mont(W[i,j]) · 2^{8a}) mod p )
    Then T = A @ X_limbs (bf16×bf16→f32 on the MXU) is EXACT: every partial
    sum ≤ 255²·256 < 2^24 < f32's 24-bit integer range.
  * Recombine on the VPU: V = Σ_c T_c·2^{8c} < 2^48 assembled as a
    (hi, lo) u32 pair, then ONE Montgomery reduction per element:
        mont_reduce(V) = Σ to_mont(W)·x̃ · R^{-1} = (Σ W·x)·R  — already
    Montgomery form, ~45 u32 ops/element vs ~370 for six butterfly stages.

A size-m column transform (m = 64·64 = 4096) is two such stages around a
pointwise twiddle — the classic four-step inside the column — with NO
bit-reversal gather at all. Larger m chunk the contraction to keep partial
sums under 2^24 (see _limb_matrix).

Used by ntt_fourstep when ZKSTARK_MXU=on (measured A/B lever; see
bench/BENCH notes for the decision record). Bit-identical to the VPU path
— pure field identities, no rounding anywhere (exactness bounds above).

Reference parity: replaces the same polynomial evaluations
(polynomial.rs:49-57) as the VPU kernel; output contract identical.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from zkstark_tpu.field import fp
from zkstark_tpu.field.fp import FIELD101, Field

# Max contraction length with 8-bit limbs exact in f32: 255²·len < 2^24.
_MAX_CONTRACT = 256  # 4 limbs × radix-64
_CHUNK = 64  # DFT input elements per exact-f32 matmul chunk


def mxu_enabled() -> bool:
    """A/B lever for the MXU column path (ZKSTARK_MXU=on/off; default
    pending the hardware measurement vs the Pallas VPU kernel)."""
    return os.environ.get("ZKSTARK_MXU", "off") == "on"


def mxu_supported(m: int) -> bool:
    """Column length m = k1·k2 with radices ≤ 128 (chunked contraction keeps
    every f32 partial exact): m ≤ 16384 → four-step n up to 2^28."""
    bits = m.bit_length() - 1
    return m >= 128 and (1 << ((bits + 1) // 2)) <= 128


@functools.lru_cache(maxsize=None)
def _limb_matrix(k: int, w: int, field: Field = FIELD101) -> np.ndarray:
    """(4k, 4k) bf16 limb matrix for the radix-k DFT with root w (order k):
    A[k·c+i, k·a+j] = byte_c( to_mont(w^{ij}) · 2^{8a} mod p ).  Host numpy
    (embeds at lowering; never a tracer). k > _CHUNK is fine — the CALLER
    chunks the contraction (columns of this matrix) to stay f32-exact."""
    p = field.p
    rows = field.host_powers_pow2(w, k)  # w^{i}
    wm = field.host_vandermonde(rows, k).astype(np.uint64)  # (k,k): w^{ij}
    wm = (wm * np.uint64(field.r_mod_p)) % np.uint64(p)  # to_mont fold
    out = np.zeros((4 * k, 4 * k), dtype=np.float32)
    for a in range(4):
        shifted = (wm << np.uint64(8 * a)) % np.uint64(p)
        for c in range(4):
            out[c * k : (c + 1) * k, a * k : (a + 1) * k] = (
                (shifted >> np.uint64(8 * c)) & np.uint64(0xFF)
            ).astype(np.float32)
    return out.astype(jnp.bfloat16.dtype if hasattr(jnp.bfloat16, "dtype") else np.float32)


def _to_limbs_bf16(x, axis: int):
    """u32 (..., k, ...) → bf16 with the limb axis (4) prepended to `axis`:
    output shape inserts 4·k at axis by stacking limbs."""
    limbs = [
        ((x >> (8 * a)) & jnp.uint32(0xFF)).astype(jnp.bfloat16) for a in range(4)
    ]
    return jnp.concatenate(limbs, axis=axis)


def _recombine(t0, t1, t2, t3, field: Field):
    """u32 limb-sums T_c (each < 2^32; exact-f32 chunks already summed) →
    u32 Montgomery values via V = Σ_c T_c·2^{8c} (< 2^57) assembled exactly
    as a (hi, lo) u32 pair, then ONE Montgomery reduction (folds away the R
    pre-multiplied into the matrix)."""
    u = t0 + (t1 << 8)
    cu = (u < t0).astype(jnp.uint32)
    v = u + (t2 << 16)
    cv = (v < u).astype(jnp.uint32)
    w_ = v + (t3 << 24)
    cw = (w_ < v).astype(jnp.uint32)
    lo = w_
    hi = (t1 >> 24) + (t2 >> 16) + (t3 >> 8) + cu + cv + cw
    return fp.mont_reduce_f(field, hi, lo)


def dft_matmul(x, k: int, w: int, field: Field = FIELD101, contract_axis: int = 0):
    """Exact radix-k DFT along `contract_axis` via bf16 MXU matmuls:
    y[i] = Σ_j w^{ij}·x[j] mod p (Montgomery in/out). x: u32 (..., k, ...).

    k > _CHUNK splits the contraction into 64-element chunks — each chunk's
    f32 partial sums stay < 255²·256 < 2^24 (exact); chunk partials are
    summed exactly in u32 before the single recombine+reduce."""
    a = jnp.asarray(_limb_matrix(k, w, field))
    xl = _to_limbs_bf16(x, contract_axis)  # limb axis size 4k at contract_axis

    def chunk_dot(a_ch, x_ch):
        return jax.lax.dot_general(
            a_ch,
            x_ch,
            (((1,), (contract_axis,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.uint32)

    if k <= _CHUNK:
        acc = chunk_dot(a, xl)
    else:
        acc = None
        n_chunks = (k + _CHUNK - 1) // _CHUNK
        for ch in range(n_chunks):
            j0, j1 = ch * _CHUNK, min((ch + 1) * _CHUNK, k)
            # columns for limbs a=0..3 of input elements j0..j1
            cols = np.concatenate(
                [np.arange(a_ * k + j0, a_ * k + j1) for a_ in range(4)]
            )
            x_ch = jnp.take(xl, jnp.asarray(cols), axis=contract_axis)
            t = chunk_dot(a[:, jnp.asarray(cols)], x_ch)
            acc = t if acc is None else acc + t
    # matrix row axis (4k) is now axis 0; split limb groups and recombine
    t0, t1, t2, t3 = jnp.split(acc, 4, axis=0)
    out = _recombine(t0, t1, t2, t3, field)
    return jnp.moveaxis(out, 0, contract_axis)


@functools.lru_cache(maxsize=None)
def _col_twiddle(k1: int, k2: int, w: int, field: Field = FIELD101) -> np.ndarray:
    """(k1, k2) Montgomery twiddle T[t, j2] = w^{t·j2} for the in-column
    four-step (host numpy)."""
    rows = field.host_powers_pow2(w, k1)
    return field.host_to_mont(field.host_vandermonde(rows, k2))


def col_transform_mxu(x2d, w: int, field: Field = FIELD101):
    """(m, L) u32 Montgomery columns → column-wise DFT with root w (order m),
    natural order in/out — the MXU twin of ntt_kernel._ntt_cols_call∘bitrev.

    m = k1·k2 with both radices ≤ 64: two matmul stages around a pointwise
    twiddle (four-step within the column); NO bit-reversal gather.

        X[t + k1·s] = Σ_{j2} (w^{k1})^{j2·s} · w^{t·j2} · Σ_{j1} (w^{k2})^{t·j1} x[j1·k2 + j2]
    """
    m, L = x2d.shape
    bits = m.bit_length() - 1
    b1 = (bits + 1) // 2
    k1, k2 = 1 << b1, 1 << (bits - b1)
    assert k1 <= 128 and k1 * k2 == m, (m, k1, k2)
    p = field.p

    x3 = x2d.reshape(k1, k2, L)  # [j1, j2, L]
    # A-stage: contract j1 with root w^{k2} (order k1)
    a = dft_matmul(x3, k1, pow(w, k2, p), field, contract_axis=0)  # [t, j2, L]
    # twiddle w^{t·j2}
    tw = jnp.asarray(_col_twiddle(k1, k2, w, field))
    at = fp.mont_mul_f(field, a, tw[:, :, None])
    # B-stage: contract j2 with root w^{k1} (order k2)
    b = dft_matmul(at, k2, pow(w, k1, p), field, contract_axis=1)  # [t, s, L]
    # flat index t + k1·s → row-major (s, t)
    return jnp.moveaxis(b, 0, 1).reshape(m, L)
