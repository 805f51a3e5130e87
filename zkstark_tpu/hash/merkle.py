"""Merkle commitment over uint32 residues, built level-by-level on device.

The reference builds a flat heap with scalar SHA-256 calls (merkle.rs:14-51).
Here each level is one batched `node_hash` over the whole level — log2(n)
device calls, each perfectly data-parallel (SURVEY.md §3.4). Leaf encoding
(big-endian u32, merkle.rs:30-34), node order (left‖right, merkle.rs:42-45),
auth-path order (leaf→root siblings, merkle.rs:54-71) and the index-parity walk
of compute_root_from_path (merkle.rs:82-110) are preserved bit-for-bit.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from zkstark_tpu.hash import sha256

# Above this many hashes per level, chain in planar (8, m, 128) layout:
# the row-major pairs path materializes (k, 16)/(n, 8) intermediates whose
# tile padding (16→128 minor) costs 8-16× HBM — fatal at 2^25-proof sizes
# on a 16 GB chip — while the planar path's stride-2 child slices are
# ~2× slower per level. The default keeps ≤2^24-domain proofs on the fast
# pairs path (measured: 2^24 proof 1.69 s at threshold 2^24 vs 3.39 s
# all-planar); proofs at ≥2^25 domains need a LOWER threshold to fit HBM
# (2^25 proof: OOM at 2^24, 16.99 GB needed; runs at 2^21) — set
# ZKSTARK_PLANAR_MIN, which tools/prove_big.py does automatically.
PLANAR_MIN = 1 << 24


def _planar_min() -> int:
    import os

    v = os.environ.get("ZKSTARK_PLANAR_MIN")
    return int(v) if v else PLANAR_MIN


def build_levels(values):
    """All tree levels bottom-up from (n,) uint32 residues; n a power of two.

    Returns [leaf_hashes (n,8), …, root (1,8)] — still on device.

    Giant levels (≥ PLANAR_MIN hashes) chain in PLANAR (8, m, 128) layout
    between hash kernels: a (·, 16) u32 intermediate pays 8-16× T(8,128)
    tile padding in HBM — the allocation class that OOMed the 2^25-domain
    proof. Mid-size levels use the row-major pairs path (measured ~25%
    faster at 2^20, where padding fits trivially); small levels take the
    jnp kernels."""
    n = values.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    from zkstark_tpu import ops

    use_pallas = ops.pallas_enabled()
    if use_pallas:
        from zkstark_tpu.ops import sha256_kernel

    planes = None
    planar_min = _planar_min()
    if use_pallas and n >= planar_min and n % sha256_kernel.MIN_BATCH == 0:
        planes = sha256_kernel.leaf_planes(values)
        level = sha256_kernel.planes_to_rowmajor(planes)
    elif use_pallas and n >= sha256_kernel.MIN_BATCH and n % sha256_kernel.MIN_BATCH == 0:
        level = sha256_kernel.leaf_hash(values)
    else:
        level = sha256.leaf_hash(values)
    levels = [level]
    while level.shape[0] > 1:
        k = level.shape[0] // 2  # number of parent nodes
        if planes is not None and k >= planar_min:
            planes = sha256_kernel.node_planes(planes)
            level = sha256_kernel.planes_to_rowmajor(planes)
        elif use_pallas and k >= sha256_kernel.MIN_BATCH and k % sha256_kernel.MIN_BATCH == 0:
            # adjacent digest rows of (n, 8) are exactly the left‖right
            # 16-word node message — one reshape, no gathers
            planes = None
            level = sha256_kernel.node_hash_pairs(level.reshape(k, 16))
        else:
            planes = None
            level = sha256.node_hash(level[0::2], level[1::2])
        levels.append(level)
    return levels


def build_levels_batch(values):
    """Batched twin of build_levels: (B, n) residues → [(B, n, 8), …, (B, 1, 8)].

    B independent trees built in lockstep — the DP axis of batched proving.
    The flat reshape keeps the Pallas hash kernels on their fast path (they
    only see bigger flat batches)."""
    bsz, n = values.shape
    assert n & (n - 1) == 0 and n >= 1
    from zkstark_tpu import ops

    use_pallas = ops.pallas_enabled()
    if use_pallas:
        from zkstark_tpu.ops import sha256_kernel

    # The planar chain works on the flattened (bsz·k) hash axis: children
    # 2j/2j+1 of any parent share a tree (n is even), so even/odd global
    # index = even/odd in-tree index and pairs never cross trees. Same
    # PLANAR_MIN hybrid as build_levels.
    planes = None
    planar_min = _planar_min()
    flat_n = bsz * n
    if use_pallas and flat_n >= planar_min and flat_n % sha256_kernel.MIN_BATCH == 0:
        planes = sha256_kernel.leaf_planes(values.reshape(flat_n))
        level = sha256_kernel.planes_to_rowmajor(planes).reshape(bsz, n, 8)
    elif (
        use_pallas
        and flat_n >= sha256_kernel.MIN_BATCH
        and flat_n % sha256_kernel.MIN_BATCH == 0
    ):
        level = sha256_kernel.leaf_hash(values.reshape(flat_n)).reshape(bsz, n, 8)
    else:
        level = sha256.leaf_hash(values.reshape(flat_n)).reshape(bsz, n, 8)
    levels = [level]
    while level.shape[1] > 1:
        k = level.shape[1] // 2
        if planes is not None and bsz * k >= planar_min:
            planes = sha256_kernel.node_planes(planes)
            level = sha256_kernel.planes_to_rowmajor(planes).reshape(bsz, k, 8)
        elif (
            use_pallas
            and bsz * k >= sha256_kernel.MIN_BATCH
            and (bsz * k) % sha256_kernel.MIN_BATCH == 0
        ):
            planes = None
            flat = level.reshape(bsz * k, 16)  # adjacent digests = left‖right
            level = sha256_kernel.node_hash_pairs(flat).reshape(bsz, k, 8)
        else:
            planes = None
            flat = level.reshape(bsz * k, 16)
            level = sha256.node_hash(flat[:, :8], flat[:, 8:]).reshape(bsz, k, 8)
        levels.append(level)
    return levels


@jax.jit
def _build_root(values):
    return build_levels(values)[-1][0]


@dataclass
class MerkleTree:
    """Host handle over device-resident levels, mirroring reference Merkle."""

    levels: list  # device arrays, leaf level first

    @classmethod
    def commit(cls, values) -> "MerkleTree":
        return cls(levels=build_levels(values))

    @property
    def num_leaves(self) -> int:
        return int(self.levels[0].shape[0])

    def root(self) -> bytes:
        return sha256.digest_to_bytes(np.asarray(self.levels[-1][0]))

    def auth_path(self, index: int) -> list:
        """Sibling digests leaf→root (reference trace(), merkle.rs:54-71)."""
        path = []
        i = index
        for level in self.levels[:-1]:
            sib = np.asarray(level[i ^ 1])
            path.append(sha256.digest_to_bytes(sib))
            i >>= 1
        return path

    def auth_paths(self, indices) -> list:
        """Batch variant: one host sync per level instead of per (index, level)."""
        idx = np.asarray(indices, dtype=np.int64)
        per_level = []
        for level in self.levels[:-1]:
            sibs = np.asarray(jnp.take(level, jnp.asarray(idx ^ 1), axis=0))
            per_level.append(sibs)
            idx >>= 1
        return [
            [sha256.digest_to_bytes(per_level[d][k]) for d in range(len(per_level))]
            for k in range(len(np.atleast_1d(indices)))
        ]


def compute_root_from_path(element: int, index: int, path: list) -> bytes:
    """Recompute the root from one opening — verifier side (merkle.rs:82-110).

    Host-side hashlib: a single log-depth serial hash chain."""
    current = hashlib.sha256(int(element).to_bytes(4, "big")).digest()
    i = index
    for sibling in path:
        if i & 1:
            current = hashlib.sha256(sibling + current).digest()
        else:
            current = hashlib.sha256(current + sibling).digest()
        i >>= 1
    return current
