from zkstark_tpu.hash.merkle import MerkleTree, build_levels, compute_root_from_path
from zkstark_tpu.hash.sha256 import (
    bytes_to_digest,
    compress,
    digest_to_bytes,
    leaf_hash,
    node_hash,
)

__all__ = [
    "MerkleTree",
    "build_levels",
    "compute_root_from_path",
    "leaf_hash",
    "node_hash",
    "compress",
    "digest_to_bytes",
    "bytes_to_digest",
]
