"""Device mesh configuration — kept separate from protocol config so the same
proof is byte-identical at any sharding (SURVEY.md §5 config note).

The reference has no parallelism of any kind (SURVEY.md §2: single thread,
single process, no comms). Scaling here is expressed the TPU-native way: a
1-D named mesh over the evaluation-domain axis, `jax.sharding` annotations,
and XLA-inserted collectives (all_to_all for NTT transposes, all_gather for
subtree roots) riding ICI — never hand-written transport.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DOMAIN_AXIS = "shards"


def make_mesh(n_devices: int | None = None, backend: str | None = None) -> Mesh:
    """1-D mesh over the first n available devices (CPU-simulated in tests)."""
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:3]]}…)"
            )
        devices = devices[:n_devices]
    return Mesh(devices, (DOMAIN_AXIS,))


def row_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Block-shard the leading axis, replicate the rest."""
    return NamedSharding(mesh, P(DOMAIN_AXIS, *([None] * (ndim - 1))))


def vec_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DOMAIN_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
