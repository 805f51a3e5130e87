"""Pallas TPU kernels for the framework's hot ops.

Each kernel has a pure-jnp twin elsewhere in the package (hash/sha256.py,
ntt/ntt.py); the wrappers here are bit-identical drop-ins. Mode control:

  ZKSTARK_PALLAS = "on"         compile with Mosaic (requires a TPU backend)
                 | "interpret"  run the same kernels in interpreter mode (CPU CI)
                 | "off"        callers fall back to the jnp implementations

Default: "on" when the default JAX backend is a TPU, else "off".
"""

from __future__ import annotations

import os


def pallas_mode() -> str:
    mode = os.environ.get("ZKSTARK_PALLAS")
    if mode:
        return mode
    import jax

    # jax_default_device (set e.g. by tests pinning to CPU) overrides the
    # platform-priority default backend — honor it, else Mosaic kernels would
    # be lowered for a backend the arrays don't live on.
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = getattr(dev, "platform", dev)
        return "on" if platform == "tpu" else "off"
    return "on" if jax.default_backend() == "tpu" else "off"


def pallas_enabled() -> bool:
    return pallas_mode() in ("on", "interpret")


def pallas_interpret() -> bool:
    return pallas_mode() == "interpret"
