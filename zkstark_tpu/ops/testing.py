"""Emulate Pallas kernel bodies as plain eager JAX functions (CPU CI).

Pallas `interpret=True` dispatches every kernel op through the interpreter,
which makes the big straight-line kernels here (~2.5k ops) take minutes on
CPU — unusable for CI. Jitting the body is no better: XLA:CPU's compile of
the fully-unrolled SHA-256 graph takes >4 minutes (measured). So we run the
kernel *body* eagerly with shim Refs over whole arrays (single-block view) —
a few hundred dispatches over tiny blocks, well under a second. This executes
the exact same traced computation as the Mosaic-compiled kernel; only the
BlockSpec/grid plumbing is not covered, which the on-TPU benchmark path
exercises.

Kernels that use TPU-only primitives (e.g. `pltpu.roll`) route them through a
module-level indirection that tests can monkeypatch to the jnp equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp


class _ReadRef:
    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype


class _WriteRef:
    def __init__(self, shape, dtype):
        self.arr = jnp.zeros(shape, dtype)

    def __setitem__(self, idx, val):
        self.arr = self.arr.at[idx].set(val)

    def __getitem__(self, idx):
        return self.arr[idx]

    @property
    def shape(self):
        return self.arr.shape


def emulate_kernel(kernel, out_shape, out_dtype, *arrays):
    """Run `kernel(*in_refs, out_ref)` on full arrays, return the output."""
    out = _WriteRef(out_shape, out_dtype)
    kernel(*[_ReadRef(x) for x in arrays], out)
    return out.arr


def emulate_pallas_grid(kernel, spec: dict, *arrays):
    """Execute a pallas_call's grid loop with the PRODUCTION BlockSpecs.

    `spec` is the same dict handed to pl.pallas_call (grid / in_specs /
    out_specs / out_shape). Each grid step slices every input by
    index_map(i)·block_shape, runs the kernel body eagerly on that block,
    and scatters the output block the same way — faithful Pallas grid
    semantics minus Mosaic, so a wrong index map produces wrong bytes on
    CPU CI even for kernels too large to interpret (the unrolled SHA-256)."""
    import itertools

    import numpy as np

    def block_slices(bspec, idx):
        bidx = bspec.index_map(*idx)
        return tuple(
            slice(b * s, (b + 1) * s) for b, s in zip(bidx, bspec.block_shape)
        )

    out_shape = spec["out_shape"]
    out = np.zeros(out_shape.shape, dtype=out_shape.dtype)
    for idx in itertools.product(*[range(g) for g in spec["grid"]]):
        in_refs = [
            _ReadRef(jnp.asarray(np.asarray(arr)[block_slices(bspec, idx)]))
            for bspec, arr in zip(spec["in_specs"], arrays)
        ]
        oref = _WriteRef(tuple(spec["out_specs"].block_shape), out_shape.dtype)
        kernel(*in_refs, oref)
        out[block_slices(spec["out_specs"], idx)] = np.asarray(oref.arr)
    return out
