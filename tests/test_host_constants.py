"""Host-numpy protocol constants == device-jit builders, bit-for-bit.

composition_constants / fri_layer_constants route small domains to exact
numpy (the device eager-jit builders dominated cold-prove warm-up on a
remote-compile backend); the golden-transcript tests pin the host path
end-to-end, and this pins the two builders against each other directly so
the >_HOST_CONST_MAX device path can't drift."""

import numpy as np
import jax

from zkstark_tpu.protocol import prover
from zkstark_tpu.protocol.air import fibonacci_sq_trace
from zkstark_tpu.protocol.config import StarkConfig


def _small_cfg():
    trace = fibonacci_sq_trace(63, 12345)
    return StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))


def test_composition_constants_host_matches_device():
    cfg = _small_cfg()
    host = prover._composition_constants_host(cfg)
    dev = jax.jit(prover._composition_constants_impl, static_argnums=0)(cfg)
    np.testing.assert_array_equal(np.asarray(host["xs"]), np.asarray(dev["xs"]))
    assert len(host["inv_dens"]) == len(dev["inv_dens"])
    for a, b in zip(host["inv_dens"], dev["inv_dens"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fri_layer_constants_host_matches_device():
    cfg = _small_cfg()
    for layer in range(cfg.fri_rounds):
        host = prover.fri_layer_constants(cfg, layer)  # small => host path
        dev = jax.jit(prover._fri_layer_constants_impl, static_argnums=(0, 1))(
            cfg, layer
        )
        np.testing.assert_array_equal(np.asarray(host), np.asarray(dev))


def test_in_trace_constants_prove_identical(monkeypatch):
    """Force the >_HOST_CONST_MAX route (constants computed IN-TRACE via
    powers_iota — the 2^24 path) on a small config: the transcript must be
    byte-identical to the host-constants route, solo AND mesh-sharded.
    This is the shard-invariance guarantee for exactly the domains the
    host-constant cutoff excludes (VERDICT r3 #5)."""
    from jax.sharding import Mesh

    from zkstark_tpu.parallel.mesh import DOMAIN_AXIS
    from zkstark_tpu.protocol.prover import prove

    cfg = _small_cfg()  # eval domain 512
    golden = prove(cfg, 12345)  # host-constants route

    # 64 (not 256): fri_layer_constants now keys on the LAYER's own half-size
    # (a big proof's tiny late layers take the host path), so forcing the
    # in-trace route for the early layers needs a threshold below 512/2.
    monkeypatch.setattr(prover, "_HOST_CONST_MAX", 64)
    # drop the cached fused program, else the solo re-prove would reuse the
    # host-constants trace instead of exercising the in-trace builders
    from zkstark_tpu.protocol import fused as fused_mod

    fused_mod.fused_core_packed.clear_cache()
    fused_mod.fused_core.clear_cache()
    solo = prove(cfg, 12345)
    assert solo.data == golden.data and solo.state == golden.state

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), (DOMAIN_AXIS,))
    sharded = prove(cfg, 12345, mesh=mesh)
    assert sharded.data == golden.data and sharded.state == golden.state
