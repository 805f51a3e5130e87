"""Kill-and-resume: a proof interrupted at any Fiat-Shamir barrier resumes
from its checkpoint and produces the byte-identical golden transcript."""

import numpy as np
import pytest

from zkstark_tpu.protocol import checkpoint
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.protocol.prover import prove

@pytest.fixture(scope="module")
def small_cfg():
    # Small config: trace 63, domain 512 — fast on CPU, full protocol shape.
    from zkstark_tpu.protocol.air import fibonacci_sq_trace

    trace = fibonacci_sq_trace(63, 3141592)
    return StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))


@pytest.fixture(scope="module")
def golden_proof(small_cfg):
    return prove(small_cfg, fused=False)


@pytest.mark.parametrize("stop_after", ["phase1", "phase2", "fri"])
def test_resume_matches_uninterrupted(tmp_path, small_cfg, golden_proof, stop_after):
    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path)
    assert rp.run(stop_after=stop_after) is None  # "crash"
    resumed = checkpoint.ResumableProver(small_cfg, 3141592, path).run()
    assert resumed.data == golden_proof.data
    assert resumed.state == golden_proof.state


def test_uninterrupted_resumable_matches(tmp_path, small_cfg, golden_proof):
    path = str(tmp_path / "ckpt.npz")
    proof = checkpoint.ResumableProver(small_cfg, 3141592, path).run()
    assert proof.data == golden_proof.data


def test_checkpoint_removed_after_success(tmp_path, small_cfg):
    """A returned proof spends the checkpoint: the file is removed so a later
    run with a different statement cannot resume stale phase state."""
    import os

    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path)
    rp.run(stop_after="phase2")
    assert os.path.exists(path)
    proof = checkpoint.ResumableProver(small_cfg, 3141592, path).run()
    assert proof is not None
    assert not os.path.exists(path)


def test_checkpoint_bound_to_statement(tmp_path, small_cfg):
    """Resuming with a different secret or config must refuse (the digest
    covers integrity, the fingerprint covers identity)."""
    from zkstark_tpu.protocol.air import fibonacci_sq_trace

    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path)
    rp.run(stop_after="phase1")
    # different witness
    with pytest.raises(checkpoint.CheckpointError, match="DIFFERENT statement"):
        checkpoint.ResumableProver(small_cfg, 2718281, path).run()
    # different config (other trace length ⇒ other boundary too)
    trace = fibonacci_sq_trace(127, 3141592)
    other = StarkConfig(trace_len=127, blowup=8, boundary_last=int(trace[-1]))
    with pytest.raises(checkpoint.CheckpointError, match="DIFFERENT statement"):
        checkpoint.ResumableProver(other, 3141592, path).run()
    # the original statement still resumes fine
    assert checkpoint.ResumableProver(small_cfg, 3141592, path).run() is not None


@pytest.mark.parametrize("key", ["__data__", "f_eval", "f_res"])
def test_corrupt_checkpoint_rejected(tmp_path, small_cfg, key):
    """Flipping one byte anywhere — transcript OR a bulk device array — must
    fail the integrity digest (a corrupt f_eval would otherwise resume
    silently into an invalid proof)."""
    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path)
    rp.run(stop_after="phase1")
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    arr = flat[key].copy()
    arr.reshape(-1).view(np.uint8)[0] ^= 1
    flat[key] = arr
    np.savez(path, **flat)
    with pytest.raises(checkpoint.CheckpointError):
        checkpoint.load(path)


def test_truncated_checkpoint_rejected(tmp_path, small_cfg):
    """A torn file (the crash-mid-save scenario) raises CheckpointError, not
    a raw zipfile error."""
    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path)
    rp.run(stop_after="phase1")
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(checkpoint.CheckpointError):
        checkpoint.load(path)


# ---------------------------------------------------------------------------
# Fused (default) prover path — checkpoint after the single device program
# ---------------------------------------------------------------------------


def test_fused_resume_small(tmp_path, small_cfg):
    golden = prove(small_cfg)  # fused=True default
    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path, fused=True)
    assert rp.run(stop_after="fused") is None  # "crash" after device program
    resumed = checkpoint.ResumableProver(small_cfg, 3141592, path, fused=True).run()
    assert resumed.data == golden.data
    assert resumed.state == golden.state


def test_fused_resume_stark101_golden(tmp_path):
    """Kill-and-resume at the full stark-101 config (trace 1023) through the
    fused default path yields the 7,836-byte golden transcript."""
    from zkstark_tpu.protocol.config import STARK101, STARK101_SECRET

    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(STARK101, STARK101_SECRET, path, fused=True)
    assert rp.run(stop_after="fused") is None
    resumed = checkpoint.ResumableProver(
        STARK101, STARK101_SECRET, path, fused=True
    ).run()
    assert len(resumed.data) == 7836
    assert resumed.state.hex() == (
        "d7eec91544f72a592145e7d505a2f274de740e0319ede8c983fd84c7736f6712"
    )


def test_elastic_rejoin_different_mesh(tmp_path, small_cfg, golden_proof):
    """Elastic recovery (SURVEY.md §5): a sharded prove that dies at the
    Fiat-Shamir barrier is resumed WITHOUT its original cluster — the
    checkpoint holds host arrays keyed by the channel spine, so a different
    mesh (here: none at all, the two-hosts-died scenario) completes the
    byte-identical proof."""
    import jax
    from jax.sharding import Mesh

    from zkstark_tpu.parallel.mesh import DOMAIN_AXIS

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), (DOMAIN_AXIS,))
    path = str(tmp_path / "ckpt.npz")
    rp = checkpoint.ResumableProver(small_cfg, 3141592, path, mesh=mesh)
    assert rp.run(stop_after="fused") is None  # "cluster dies" at the barrier
    # rejoin on a single device: no mesh argument at all
    resumed = checkpoint.ResumableProver(small_cfg, 3141592, path, fused=True).run()
    assert resumed.data == golden_proof.data
    assert resumed.state == golden_proof.state
