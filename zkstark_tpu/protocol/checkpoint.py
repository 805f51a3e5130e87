"""Checkpoint / resume at Fiat-Shamir phase boundaries.

The reference persists nothing (SURVEY.md §5: the proof blob is the only
artifact and never hits disk). A framework proving 2^24-point domains across
hosts needs mid-proof recovery: the channel's serial spine (SURVEY.md §3.5)
gives natural barriers — after each phase the transcript prefix uniquely
determines all later challenges, so a proof can resume from (transcript,
per-phase arrays) with zero recomputation of completed phases.

A checkpoint is an .npz holding the channel state + transcript bytes + every
device array produced so far. An integrity digest covers the channel state,
the transcript bytes AND every array's raw bytes (keys included), so a
corrupt or truncated checkpoint — whether in the Fiat-Shamir spine or in the
bulk phase outputs — cannot resume silently (the integrity check the
reference's assert-style failures lack). Saves are atomic (temp file +
os.replace) so a crash mid-save never destroys the previous good checkpoint.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from zkstark_tpu.hash import merkle
from zkstark_tpu.protocol import prover as pr
from zkstark_tpu.protocol.config import StarkConfig
from zkstark_tpu.protocol.proof import Proof
from zkstark_tpu.transcript import Channel


class CheckpointError(RuntimeError):
    pass


def _flatten(arrays: dict) -> dict:
    """dict of (array | list[array] | list[list[array]]) → flat npz-able dict."""
    flat = {}
    for key, val in arrays.items():
        if isinstance(val, (list, tuple)):
            flat[f"__len__{key}"] = np.int64(len(val))
            for i, item in enumerate(val):
                flat.update(_flatten({f"{key}__{i}": item}))
        else:
            flat[key] = np.asarray(val)
    return flat


def _unflatten(flat: dict) -> dict:
    keys = set(flat.keys())
    out = {}

    def build(key):
        lkey = f"__len__{key}"
        if lkey in keys:
            return [build(f"{key}__{i}") for i in range(int(flat[lkey]))]
        return flat[key]

    tops = set()
    for k in keys:
        name = k[len("__len__"):] if k.startswith("__len__") else k
        tops.add(name.split("__")[0])
    for t in sorted(tops):
        out[t] = build(t)
    return out


def statement_fingerprint(cfg: StarkConfig, secret: int) -> bytes:
    """Binds a checkpoint to its statement: config fields (the frozen
    dataclass repr is canonical — AIR objects are frozen/fieldless) + a
    commitment to the witness. The integrity digest covers bytes, not
    identity; without this, resuming `prove --checkpoint f` with a different
    --secret/--trace-len/--air would silently emit a proof for the OLD
    statement."""
    h = hashlib.sha256()
    h.update(b"zkstark-checkpoint-v1|")
    h.update(repr(cfg).encode())
    h.update(b"|")
    h.update(str(int(secret)).encode())
    return h.digest()


def _digest(phase: str, state: bytes, data: bytes, flat: dict, fp: bytes) -> bytes:
    """SHA-256 over fingerprint + phase + channel state + transcript + every
    array's key, shape, dtype and raw bytes — the whole checkpoint, not just
    the spine."""
    h = hashlib.sha256()
    h.update(fp)
    h.update(phase.encode())
    h.update(state)
    h.update(data)
    for key in sorted(flat):
        arr = np.ascontiguousarray(flat[key])
        h.update(key.encode())
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.digest()


def save(
    path: str, phase: str, channel: Channel, arrays: dict, fingerprint: bytes = b""
) -> None:
    flat = _flatten(arrays)
    state, data = channel.state, bytes(channel.data)
    check = _digest(phase, state, data, flat, fingerprint)
    flat["__phase__"] = np.frombuffer(phase.encode(), dtype=np.uint8)
    flat["__state__"] = np.frombuffer(state, dtype=np.uint8)
    flat["__data__"] = np.frombuffer(data, dtype=np.uint8)
    flat["__fp__"] = np.frombuffer(fingerprint, dtype=np.uint8)
    flat["__check__"] = np.frombuffer(check, dtype=np.uint8)
    # Atomic: a crash mid-save must not truncate the only checkpoint.
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)) or ".", suffix=".npz.tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, fingerprint: bytes | None = None):
    """→ (phase, channel, arrays); raises CheckpointError if the file is
    unreadable, any stored byte (spine or arrays) fails the digest, or —
    when `fingerprint` is given — the checkpoint was created for a different
    (config, witness) statement."""
    try:
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        phase = flat.pop("__phase__").tobytes().decode()
        state = flat.pop("__state__").tobytes()
        data = flat.pop("__data__").tobytes()
        stored_fp = flat.pop("__fp__").tobytes()
        check = flat.pop("__check__").tobytes()
    except CheckpointError:
        raise
    except Exception as e:  # truncated zip, missing keys, bad encode…
        raise CheckpointError(f"unreadable checkpoint {path!r}: {e}") from e
    if _digest(phase, state, data, flat, stored_fp) != check:
        raise CheckpointError("checkpoint integrity check failed")
    if fingerprint is not None and stored_fp != fingerprint:
        raise CheckpointError(
            f"checkpoint {path!r} was created for a DIFFERENT statement "
            "(config or witness changed since it was written) — refusing to "
            "resume; delete the file to start over"
        )
    ch = Channel()
    ch.state = state
    ch.data = bytearray(data)
    arrays = _unflatten(flat)
    return phase, ch, arrays


class ResumableProver:
    """The prover as an explicit phase state machine with a checkpoint
    written after every Fiat-Shamir barrier.

    fused=True (the default prover path): ONE checkpoint after the single
    fused device program + challenge replay — the natural barrier of the
    fused design (everything before it is device compute, everything after
    is host decommitment). fused=False: the legacy host-synced path with a
    checkpoint per phase.

    run(stop_after=...) simulates a crash for tests; a subsequent
    ResumableProver(...).run() picks up from the newest checkpoint and the
    final proof is byte-identical to an uninterrupted prove().

    `mesh` (fused path) shards the device program; checkpoints hold HOST
    arrays keyed by the Fiat-Shamir spine, so they are mesh-independent —
    the elastic-recovery contract (SURVEY.md §5 failure-detection row): a
    proof started on one cluster shape can be resumed on a DIFFERENT one
    (fewer hosts after a failure, or none) and the bytes are identical."""

    PHASES = ("phase1", "phase2", "fri", "fused", "done")

    def __init__(self, cfg: StarkConfig, secret: int, path: str,
                 fused: bool = False, mesh=None):
        self.cfg = cfg
        self.secret = secret
        self.path = path
        self.fused = fused or mesh is not None
        self.mesh = mesh

    def _save(self, phase: str, channel: Channel, arrays: dict):
        save(
            self.path,
            phase,
            channel,
            arrays,
            statement_fingerprint(self.cfg, self.secret),
        )

    def _finish(self, proof: Proof) -> Proof:
        """A returned proof means the checkpoint is spent: remove it so a
        later run with a different statement can't resume stale state."""
        try:
            os.unlink(self.path)
        except OSError:
            pass
        return proof

    def _run_fused(self, phase, channel, arrays, stop_after):
        cfg = self.cfg
        if phase == "start":
            import contextlib

            from zkstark_tpu.protocol import fused as fused_mod

            # same platform pinning as prove(): kernel routing and constant
            # placement must follow the mesh, not the process default device
            ctx = (
                jax.default_device(self.mesh.devices.flat[0])
                if self.mesh is not None
                else contextlib.nullcontext()
            )
            with ctx:
                trace_mont = pr._trace_to_device(cfg, self.secret)
                out = fused_mod.unpack_out(
                    cfg,
                    jax.device_get(
                        fused_mod.fused_core_packed(cfg, trace_mont, self.mesh)
                    ),
                )
            queries = pr.fused_replay(cfg, channel, out)
            arrays = dict(out)
            arrays["queries_drawn"] = np.asarray(queries, dtype=np.int64)
            self._save("fused", channel, arrays)
            phase = "fused"
            if stop_after == "fused":
                return None

        if phase == "fused":
            art = pr.ProverArtifacts()
            queries = [int(x) for x in arrays["queries_drawn"]]
            pr.fused_decommit(cfg, channel, art, arrays, queries)
            state, data = channel.finalize()
            return Proof(state=state, data=data)

        raise CheckpointError(f"unknown fused checkpoint phase {phase!r}")

    def run(self, stop_after: str | None = None) -> Proof | None:
        import os

        cfg = self.cfg
        if os.path.exists(self.path):
            phase, channel, arrays = load(
                self.path, statement_fingerprint(cfg, self.secret)
            )
        else:
            phase, channel, arrays = "start", Channel(), {}

        if self.fused or phase == "fused":
            out = self._run_fused(phase, channel, arrays, stop_after)
            return self._finish(out) if out is not None else None

        if phase == "start":
            trace_mont = pr._trace_to_device(cfg, self.secret)
            f_eval, f_res, f_levels = pr._phase1(cfg, trace_mont)
            channel.commit_hash(pr._root_bytes(f_levels))
            arrays = {
                "f_eval": f_eval,
                "f_res": f_res,
                "f_levels": [np.asarray(l) for l in f_levels],
            }
            arrays = jax.device_get(arrays)
            self._save("phase1", channel, arrays)
            phase = "phase1"
            if stop_after == "phase1":
                return None

        if phase == "phase1":
            alphas = [channel.get_u32() for _ in range(cfg.n_constraints)]
            alphas_mont = jnp.stack([pr._mont_scalar(a) for a in alphas])
            cp_eval, cp_res, cp_levels = pr._phase2(
                cfg, jnp.asarray(arrays["f_eval"]), alphas_mont
            )
            channel.commit_hash(pr._root_bytes(cp_levels))
            arrays.update(
                jax.device_get(
                    {
                        "cp_eval": cp_eval,
                        "layer_res": [cp_res],
                        "layer_levels": [[np.asarray(l) for l in cp_levels]],
                    }
                )
            )
            self._save("phase2", channel, arrays)
            phase = "phase2"
            if stop_after == "phase2":
                return None

        if phase == "phase2":
            evals = jnp.asarray(arrays["cp_eval"])
            layer_res = list(arrays["layer_res"])
            layer_levels = list(arrays["layer_levels"])
            for layer in range(cfg.fri_rounds):
                beta = channel.get_u32()
                evals, res, levels = pr._fri_fold(
                    cfg, layer, evals, pr._mont_scalar(beta)
                )
                layer_res.append(np.asarray(res))
                layer_levels.append([np.asarray(l) for l in levels])
                channel.commit_hash(pr._root_bytes(levels))
            free_term = int(layer_res[-1][0])
            channel.commit_u32(free_term)
            arrays["layer_res"] = layer_res
            arrays["layer_levels"] = layer_levels
            self._save("fri", channel, arrays)
            phase = "fri"
            if stop_after == "fri":
                return None

        if phase == "fri":
            art = pr.ProverArtifacts()
            f_tree = merkle.MerkleTree(levels=list(arrays["f_levels"]))
            trees = [
                merkle.MerkleTree(levels=list(lv)) for lv in arrays["layer_levels"]
            ]
            queries = [
                channel.get_u32() % cfg.query_range for _ in range(cfg.n_queries)
            ]
            pr._decommit(
                cfg,
                channel,
                art,
                arrays["f_res"],
                f_tree,
                list(arrays["layer_res"]),
                trees,
                queries,
            )
            state, data = channel.finalize()
            return self._finish(Proof(state=state, data=data))

        raise CheckpointError(f"unknown checkpoint phase {phase!r}")
