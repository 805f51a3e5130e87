"""Analytic multi-host scaling model from the COMPILED sharded HLO
(VERDICT r4 #8): real hardware here has one chip, so the ≥80%-at-≥2-hosts
BASELINE target cannot be measured — but the collectives XLA actually
inserts CAN be extracted and priced with a bandwidth model.

For S ∈ {2,4,8} shards this compiles the sharded six-step NTT at 2^24 on a
virtual CPU mesh (identical GSPMD path to TPU), walks the optimized HLO for
collective ops (all-to-all / collective-permute / all-gather /
reduce-scatter), sums bytes-on-wire per device, and combines with the
MEASURED single-chip NTT rate into efficiency estimates under stated
bandwidth assumptions:

    t_compute(S) = n / S / single_chip_points_per_sec
    t_comm(S)    = Σ_op wire_bytes_per_device(op) / BW
    efficiency   = t_compute / (t_compute + t_comm)      (no overlap)
    efficiency_overlap = t_compute / max(t_compute, t_comm)

Wire-bytes model per op (shard = the op's per-device operand bytes):
    all-to-all:          shard · (S-1)/S     (each device keeps 1/S)
    collective-permute:  shard               (every element moves)
    all-gather:          shard_in · (S-1)    (ring: receives S-1 shards)
    reduce-scatter:      shard_in · (S-1)/S

Writes artifacts/SCALING_MODEL_r05.json. Assumption values are parameters
recorded in the artifact, NOT claims about this machine.
"""

import json
import os
import re
import sys

# clean-slate CPU JAX before the interpreter's axon preload wins (the
# sitecustomize registers the TPU plugin and overrides JAX_PLATFORMS)
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOG_N = int(os.environ.get("ZKSTARK_SCALING_LOGN", "24"))
# measured single-chip rate (BENCH_r04 / probe_r05): points/sec at 2^24
SINGLE_CHIP_PPS = float(os.environ.get("ZKSTARK_CHIP_PPS", "1.66e9"))
BW = {
    # one-direction effective bandwidths, bytes/sec (stated assumptions)
    "ici_v5e": 1.86e11,  # intra-slice ICI per chip
    "dcn_100g": 1.25e10,  # cross-host 100 Gbps NIC per host
}

_DTYPE_BYTES = {"u32": 4, "s32": 4, "f32": 4, "u8": 1, "s8": 1, "bf16": 2, "u64": 8}

_SHAPE_RE = re.compile(r"(u8|s8|u32|s32|u64|f32|bf16)\[([0-9,]*)\]")
_OPS = ("all-to-all", "collective-permute", "all-gather", "reduce-scatter")


def _result_bytes(line: str) -> int:
    """Bytes of the op's RESULT shape: in optimized-HLO text the type sits
    on the RHS, `%name = u32[dims]{layout} all-to-all(...)`."""
    rhs = line.split("=", 1)[1]
    m = _SHAPE_RE.search(rhs)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def extract_collectives(hlo_text: str):
    out = []
    for line in hlo_text.splitlines():
        ls = line.strip()
        if "=" not in ls:
            continue
        rhs = ls.split("=", 1)[1]
        for op in _OPS:
            if re.search(rf"\b{op}(-start)?\(", rhs):
                out.append({"op": op, "result_bytes": _result_bytes(ls)})
                break
    return out


def wire_bytes_per_device(op: str, result_bytes: int, s: int) -> float:
    if op == "all-to-all":
        return result_bytes * (s - 1) / s
    if op == "collective-permute":
        return result_bytes
    if op == "all-gather":
        return result_bytes * (s - 1) / s  # result is the full gather
    if op == "reduce-scatter":
        return result_bytes * (s - 1)  # result is the scattered shard
    return 0.0


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zkstark_tpu.field import fp
    from zkstark_tpu.parallel.mesh import DOMAIN_AXIS
    from zkstark_tpu.parallel.ntt_sharded import ntt_sixstep

    n = 1 << LOG_N
    root = fp.subgroup_generator(n)
    devices = jax.devices("cpu")
    results = {
        "log_n": LOG_N,
        "single_chip_points_per_sec": SINGLE_CHIP_PPS,
        "bandwidth_assumptions_bytes_per_sec": BW,
        "wire_model": "a2a:(S-1)/S*res, cp:res, ag:(S-1)/S*res, rs:(S-1)*res",
        "shards": [],
    }
    for s in (2, 4, 8):
        mesh = Mesh(np.array(devices[:s]), (DOMAIN_AXIS,))
        sharding = NamedSharding(mesh, P(DOMAIN_AXIS))

        def fn(v):
            return ntt_sixstep(v, n, root, mesh=mesh)

        lowered = jax.jit(fn, in_shardings=sharding, out_shardings=sharding).lower(
            jax.ShapeDtypeStruct((n,), jnp.uint32)
        )
        compiled = lowered.compile()
        txt = compiled.as_text()
        cols = extract_collectives(txt)
        # result_bytes in the SPMD module are already per-device shapes
        per_dev_spmd = sum(
            wire_bytes_per_device(c["op"], c["result_bytes"], s) for c in cols
        )
        t_compute = n / s / SINGLE_CHIP_PPS
        entry = {
            "shards": s,
            "collectives": {},
            "wire_bytes_per_device": per_dev_spmd,
            "t_compute_s": t_compute,
        }
        for c in cols:
            entry["collectives"].setdefault(c["op"], {"count": 0, "result_bytes": 0})
            entry["collectives"][c["op"]]["count"] += 1
            entry["collectives"][c["op"]]["result_bytes"] += c["result_bytes"]
        for name, bw in BW.items():
            t_comm = per_dev_spmd / bw
            entry[f"efficiency_{name}"] = round(
                t_compute / (t_compute + t_comm), 4
            )
            entry[f"efficiency_{name}_overlap"] = round(
                min(1.0, t_compute / max(t_compute, t_comm)), 4
            )
        results["shards"].append(entry)
        print(json.dumps(entry), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "SCALING_MODEL_r05.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": out}), flush=True)


if __name__ == "__main__":
    main()
