"""Worker for the EXECUTED multi-process bootstrap test
(tests/test_multiprocess.py): one of N processes of a real
`jax.distributed.initialize` cluster over a localhost coordinator.

Run as:  python tests/mp_worker.py <process_id> <n_processes> <coord> <outdir>

Each process contributes 2 virtual CPU devices, builds the process-spanning
('host','chip') mesh, proves the small FibonacciSq statement SHARDED over
all 4 global devices (cross-process collectives over the coordinator's
transport), and writes state+transcript bytes for the parent to compare.
"""

import os
import sys

# Env must be set before jax initializes any backend (the sitecustomize
# preload imports jax but must not have created backends yet —
# initialize_distributed asserts exactly that ordering).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, coord, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    from zkstark_tpu.parallel.mesh import (
        initialize_distributed,
        make_host_chip_mesh,
    )

    got = initialize_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert got == nprocs, f"process_count {got} != {nprocs}"

    import jax

    assert jax.process_index() == pid
    assert len(jax.devices()) == 2 * nprocs, jax.devices()
    # rows = processes (DCN axis), columns = local devices (ICI axis)
    mesh = make_host_chip_mesh()
    assert mesh.shape == {"host": nprocs, "chip": 2}, mesh.shape

    from zkstark_tpu.protocol.air import fibonacci_sq_trace
    from zkstark_tpu.protocol.config import StarkConfig
    from zkstark_tpu.protocol.prover import prove

    trace = fibonacci_sq_trace(63, 3141592)
    cfg = StarkConfig(trace_len=63, blowup=8, boundary_last=int(trace[-1]))
    proof = prove(cfg, 3141592, mesh=mesh)

    with open(os.path.join(outdir, f"proof_{pid}.bin"), "wb") as f:
        f.write(proof.state + proof.data)
    print(f"worker {pid}: ok ({len(proof.data)} bytes)", flush=True)


if __name__ == "__main__":
    main()
