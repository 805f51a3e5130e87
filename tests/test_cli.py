"""CLI driver tests — the reference main() behavior (main.rs:15-36) plus the
config surface the reference lacks, exercised in-process via main(argv)."""

import json

import pytest

from zkstark_tpu.__main__ import main
from zkstark_tpu.protocol.air import SQUARE_CHAIN, fibonacci_sq_trace


def _trace_last(n, secret):
    return int(fibonacci_sq_trace(n, secret)[-1])


def test_prove_then_verify_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "proof.bin")
    rc = main(
        ["--json", "--trace-len", "63", "prove", "--secret", "31415", "--out", out]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["proof_size_bytes"] > 0
    boundary = rec["boundary_last"]
    assert boundary == _trace_last(63, 31415)

    rc = main(
        [
            "--json",
            "--trace-len",
            "63",
            "--boundary-last",
            str(boundary),
            "verify",
            out,
        ]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["verified"] is True
    assert rec["checks_passed"] == 5


def test_verify_wrong_statement_fails(tmp_path, capsys):
    out = str(tmp_path / "proof.bin")
    assert main(["--json", "--trace-len", "63", "prove",
                 "--secret", "31415", "--out", out]) == 0
    capsys.readouterr()
    rc = main(
        ["--json", "--trace-len", "63", "--boundary-last", "12345", "verify", out]
    )
    assert rc == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["verified"] is False and rec["error"]


def test_run_reports_timings(capsys):
    rc = main(["--json", "--trace-len", "63", "run", "--secret", "7"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["prover_runtime_seconds"] >= 0
    assert rec["verifier_runtime_seconds"] >= 0
    assert rec["checks_passed"] == 5


def test_bad_witness_reports_error(capsys):
    # explicit public statement + a secret that doesn't satisfy it
    rc = main(
        ["--json", "--trace-len", "63", "--boundary-last", "999",
         "prove", "--secret", "123"]
    )
    assert rc == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "boundary" in rec["error"]


def test_square_chain_air_flag(tmp_path, capsys):
    out = str(tmp_path / "proof.bin")
    rc = main(
        [
            "--json",
            "--trace-len",
            "63",
            "--air",
            "square-chain",
            "prove",
            "--secret",
            "271828",
            "--out",
            out,
        ]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["boundary_last"] == int(SQUARE_CHAIN.trace(63, 271828)[-1])


def test_prove_with_checkpoint_resumes(tmp_path, capsys):
    """--checkpoint proving succeeds and CONSUMES the checkpoint file on
    success (a stale file must not hijack a later different statement —
    advisor r4); a second identical invocation re-proves from scratch and
    yields the same bytes."""
    out1 = str(tmp_path / "p1.bin")
    out2 = str(tmp_path / "p2.bin")
    ck = str(tmp_path / "ck.npz")
    args = ["--json", "--trace-len", "63"]
    assert main(args + ["prove", "--secret", "31415", "--out", out1,
                        "--checkpoint", ck]) == 0
    import os

    assert not os.path.exists(ck)  # spent on success
    assert main(args + ["prove", "--secret", "31415", "--out", out2,
                        "--checkpoint", ck]) == 0
    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_verify_unreadable_proof_file(tmp_path, capsys):
    bad = str(tmp_path / "garbage.bin")
    open(bad, "wb").write(b"nonsense")
    rc = main(["--json", "--trace-len", "63", "--boundary-last", "1",
               "verify", bad])
    assert rc == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["verified"] is False and "unreadable" in rec["error"]

    rc = main(["--json", "verify", str(tmp_path / "missing.bin")])
    assert rc == 1
