"""initialize_distributed must be a harmless no-op in a single process
(SURVEY.md §5 distributed-comms row) — it is wired into the CLI and bench
startup, so a plain single-host run exercises exactly this path."""

from zkstark_tpu.parallel.mesh import initialize_distributed


def test_single_process_noop():
    assert initialize_distributed() == 1
    assert initialize_distributed() == 1  # idempotent
