"""CLI smoke tests — the user-facing parity surface for the
reference's interactive client (consultas.py menu)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from .conftest import SF_SMOKE


def _run(argv) -> tuple[int, str]:
    from ecostream.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        code = main(argv)
    return code, buf.getvalue()


def test_cli_list_names_all_queries():
    from ecostream.queries import ORACLES, QUERIES

    code, out = _run(["list"])
    assert code == 0
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == len(QUERIES)
    assert sum(1 for l in lines if l.startswith("o ")) == len(ORACLES)


def test_cli_run_and_stats(spark):
    # `spark` fixture keeps the shared session; main() getOrCreate()s it
    # (and stop() is harmless at test teardown since conftest recreates).
    code, out = _run(["run", "a1_total_count", "--sf-dir", SF_SMOKE])
    assert code == 0
    assert "total" in out or "+" in out  # df.show table frame

    code, out = _run(["stats", "--sf-dir", SF_SMOKE])
    assert code == 0
    assert "event_type" in out

    code, out = _run(["explain", "f2_filter_by_type_limit", "--sf-dir", SF_SMOKE])
    assert code == 0
    assert "Physical Plan" in out

    code, _ = _run(["run", "no_such_query", "--sf-dir", SF_SMOKE])
    assert code == 2
