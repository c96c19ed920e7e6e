"""Driver-conditions smoke test (round-11, VERDICT r10 #5).

The per-round correctness harness builds its OWN plain
``SparkSession.builder.getOrCreate()`` (no ``ecostream.session.get_spark``,
no PYTHONPATH pre-export) and only then imports ``__spark_entry__``.  Any
query whose correctness depends on environment-setup ORDER (the st18
protobuf bug of round 10: the vendored runtime was exported to PYTHONPATH
only before the JVM launched) passes the builder's sweep but crashes in
the driver.  This test reproduces the driver's exact flow in a fresh
subprocess — plain session first, entry import second — so that class of
bug is caught before a query reaches a signing slot.

st18 is the representative: it is the one query that spawns a JVM-forked
Python worker (the TWS driver worker) which inherits the JVM's
environment rather than ours, i.e. the worst-case launch-order
dependency in the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SCRIPT = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-conditions-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # AFTER the JVM exists, like the driver

qs = entry.queries()
df = qs["st18_tws_running_counts"](spark, sys.argv[1])
rows = sorted((r["event_type"], r["n"]) for r in df.collect())
assert rows, "st18 empty"
# The other three TWS legs ride the same .pth machinery; run them in
# the same driver-style session so a regression in any typed-state or
# timer path surfaces here before a signing slot burns on it.
assert qs["st19_tws_ttl_expiry"](spark, sys.argv[1]).count() >= 0
assert qs["st20_tws_recent_events"](spark, sys.argv[1]).count() > 0
assert qs["st21_tws_daily_map"](spark, sys.argv[1]).count() > 0
assert qs["st23_tws_session_windows"](spark, sys.argv[1]).count() > 0
print("SMOKE_OK", rows)
spark.stop()
"""


def test_st18_under_plain_driver_session():
    """st18 must run under a pre-existing plain SparkSession — the
    driver's flow — not just under get_spark()'s pre-exported env."""
    sf_dir = "/root/testdata/sf0.001"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the driver gives us no vendor path
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    # Remove any pre-installed .pth shim so the subprocess must install
    # it itself (ensure_protobuf) — otherwise a leftover shim from an
    # earlier run would mask a regression in the self-healing path.
    import site

    for sp in site.getsitepackages():
        for name in ("ecostream_protobuf_vendor.pth", "ecostream_pkg_root.pth"):
            shim = os.path.join(sp, name)
            if os.path.exists(shim):
                os.remove(shim)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT, sf_dir],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"driver-style st18 run failed\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "SMOKE_OK" in proc.stdout


def test_st18_from_foreign_cwd(tmp_path):
    """Same driver-style flow, but launched from OUTSIDE the repo: the
    TWS driver worker unpickles the processor by module reference, so
    ``ecostream`` must resolve in a fresh interpreter whose cwd is NOT
    the repo root (the pkg-root .pth shim's job — round 11 reproduced
    the ModuleNotFoundError from /tmp before it existed)."""
    sf_dir = "/root/testdata/sf0.001"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    import site

    for sp in site.getsitepackages():
        for name in ("ecostream_protobuf_vendor.pth", "ecostream_pkg_root.pth"):
            shim = os.path.join(sp, name)
            if os.path.exists(shim):
                os.remove(shim)
    script = f"import sys; sys.path.insert(0, {REPO!r})\n" + _DRIVER_SCRIPT
    proc = subprocess.run(
        [sys.executable, "-c", script, sf_dir],
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"foreign-cwd st18 run failed\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "SMOKE_OK" in proc.stdout
