"""Command-line entry point — the engine's answer to the reference's
interactive client (consultas.py:365-440, menu options 0-12).

The reference ships a socket client with 12 hard-coded query branches;
here every declared query is addressable by name, over any testdata
scale factor:

    python -m ecostream list
    python -m ecostream run a2_group_counts --sf-dir /root/testdata/sf0.01
    python -m ecostream stats
    python -m ecostream explain j2_star_revenue_by_region

``stats`` is the reference's marquee screen (menu option 1 — totals +
group counts, consumer.py:151-168) as a shortcut.  No socket, no
pickle, no 1 MB recv truncation (consultas.py:28) — the driver process
IS the query engine.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m ecostream",
        description="Run declared ecostream queries on the testdata tables.",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries (o = oracle-checked)")
    for name, hlp in [
        ("run", "run one declared query and print its result"),
        ("explain", "print the query's formatted physical plan"),
    ]:
        p = sub.add_parser(name, help=hlp)
        p.add_argument("query", help="declared query name (see: list)")
        p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        p.add_argument("--limit", type=int, default=20, help="max rows to print")
    p = sub.add_parser("stats", help="the reference's stats screen (menu 1)")
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p = sub.add_parser(
        "compact", help="compact a fragmented parquet directory"
    )
    p.add_argument("src", help="source parquet directory")
    p.add_argument("dst", help="destination parquet directory")
    p.add_argument(
        "--target-file-mb", type=int, default=128, help="target file size (MiB)"
    )
    p.add_argument(
        "--cluster-by",
        default=None,
        help="comma-separated columns to range-cluster while compacting",
    )
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from ecostream.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            flag = "o" if name in ORACLES else " "
            print(f"{flag} {name}")
        return 0

    from pyspark.sql import SparkSession

    from ecostream.session import get_spark

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"ecostream-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "compact":
            from ecostream.storage import compact

            n = compact(
                spark,
                args.src,
                args.dst,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
                cluster_cols=args.cluster_by.split(",") if args.cluster_by else None,
            )
            print(f"compacted {args.src} -> {args.dst} ({n} files)")
            return 0
        if args.cmd == "stats":
            QUERIES["a2_group_counts"](spark, args.sf_dir).orderBy(
                "dim", "val"
            ).show(100, truncate=False)
            return 0
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see: python -m ecostream list",
                  file=sys.stderr)
            return 2
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain(mode="formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        # Only stop a session this invocation created — getOrCreate may
        # have joined a host process's session (e.g. the test suite's).
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
