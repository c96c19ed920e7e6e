"""Audit raw result-type parity between each Spark query and its DuckDB oracle.

The driver's value-hash serializes raw values, so a DuckDB HUGEINT (-> float64
or object in pandas) vs Spark BIGINT (-> int64) mismatch fails the hash even
when values are equal (j14 in round 1).  The repo parity harness normalizes
widths, so this audit is the stricter check: run every oracle and every query
at sf0.001 and report any column whose *raw* pandas dtype differs.

Usage: python tools/dtype_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import pandas as pd  # noqa: E402

from parity import duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from ecostream.session import get_spark

    spark = get_spark()
    con = duck_connection(sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            oracle_df = con.sql(sql).df()
            spark_df = queries[name](spark, sf_dir).toPandas()
        except Exception as exc:  # pragma: no cover - audit tool
            bad.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            print(f"ERR  {name}: {exc}")
            continue
        o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        if list(o.columns) != list(s.columns):
            bad.append((name, f"columns spark={list(s.columns)} duck={list(o.columns)}"))
            print(f"COLS {name}: spark={list(s.columns)} duck={list(o.columns)}")
            continue
        for c in o.columns:
            od, sd = str(o[c].dtype), str(s[c].dtype)
            if od != sd:
                # object-vs-object is fine; inspect element types for object cols
                osamp = next((type(v).__name__ for v in o[c] if v is not None), None)
                ssamp = next((type(v).__name__ for v in s[c] if v is not None), None)
                if od == sd == "object" and osamp == ssamp:
                    continue
                bad.append((name, c))
                print(
                    f"TYPE {name}.{c}: duck={od}({osamp}) spark={sd}({ssamp})"
                )
    print(f"\n{len(bad)} mismatches across {len(oracles)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
