"""Run the t2 gate locally: every declared query vs its oracle at a
given sf_dir, via tests/parity.py compare. Prints failures + summary.

Also writes a compact JSON sidecar (``--out SWEEP_r0N.json``) with
totals and per-query engine/oracle seconds so each round's sweep
evidence is COMMITTED — VERDICT r7 #6: the d6 engine tower was only
discoverable by re-running the 25-minute sweep because the logs were
never an artifact.  Multiple scales append into the same sidecar.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from parity import duck_connection, compare  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1].split(",") if len(args) > 1 else None
    import __spark_entry__ as contract
    from ecostream.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    queries, oracles = contract.queries(), contract.oracle_sql()
    fails, no_oracle, slow_oracles = [], [], []
    tot_eng = tot_ora = 0.0
    per_query = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        eng = ora = 0.0
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                tm = compare(df, con, oracles[name], name)
                eng, ora = tm["engine_s"], tm["oracle_s"]
                status = "OK"
            else:
                te = time.time()
                n = df.count()
                eng = time.time() - te
                assert n >= 0
                no_oracle.append(name)
                status = f"ROWS {n}"
        except Exception as e:
            fails.append(name)
            status = f"FAIL {type(e).__name__}: {str(e)[:300]}"
            traceback.print_exc(limit=3)
        tot_eng += eng
        tot_ora += ora
        per_query[name] = {
            "engine_s": round(eng, 3),
            "oracle_s": round(ora, 3),
            "status": status.split(" ")[0],
        }
        if ora >= 8.0:
            slow_oracles.append((name, ora))
        print(
            f"{time.time()-t0:6.2f}s (engine {eng:5.2f}s, oracle "
            f"{ora:5.2f}s) {name}: {status}",
            flush=True,
        )
    print(f"\n=== {len(fails)} failures / {len(queries)} queries "
          f"({len(no_oracle)} rows-only) ===")
    print(f"=== engine total {tot_eng:.1f}s, oracle total {tot_ora:.1f}s ===")
    for n, s in sorted(slow_oracles, key=lambda x: -x[1]):
        print(f"SLOW ORACLE {s:6.2f}s {n}")
    for f in fails:
        print("FAIL", f)
    if out_path and not only:
        top = lambda key: [  # noqa: E731
            {"query": n, key: per_query[n][key]}
            for n in sorted(per_query, key=lambda q: -per_query[q][key])[:5]
        ]
        entry = {
            "sf_dir": sf_dir,
            "n_queries": len(per_query),
            "n_failures": len(fails),
            "n_rows_only": len(no_oracle),
            "engine_total_s": round(tot_eng, 1),
            "oracle_total_s": round(tot_ora, 1),
            "top5_engine": top("engine_s"),
            "top5_oracle": top("oracle_s"),
            "failures": fails,
            "per_query": per_query,
        }
        sidecar = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                sidecar = json.load(fh)
        sidecar[sf_dir] = entry
        with open(out_path, "w") as fh:
            json.dump(sidecar, fh, indent=1, sort_keys=True)
        print(f"=== sweep sidecar written: {out_path} [{sf_dir}] ===")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
