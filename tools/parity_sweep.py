"""Run the t2 gate locally: every declared query vs its oracle at a
given sf_dir, via tests/parity.py compare. Prints failures + summary."""
import sys, time, traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from parity import duck_connection, compare  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import __spark_entry__ as contract
    from ecostream.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    queries, oracles = contract.queries(), contract.oracle_sql()
    fails, no_oracle, slow_oracles = [], [], []
    tot_eng = tot_ora = 0.0
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
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
