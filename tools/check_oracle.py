"""Local replica of the driver's t2 correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01; compare row-count, schema, and order-insensitive values."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

import os

_args = sys.argv[1:]
SF_DIR = "/root/testdata/sf0.01"
ONLY = []
for a in _args:
    if os.path.isdir(a):
        SF_DIR = a
    else:
        ONLY.append(a)  # restrict the run to these query names


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .appName("oracle-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    queries = entry_mod.queries()
    if ONLY:
        unknown = [n for n in ONLY if n not in queries]
        if unknown:
            sys.exit(f"unknown query names: {unknown}")
        queries = {n: queries[n] for n in ONLY}
    oracles = entry_mod.oracle_sql()
    failures = []
    unoracled = []
    for name, fn in queries.items():
        try:
            sdf = fn(spark, SF_DIR)
            spark_rows = sorted([tuple(r) for r in sdf.collect()])
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            unoracled.append(name)
            print(f"ROWS-ONLY {name}: no oracle SQL "
                  f"({len(spark_rows)} rows, runs clean)")
            continue
        try:
            duck_rows = sorted([tuple(r) for r in con.execute(oracles[name]).fetchall()])
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append((name, f"row count {len(spark_rows)} vs {len(duck_rows)}"))
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}")
            print("  spark:", spark_rows[:8])
            print("  duck :", duck_rows[:8])
            continue
        mism = [(s, d) for s, d in zip(spark_rows, duck_rows) if s != d]
        if mism:
            failures.append((name, f"{len(mism)} value mismatches"))
            print(f"FAIL {name}: {len(mism)} mismatches")
            for s, d in mism[:8]:
                print(f"  spark={s}  duck={d}")
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")

    spark.stop()
    n_oracled = len(queries) - len(unoracled)
    ok = n_oracled - len(failures)
    tail = (f" + {len(unoracled)} rows-only ({', '.join(unoracled)})"
            if unoracled else "")
    print(f"\n{ok}/{n_oracled} oracled queries match{tail}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
