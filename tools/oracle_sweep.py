"""Hash-compare every oracled query against DuckDB at an arbitrary SF.

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
  (defaults: /root/testdata/sf0.1, all oracled queries)
  Prefix a name with '-' to EXCLUDE it instead (mixing include and
  exclude is an error). Known exclusion case: the recursive-CTE
  cluster oracles and the all-pairs Jaccard oracle are themselves
  super-linear in DuckDB (>>60s at sf0.1 on the ORACLE side while the
  Spark side finishes in seconds) — sweep them at sf0.01 where the
  driver gate already checks them, and verify the Spark side alone at
  larger SFs.

The driver's hard gate runs at sf0.01; this sweep re-runs the same
order-insensitive value comparison at any other fixture (typically
sf0.1 — 10x the gate) to surface SCALE-DEPENDENT correctness drift:
integer overflow, cap boundaries, tie-break instability, thresholds
that silently empty out (the class of bug that caught q11's absolute
share threshold). Results print one line per query plus a final
MISMATCHES list; exit code 1 if any.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    args = sys.argv[2:]
    excludes = {a[1:] for a in args if a.startswith("-")}
    only = {a for a in args if not a.startswith("-")}
    if excludes and only:
        raise SystemExit("mix of include and exclude names")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = entry.queries(), entry.oracle_sql()
    names = [n for n in oracles if (not only or n in only) and n not in excludes]
    bad: list[str] = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s = norm([tuple(r) for r in sdf.collect()], sdf.columns)
            rel = con.sql(oracles[name])
            d = norm([tuple(r) for r in rel.fetchall()], [c[0] for c in rel.description])
            ok = s == d
        except Exception as exc:  # noqa: BLE001 - a sweep must finish
            print(f"[{i+1}/{len(names)}] {name} ERROR {type(exc).__name__}: {str(exc)[:200]}")
            bad.append(name)
            continue
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            bad.append(name)
        print(f"[{i+1}/{len(names)}] {name} {status} rows={len(s)} {time.time()-t0:.1f}s", flush=True)
    print("MISMATCHES:", bad or "NONE")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
