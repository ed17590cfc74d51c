"""Build an ~sf1 fixture by replicating sf0.1 ten-fold with key offsets.

The driver ships fixtures up to sf0.1, where the 20-query headline is
~60% JVM fixed cost — too small for the 2x perf gate to see a plan
regression. This tool manufactures a 10x fixture (~sf1: 6M lineitem,
1.5M orders, 1M events, 50k documents, 20k embeddings) so BASELINE.md
can record a SCALE-SLOPE datapoint: any query whose time grows
super-linearly from sf0.1 to ~sf1 has a plan problem the small run
can't show.

Construction: each surrogate/foreign key is offset per copy so
referential integrity holds copy-locally (copy i's orders reference
copy i's customers, etc.); bounded dims (region, nation) are shared by
all copies, exactly like production, and nation/region keys are NOT
offset. Non-key content is replicated verbatim — meaning every
document/embedding gains 9 exact twins, which deliberately stress-tests
the dedup family's candidate generation (identical docs share all LSH
bands) rather than diluting it.

Usage: python tools/make_scaled_fixture.py [dest_dir] [copies]
  (defaults: /tmp/vdbc_sf1, 10 copies)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: key column → per-copy offset (≥ 10x the column's max at sf0.1, so
#: copies never collide and originals keep their ids in copy 0)
OFFSETS = {
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "o_custkey": 100_000,
    "c_custkey": 100_000,
    "p_partkey": 100_000,
    "l_partkey": 100_000,
    "s_suppkey": 10_000,
    "l_suppkey": 10_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 10_000,
}

SCALED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
SHARED = ["region", "nation"]


def build(dest: str, copies: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in SHARED:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: shared dim copied")
    for t in SCALED:
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        selects = []
        for i in range(copies):
            exprs = ", ".join(
                f"{c} + {i * OFFSETS[c]} AS {c}" if c in OFFSETS and i else c
                for c in cols
            )
            selects.append(f"SELECT {exprs} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vdbc_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(dest, copies)
