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

``--perturb`` (round-6, the r5 verdict's task 2): verbatim twins
degenerate pair-emitting ops — with 100 copies every 8-token span sits
in ~100 docs and the 20-doc boilerplate cap classifies the WHOLE
fixture as boilerplate (0 rows), and every LSH pair is a trivial
jaccard=1.0 twin. With the flag, copy i>0 of ``documents.text`` gets
deterministic token-level edits keyed off (original doc_id, copy
index, token position): ~5% of tokens DROPPED (hash%20==0) and ~5%
REWRITTEN to a copy-marked novel token (hash%20==1). Copies become
NEAR-dups (copy↔original 3-gram jaccard ≈0.7, copy↔copy ≈0.55 —
straddling the 0.5 threshold like organic paraphrase families), span
doc-frequencies spread below/above the boilerplate cap instead of all
landing on one side, and n_chars is recomputed so the fixture keeps
its schema invariants. No randomness — same inputs, same fixture,
bit-for-bit.

Usage: python tools/make_scaled_fixture.py [dest_dir] [copies] [--perturb]
  (defaults: /tmp/vdbc_sf1, 10 copies, verbatim)
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


def _perturbed_documents_select(i: int) -> str:
    """Copy ``i`` of documents with deterministic token edits.

    Token j of original doc d in copy i is dropped when
    ``hash(d, i, j) % 20 == 0`` and rewritten to ``tok~<i%7>`` when
    ``% 20 == 1`` — ~10% of tokens edited total, independent across
    copies, reproducible everywhere (DuckDB's hash is stable).
    """
    off = i * OFFSETS["doc_id"]
    edit = f"hash(doc_id, {i}, z[2]) % 20"
    text_expr = f"""array_to_string(
        list_transform(
          list_filter(list_zip(_w, generate_series(1, len(_w))),
                      z -> {edit} != 0),
          z -> CASE WHEN {edit} = 1
                    THEN z[1] || '~{i % 7}' ELSE z[1] END),
        ' ')"""
    return f"""
      SELECT doc_id, text, lang, source,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM (SELECT doc_id + {off} AS doc_id, {text_expr} AS text, lang, source
            FROM (SELECT *,
                         list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS _w
                  FROM '{SRC}/documents.parquet'))"""


def build(dest: str, copies: int, perturb: bool = False) -> None:
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
            if perturb and t == "documents" and i:
                selects.append(_perturbed_documents_select(i))
                continue
            exprs = ", ".join(
                f"{c} + {i * OFFSETS[c]} AS {c}" if c in OFFSETS and i else c
                for c in cols
            )
            selects.append(f"SELECT {exprs} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        # Small ROW_GROUP_SIZE: DuckDB's default (122,880 rows) packs a
        # 500k-doc table into 5 giant row groups in ONE file, so Spark's
        # byte-range splits collapse to 1-2 non-empty scan tasks and any
        # CPU-heavy projection above the scan (interpreted higher-order
        # span/gram generation) runs single-threaded — a fixture-layout
        # artifact, not a plan property. Production corpora are many
        # ~128 MB files with many row groups; small row groups restore
        # that splittability (observed: the ~sf10 span ladder fell from
        # 12+ min single-task to parallel with this alone). documents/
        # embeddings get 2k rows per group so even the ~sf1 point scans
        # with ~32-way parallelism; the scan-bound fact tables take 16k.
        rg = 2048 if t in ("documents", "embeddings") else 16384
        con.execute(
            f"COPY ({union}) TO '{dest}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.sql(f"SELECT count(*) FROM '{dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = len(args) != len(sys.argv) - 1
    dest = args[0] if args else "/tmp/vdbc_sf1"
    copies = int(args[1]) if len(args) > 1 else 10
    build(dest, copies, perturb)
