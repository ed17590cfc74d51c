"""Hash-compare every oracled query against DuckDB at an arbitrary SF.

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
  (defaults: /root/testdata/sf0.1, all oracled queries)
  Prefix a name with '-' to EXCLUDE it instead (mixing include and
  exclude is an error).

Oracle-side cost: four registered oracles are super-linear in DuckDB
(the all-pairs 3-gram Jaccard CTE and the recursive-CTE connected
components built on it — >>60s at sf0.1 on the ORACLE side while the
Spark side finishes in seconds). The sweep substitutes FAST_ORACLES
for them: semantically-identical reformulations (blocked numpy matmul
for pairwise shingle intersections; union-find for the reachability
fixpoint; a materialized candidate temp table for the TF-IDF rerank
tail) that produce bit-identical rows — equivalence to the registered
SQL is itself pinned at sf0.01 by tests/test_sweep_oracles.py, and the
driver / pytest replica still run the registered SQL verbatim. Pass
--no-fast to force the registered SQL everywhere.

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


# -------------------------------------------------------- fast oracles
# Sweep-time reformulations of the four oracle-side-quadratic SQL
# oracles. Each returns (rows, cols) in the same shape `con.sql(...)`
# would. The REGISTERED oracles stay authoritative (driver gate +
# tests/test_oracle.py run them verbatim at sf0.01); these exist so the
# default sf0.1 sweep covers 166/166 oracled queries in minutes. Their
# row-for-row equivalence to the registered SQL is pinned at sf0.01 by
# tests/test_sweep_oracles.py. Formulations are deliberately DIFFERENT
# from the Spark implementations (matmul vs join, union-find vs label
# propagation) so they stay an independent check.


def _shingle_matrix(con):
    """(doc_ids, sizes, A) — A is the docs x distinct-shingles 0/1
    matrix in float32 (counts <= 98 per doc, exactly representable).
    Shingle lists come from the same DuckDB fragment the registered
    oracles use, so tokenization is shared, not re-derived."""
    import numpy as np

    from vector_db_core_spark.operators.llm import _SHINGLES

    rows = con.sql(
        f"SELECT doc_id, {_SHINGLES} AS s FROM documents ORDER BY doc_id"
    ).fetchall()
    doc_ids = [r[0] for r in rows]
    vocab: dict[str, int] = {}
    for _, s in rows:
        for sng in s:
            vocab.setdefault(sng, len(vocab))
    a = np.zeros((len(rows), len(vocab)), dtype=np.float32)
    for i, (_, s) in enumerate(rows):
        for sng in s:
            a[i, vocab[sng]] = 1.0
    return doc_ids, a.sum(axis=1).astype(np.int64), a


def fast_jaccard_pairs(con):
    """_JACCARD_PAIRS_SQL: all-pairs 3-gram Jaccard >= 0.5, via blocked
    dense matmul (intersection counts are exact small ints in float32;
    the jaccard division is the same int/int -> float64 as the SQL)."""
    import numpy as np

    doc_ids, sizes, a = _shingle_matrix(con)
    n = len(doc_ids)
    out = []
    block = 2048
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        inter = (a[lo:hi] @ a.T).astype(np.int64)  # exact counts
        for bi in range(hi - lo):
            i = lo + bi
            union = sizes[i] + sizes - inter[bi]
            jac = inter[bi].astype(np.float64) / union.astype(np.float64)
            for j in np.nonzero(jac >= 0.5)[0]:
                if j > i:
                    out.append((doc_ids[i], doc_ids[int(j)], float(jac[int(j)])))
    return out, ["doc_a", "doc_b", "jaccard"]


def fast_incremental_jaccard(con):
    """Batch(doc_id%10==0) x corpus(doc_id%10!=0) Jaccard >= 0.5 — the
    oracle of dedup_incremental_minhash AND streaming_minhash_dedup_replay
    (rectangular variant of fast_jaccard_pairs)."""
    import numpy as np

    doc_ids, sizes, a = _shingle_matrix(con)
    ids = np.asarray(doc_ids)
    bmask = ids % 10 == 0
    out = []
    bidx = np.nonzero(bmask)[0]
    cidx = np.nonzero(~bmask)[0]
    ac = a[cidx]
    for lo in range(0, len(bidx), 2048):
        rows = bidx[lo : lo + 2048]
        inter = (a[rows] @ ac.T).astype(np.int64)
        for k, i in enumerate(rows):
            union = sizes[i] + sizes[cidx] - inter[k]
            jac = inter[k].astype(np.float64) / union.astype(np.float64)
            for m in np.nonzero(jac >= 0.5)[0]:
                out.append((int(ids[i]), int(ids[cidx[m]]), float(jac[m])))
    return out, ["batch_doc_id", "corpus_doc_id", "jaccard"]


def _cluster_labels(con) -> dict[int, int]:
    """Union-find over the Jaccard pairs -> {doc_id: min-of-component}
    for every doc that appears in at least one edge (the same node set
    as the recursive CTE's `reach` seed)."""
    pairs, _ = fast_jaccard_pairs(con)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _j in pairs:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def fast_connected_clusters(con):
    labels = _cluster_labels(con)
    return sorted(labels.items()), ["doc_id", "cluster_rep"]


def fast_cluster_survivors(con):
    """Survivor per cluster: quality scores come from the registered
    oracle's own linear CTEs (run verbatim); only the quadratic
    label derivation is replaced."""
    from vector_db_core_spark.operators.llm import _TOKS

    labels = _cluster_labels(con)
    quality = dict(
        con.sql(
            f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (SELECT doc_id,
                         CAST(len(toks) AS INT) AS n_tokens,
                         CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS ttr,
                         CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE) AS stop_ratio
                  FROM t)
            SELECT doc_id,
                   0.5 * ttr + 0.3 * (1.0 - stop_ratio)
                     + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
            FROM s
            """
        ).fetchall()
    )
    groups: dict[int, list[int]] = {}
    for doc_id in quality:
        groups.setdefault(labels.get(doc_id, doc_id), []).append(doc_id)
    out = []
    for rep, members in groups.items():
        best = min(members, key=lambda d: (-quality[d], d))
        out.append((rep, best, len(members), quality[best]))
    return out, ["cluster_rep", "survivor_doc_id", "n_members", "survivor_quality"]


def fast_tfidf_rerank(con):
    """_TFIDF_RERANK_SQL with the quadratic candidate CTE replaced by a
    materialized temp table (the registered SQL's tail runs verbatim
    via string surgery, so the TF-IDF arithmetic is never re-derived)."""
    import re

    from vector_db_core_spark.operators.llm import _TFIDF_RERANK_SQL

    pairs, _ = fast_jaccard_pairs(con)
    con.execute("CREATE OR REPLACE TEMP TABLE sweep_cand (doc_a BIGINT, doc_b BIGINT)")
    if pairs:
        con.executemany(
            "INSERT INTO sweep_cand VALUES (?, ?)", [(a, b) for a, b, _ in pairs]
        )
    sql, n_subs = re.subn(
        r"cand AS \(.*?>= 0\.5\),",
        "cand AS (SELECT doc_a, doc_b FROM sweep_cand),",
        _TFIDF_RERANK_SQL,
        flags=re.DOTALL,
    )
    assert n_subs == 1, "_TFIDF_RERANK_SQL candidate CTE not found — update fast_tfidf_rerank"
    rel = con.sql(sql)
    return rel.fetchall(), [c[0] for c in rel.description]


def fast_cluster_safe_folds(con):
    """pipeline_cluster_safe_folds: fold = md5-fold of the cluster
    rep's text; labels from union-find, folds from DuckDB's own md5."""
    labels = _cluster_labels(con)
    own = dict(
        con.sql(
            "SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 6))::BIGINT % 5 AS INT)"
            " FROM documents"
        ).fetchall()
    )
    out = [(d, labels.get(d, d), own[labels.get(d, d)]) for d in own]
    return out, ["doc_id", "fold_key_doc_id", "fold"]


def fast_semdedup_fixed_cells(con):
    """sim_semdedup_fixed_cells: fixed-centroid assignment + dominance
    with the left-fold cosine replayed DIM-SEQUENTIALLY in numpy (acc
    starts at 0.0 and adds one dimension's product at a time —
    bit-identical to list_reduce / F.aggregate, unlike np.dot's
    pairwise summation)."""
    import numpy as np

    tau = 0.35
    rows = con.sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.array([r[1] for r in rows], dtype=np.float64)
    n, dim = v.shape

    def seq_norm(mat):
        acc = np.zeros(mat.shape[0])
        for d in range(dim):
            acc += mat[:, d] * mat[:, d]
        return np.sqrt(acc)

    def seq_dot(a_mat, b_mat):  # (p, q) pairwise fold, sequential over dims
        acc = np.zeros((a_mat.shape[0], b_mat.shape[0]))
        for d in range(dim):
            acc += a_mat[:, d][:, None] * b_mat[:, d][None, :]
        return acc

    norms = seq_norm(v)
    cmask = ids < 16
    cells_ids, cv, cnorm = ids[cmask], v[cmask], norms[cmask]
    csim_all = seq_dot(v, cv) / (norms[:, None] * cnorm[None, :])
    pick = np.argmax(csim_all, axis=1)  # first max == lowest cell id on ties
    cell = cells_ids[pick]
    csim = csim_all[np.arange(n), pick]

    out = []
    for c in cells_ids:
        mi = np.nonzero(cell == c)[0]
        order = sorted(range(len(mi)), key=lambda k: (csim[mi[k]], ids[mi[k]]))
        mem = mi[order]  # rank order: csim asc, vec_id
        pc = seq_dot(v[mem], v[mem]) / (norms[mem][:, None] * norms[mem][None, :])
        for bpos in range(len(mem)):
            doms = [apos for apos in range(bpos) if pc[apos, bpos] >= tau]
            b = mem[bpos]
            if doms:
                out.append(
                    (int(ids[b]), int(c), float(csim[b]), len(doms),
                     int(ids[mem[doms[0]]]), "prune")
                )
            else:
                out.append((int(ids[b]), int(c), float(csim[b]), 0, None, "keep"))
    cols = ["vec_id", "cell", "centroid_sim", "n_dominators", "pruned_by", "action"]
    return out, cols


FAST_ORACLES = {
    "sim_semdedup_fixed_cells": fast_semdedup_fixed_cells,
    "dedup_ngram_jaccard_pairs": fast_jaccard_pairs,
    "dedup_minhash_lsh_pairs": fast_jaccard_pairs,
    "dedup_connected_clusters": fast_connected_clusters,
    "dedup_cluster_survivors": fast_cluster_survivors,
    "sim_tfidf_rerank_pairs": fast_tfidf_rerank,
    "pipeline_cluster_safe_folds": fast_cluster_safe_folds,
    "dedup_incremental_minhash": fast_incremental_jaccard,
    "streaming_minhash_dedup_replay": fast_incremental_jaccard,
    "streaming_minhash_dedup_instream": fast_incremental_jaccard,
}


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-fast"]
    use_fast = len(argv) == len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    args = argv[1:]
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
        fast = use_fast and name in FAST_ORACLES
        try:
            sdf = queries[name](spark, sf_dir)
            s = norm([tuple(r) for r in sdf.collect()], sdf.columns)
            if fast:
                rows, cols = FAST_ORACLES[name](con)
            else:
                rel = con.sql(oracles[name])
                rows, cols = rel.fetchall(), [c[0] for c in rel.description]
            d = norm([tuple(r) for r in rows], cols)
            ok = s == d
        except Exception as exc:  # noqa: BLE001 - a sweep must finish
            print(f"[{i+1}/{len(names)}] {name} ERROR {type(exc).__name__}: {str(exc)[:200]}")
            bad.append(name)
            continue
        finally:
            # several operators persist() shared intermediates (DSIR,
            # LM scoring, PageRank, PCA) and a 200+-query sweep in one
            # JVM would otherwise accumulate their cached blocks for
            # the whole run (the bench.py / scale_ladder.py rule)
            spark.catalog.clearCache()
        status = ("MATCH" if ok else "MISMATCH") + (" (fast-oracle)" if fast else "")
        if not ok:
            bad.append(name)
        print(f"[{i+1}/{len(names)}] {name} {status} rows={len(s)} {time.time()-t0:.1f}s", flush=True)
    print("MISMATCHES:", bad or "NONE")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
