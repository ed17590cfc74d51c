"""Behavioral pins for the round-13 operator wave — independent
re-derivations (pure Python / numpy / DuckDB on raw parquet), not
engine-vs-engine comparisons: the hash gate already does those.
"""

from __future__ import annotations

import hashlib
import math

import duckdb

from tests.conftest import SF_ORACLE
from vector_db_core_spark.operators.registry import QUERIES


def test_bridge_edges_match_tarjan(spark):
    """graph_bridge_edges must equal an independent Tarjan low-link
    bridge finder run on the same pair set, and every reported split
    must conserve its component: n_side_a + n_side_b == |C|."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_span_pairs"](spark, SF_ORACLE)
        .select("doc_a", "doc_b")
        .collect()
    ]
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    disc, low, t, bridges = {}, {}, [0], set()
    for start in list(adj):
        if start in disc:
            continue
        disc[start] = low[start] = t[0]
        t[0] += 1
        stack = [(start, None, iter(adj[start]))]
        while stack:
            u, parent, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    disc[w] = low[w] = t[0]
                    t[0] += 1
                    stack.append((w, u, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent:
                    low[u] = min(low[u], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        bridges.add((min(p, u), max(p, u)))
    # component sizes via union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent[find(u)] = find(v)
    sizes = defaultdict(int)
    for n in adj:
        sizes[find(n)] += 1

    got = QUERIES["graph_bridge_edges"](spark, SF_ORACLE).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == bridges
    assert len(bridges) > 0, "fixture must exercise bridges"
    assert len(bridges) < len(pairs), "fixture must exercise cycle edges"
    for r in got:
        assert r.n_side_a >= 1 and r.n_side_b >= 1
        assert r.component_size == sizes[find(r.doc_a)], r


def test_theta_forecast_matches_python_recurrence(spark):
    """Re-run the theta pipeline (OLS sums -> exact-scale theta-2 line
    -> integer SES -> combination forecast) in pure Python from the
    raw daily series and require bit-identical output columns."""
    con = duckdb.connect()
    daily = con.sql(
        f"SELECT event_type, CAST(ts AS DATE) AS day,"
        f" SUM(CAST(round(value * 100) AS BIGINT)) AS cents"
        f" FROM '{SF_ORACLE}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict = {}
    for et, _day, cents in daily:
        series.setdefault(et, []).append(cents)
    expect = {}
    for et, ys in series.items():
        n = len(ys)
        sx = n * (n + 1) // 2
        sxx = sum((i + 1) * (i + 1) for i in range(n))
        sy = sum(ys)
        sxy = sum((i + 1) * y for i, y in enumerate(ys))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        s = None
        for i, y in enumerate(ys):
            z = 2 * y * n * den - (sy * den - num * sx) - n * num * (i + 1)
            if s is None:
                s = z
            else:
                v = z + s + 1
                s = (abs(v) - abs(v) % 2) // 2 * (1 if v >= 0 else -1)
        lin0 = sy * den - num * sx

        def fc(h):
            return round((lin0 + n * num * (n + h) + s) / (2.0 * n * den) / 100.0, 6)

        expect[et] = (
            n,
            round(num / den / 100.0, 6),
            round(lin0 / (float(n) * den) / 100.0, 6),
            round(s / (float(n) * den) / 100.0, 6),
            fc(1),
            fc(2),
            fc(3),
        )
    got = QUERIES["timeseries_theta_forecast"](spark, SF_ORACLE).collect()
    assert len(got) == len(expect)
    for r in got:
        e = expect[r.event_type]
        assert (
            r.n_days,
            r.slope_daily,
            r.intercept,
            r.ses_theta2_last,
            r.forecast_1,
            r.forecast_2,
            r.forecast_3,
        ) == e, r.event_type


def test_token_budget_packing_invariants(spark):
    """No sequence may exceed the budget; no document straddles; slots
    within a (shard, bucket, seq) are dense from 0; oversize docs are
    reported, never placed; pad is bucket - tokens."""
    rows = QUERIES["pipeline_token_budget_packing"](spark, SF_ORACLE).collect()
    from collections import defaultdict

    seqs = defaultdict(list)
    n_over = 0
    for r in rows:
        if r.bucket == -1:
            n_over += 1
            assert r.seq_id is None and r.slot is None and r.offset is None
            assert r.n_tokens > 64
            continue
        assert r.n_tokens <= r.bucket <= 64
        assert r.pad_tokens == r.bucket - r.n_tokens
        assert r.offset == r.slot * r.bucket
        assert r.offset + r.bucket <= 64, "placement exceeds the budget"
        seqs[(r.shard_id, r.bucket, r.seq_id)].append(r.slot)
    assert n_over > 0, "fixture must exercise the oversize branch"
    for key, slots in seqs.items():
        cap = 64 // key[1]
        assert sorted(slots) == list(range(len(slots))), key
        assert len(slots) <= cap, key


def test_stickiness_bounds_and_identity(spark):
    """stickiness = avg_dau / active_users in (0, 1]; user_days is an
    exact upper bound composition: active_users <= user_days <=
    active_users * n_days; the week rows partition the month row's
    user_days exactly (each user-day belongs to one week)."""
    rows = QUERIES["cohort_stickiness_dau_mau"](spark, SF_ORACLE).collect()
    months = [r for r in rows if r.grain == "month"]
    weeks = [r for r in rows if r.grain == "week"]
    assert months and weeks
    for r in rows:
        assert 0 < r.stickiness <= 1.0, r
        assert r.active_users <= r.user_days <= r.active_users * r.n_days, r
        assert abs(r.avg_dau - r.user_days / r.n_days) < 1e-6, r
    assert sum(w.user_days for w in weeks) == sum(m.user_days for m in months)


def test_rpe_signs_are_module_stable():
    """The Rademacher sign matrix derives only from md5 of fixed
    strings — pin a few entries so a refactor can't silently reseed
    the projection (which would change every registered hash)."""
    from vector_db_core_spark.operators.llm import _rpe_signs

    signs = _rpe_signs()
    assert len(signs) == 8 and all(len(r) == 64 for r in signs)
    assert all(s in (-1, 1) for row in signs for s in row)
    # first-row prefix pinned against independent hashlib
    for d in range(4):
        want = (
            1
            if hashlib.md5(f"rpe|0|{d}".encode()).hexdigest()[0] <= "7"
            else -1
        )
        assert signs[0][d] == want
    # a Rademacher matrix that lost its balance would bias every ratio
    total = sum(s for row in signs for s in row)
    assert abs(total) < 128, "sign matrix implausibly unbalanced"


def test_log_odds_zscore_direction(spark):
    """Tokens the group over-uses must carry positive z; the z ordering
    must be consistent with an independent numpy recomputation of the
    Monroe statistic on raw counts."""
    import numpy as np

    con = duckdb.connect()
    cnt = con.sql(
        rf"""
        WITH tok AS (SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS g,
                            unnest(list_filter(string_split_regex(text, '\s+'),
                                               x -> x <> '')) AS token
                     FROM '{SF_ORACLE}/documents.parquet')
        SELECT token, SUM(g) AS y1, SUM(1 - g) AS y2 FROM tok GROUP BY token
        """
    ).fetchall()
    y1 = {t: int(a) for t, a, b in cnt}
    y2 = {t: int(b) for t, a, b in cnt}
    n1, n2 = sum(y1.values()), sum(y2.values())
    nb = n1 + n2
    a0 = 1000.0
    got = QUERIES["agg_log_odds_monroe"](spark, SF_ORACLE).collect()
    assert len(got) == 20
    prev = None
    for r in got:
        aw = a0 * (y1[r.token] + y2[r.token]) / float(nb)
        delta = math.log((y1[r.token] + aw) / (n1 + a0 - y1[r.token] - aw)) - math.log(
            (y2[r.token] + aw) / (n2 + a0 - y2[r.token] - aw)
        )
        se = math.sqrt(1.0 / (y1[r.token] + aw) + 1.0 / (y2[r.token] + aw))
        assert abs(r.z_score - round(delta / se, 6)) < 1e-9, r.token
        # clearly-positive z must mean over-use of the group (near zero
        # the Dirichlet shrinkage can flip the raw-rate direction)
        if r.z_score > 0.01:
            assert y1[r.token] / n1 > y2[r.token] / n2, r.token
        if prev is not None:
            assert r.z_score <= prev
        prev = r.z_score
    del np


def test_session_gap_bands_conserve_sessions(spark):
    """Band counts must sum to (sessions - users-with-sessions): each
    user with k sessions contributes exactly k-1 inter-session gaps."""
    con = duckdb.connect()
    (n_sessions, n_users) = con.sql(
        f"""
        WITH t AS (SELECT user_id, ts,
                     CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL '30 minutes'
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS brk
                   FROM '{SF_ORACLE}/events.parquet')
        SELECT CAST(SUM(brk) AS BIGINT), COUNT(DISTINCT user_id)
        FROM t
        """
    ).fetchall()[0]
    rows = QUERIES["window_session_gaps"](spark, SF_ORACLE).collect()
    assert sum(r.n_gaps for r in rows) == n_sessions - n_users
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


def test_contamination_against_independent_recompute(spark):
    """Re-derive the contamination table in DuckDB-free Python sets
    from raw parquet and require exact per-doc agreement, plus the
    split-rule sanity: every reported doc is in the md5-'f' held-out
    split and both branches of the flag are exercised."""
    import hashlib as _h

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_ORACLE}/documents.parquet'"
    ).fetchall()
    spans = {}
    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        if len(toks) < 8:
            continue
        spans[doc_id] = {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        }
    is_test = {
        d: _h.md5(str(d).encode()).hexdigest()[0] == "f" for d in spans
    }
    train = set()
    for d, s in spans.items():
        if not is_test[d]:
            train |= s
    got = QUERIES["pipeline_contamination_ngram_overlap"](
        spark, SF_ORACLE
    ).collect()
    assert {r.doc_id for r in got} == {d for d in spans if is_test[d]}
    flags = set()
    for r in got:
        s = spans[r.doc_id]
        hits = sum(1 for sp in s if sp in train)
        assert (r.n_spans, r.n_contaminated) == (len(s), hits), r.doc_id
        assert r.flagged == (hits * 5 >= len(s)), r.doc_id
        flags.add(bool(r.flagged))
    assert flags == {True, False}, "fixture must exercise both flag branches"


def test_matryoshka_recall_structure(spark):
    """The full-width row must read recall 1.0; recall is weakly
    monotone in prefix width on this fixture's smooth embeddings; and
    every recall is n_overlap/10 exactly."""
    rows = {
        r.prefix_dim: r
        for r in QUERIES["sim_matryoshka_prefix_recall"](
            spark, SF_ORACLE
        ).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].n_overlap == 10 and rows[64].recall_at_k == 1.0
    for d, r in rows.items():
        assert 0 <= r.n_overlap <= 10
        assert abs(r.recall_at_k - r.n_overlap / 10.0) < 1e-9
    assert rows[32].n_overlap >= rows[8].n_overlap


def test_cohens_kappa_identity(spark):
    """kappa recomputed from the emitted 2x2 must match the emitted
    kappa; cells must conserve the corpus; agreement must exceed
    chance or the sign must say otherwise consistently."""
    con = duckdb.connect()
    (n_docs,) = con.sql(
        f"SELECT COUNT(*) FROM '{SF_ORACLE}/documents.parquet'"
    ).fetchall()[0]
    (r,) = QUERIES["agg_cohens_kappa"](spark, SF_ORACLE).collect()
    a, b, c, d, n = r.both_pass, r.a_only, r.b_only, r.neither, r.n
    assert a + b + c + d == n == n_docs
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    assert abs(r.po - round(po, 6)) < 1e-9
    assert abs(r.pe - round(pe, 6)) < 1e-9
    assert abs(r.cohens_kappa - round((po - pe) / (1 - pe), 6)) < 1e-9
    assert -1.0 <= r.cohens_kappa <= 1.0


def test_streaming_contamination_matches_batch(spark):
    """The streaming guard must be row-identical to the batch
    contamination op — the third maintained-state twin beside the
    BM25 and IVF replays, so replay-equality is the contract."""
    batch = sorted(
        tuple(r)
        for r in QUERIES["pipeline_contamination_ngram_overlap"](
            spark, SF_ORACLE
        ).collect()
    )
    streamed = sorted(
        tuple(r)
        for r in QUERIES["streaming_contamination_guard_replay"](
            spark, SF_ORACLE
        ).collect()
    )
    assert streamed == batch and len(batch) > 0
