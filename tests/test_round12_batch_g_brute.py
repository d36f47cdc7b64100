"""Round-12 batch G: pure-Python brute-force models of
Benjamini-Yekutieli, Breslow-Day, Katz centrality, and RAKE.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from veri_spark.plans.events_behavior import _acklam_probit
from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_by_thresholds_stricter_than_bh(spark):
    """BY must rank identically to BH but threshold strictly higher
    (c(m) > 1), and its rejection set must be a subset of BH's."""
    bh = {r["bh_rank"]: r for r in QUERIES["bh_weekday_conversion_fdr"](spark, SF).collect()}
    by = {r["by_rank"]: r for r in QUERIES["by_weekday_conversion_fdr"](spark, SF).collect()}
    assert set(bh) == set(by)
    m = len(by)
    cm = sum(1.0 / j for j in range(1, m + 1))
    for i in sorted(by):
        assert by[i]["dow"] == bh[i]["dow"]
        assert by[i]["z_score"] == bh[i]["z_score"]
        # c(m) > 1 only for m > 1: with a single surviving cell BY == BH
        if m > 1:
            assert by[i]["z_threshold_micro"] > bh[i]["z_threshold_micro"]
        else:
            assert by[i]["z_threshold_micro"] == bh[i]["z_threshold_micro"]
        expect = round(_acklam_probit(1 - 0.05 * i / (2 * m * cm)) * 1e6)
        assert by[i]["z_threshold_micro"] == expect
        if by[i]["rejected"]:
            assert bh[i]["rejected"]


def test_breslow_day_brute(spark):
    rows = fetch(
        f"SELECT month(ts), CASE WHEN dayofweek(ts) IN (0,6) THEN 1 ELSE 0 END,"
        f" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        f" FROM '{SF}/events.parquet'"
    )
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a b c d
    for mth, wk, conv in rows:
        idx = 0 if (wk, conv) == (1, 1) else 1 if (wk, conv) == (1, 0) else 2 if conv else 3
        cells[mth][idx] += 1
    num = den = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += math.floor(1e6 * (a * d) / n + 0.5)
        den += math.floor(1e6 * (b * c) / n + 0.5)
    psi = num / den
    x2 = 0.0
    for a, b, c, d in cells.values():
        n1, m1, nn = a + b, a + c, a + b + c + d
        aa, bb, cc = psi - 1.0, psi * (n1 + m1) + (nn - n1 - m1), psi * n1 * m1
        if abs(aa) < 1e-12:
            e = n1 * m1 / nn
        else:
            e = (bb - math.sqrt(bb * bb - 4 * aa * cc)) / (2 * aa)
        v = 1.0 / e + 1.0 / (n1 - e) + 1.0 / (m1 - e) + 1.0 / (nn - n1 - m1 + e)
        x2 += (a - e) ** 2 * v

    got = QUERIES["breslow_day_weekend_or"](spark, SF).collect()[0]
    assert got["n_strata"] == len(cells)
    assert abs(got["or_mh"] - psi) < 1e-6
    assert abs(got["x2_breslow_day"] - x2) < 1e-4


def _adj():
    rows = fetch(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{SF}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    )
    adj = defaultdict(set)
    for u, v in rows:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def test_katz_brute(spark):
    adj = _adj()
    x = {u: 1_000_000 for u in adj}
    for _ in range(3):
        x = {
            u: 1_000_000 + (2 * sum(x[v] for v in adj[u]) + 16) // 32
            for u in adj
        }
    top = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["graph_katz_centrality"](spark, SF).collect()
    assert [(r["node"], r["katz_micro"]) for r in got] == top


def test_rake_brute(spark):
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    rows = fetch(f"SELECT doc_id, text FROM '{SF}/documents.parquet'")
    phrases = []  # occurrences
    for _, text in rows:
        cur = []
        for t in text.split(" "):
            if t in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: math.floor(1e6 * deg[w] / freq[w] + 0.5) for w in freq}
    uniq = Counter(" ".join(p) for p in phrases)
    scored = {
        ph: sum(score[w] for w in ph.split(" ")) for ph in uniq
    }
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = QUERIES["rake_keyword_phrases"](spark, SF).collect()
    assert [(r["phrase"], r["score_micro"]) for r in got] == top
    for r in got:
        assert r["n_occurrences"] == uniq[r["phrase"]]
        assert r["n_words"] == len(r["phrase"].split(" "))


def test_weibull_shape_brute(spark):
    rows = fetch(
        f"""
        SELECT ((pu - fu) // 3600000000 + 1)::BIGINT
        FROM (SELECT MIN(epoch_us(ts::TIMESTAMP)) AS fu,
                     MIN(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts::TIMESTAMP) END) AS pu
              FROM '{SF}/events.parquet' GROUP BY user_id)
        WHERE pu IS NOT NULL
        """
    )
    ts = sorted(int(r[0]) for r in rows)
    n = len(ts)
    xs, ys = [], []
    for i, t in enumerate(ts, start=1):
        f = (i - 0.3) / (n + 0.4)
        xs.append(math.floor(1e6 * math.log(t) + 0.5))
        ys.append(math.floor(1e6 * math.log(-math.log(1 - f)) + 0.5))
    m = n
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = m * sxy - sx * sy
    shape = num / (m * sxx - sx * sx)
    r2 = num * num / ((m * sxx - sx * sx) * (m * syy - sy * sy))

    got = QUERIES["weibull_shape_time_to_purchase"](spark, SF).collect()[0]
    assert got["n_uncensored"] == n
    assert abs(got["weibull_shape"] - shape) < 1e-6
    assert abs(got["fit_r2"] - r2) < 1e-6
