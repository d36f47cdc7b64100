"""Round-11 (part 7): brute-force checks for the log-rank test,
Chatterjee's xi, Cucconi, seasonal Mann-Kendall, and Good-Turing.

Pure-Python recomputation from the raw sf0.001 parquet: the log-rank
replays every risk set from user-grain event times; xi is recomputed
from literal sorted lists; Cucconi from midranks; seasonal MK by the
O(m^2) per-season pair loop; Good-Turing from a Counter-of-Counters.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def fetch(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_logrank_brute(spark):
    rows = fetch(
        f"SELECT user_id, epoch_us(ts::TIMESTAMP), event_type"
        f" FROM '{SF}/events.parquet'"
    )
    users = {}
    for uid, us, et in rows:
        fu, pu, lu = users.get(uid, (None, None, None))
        fu = us if fu is None else min(fu, us)
        lu = us if lu is None else max(lu, us)
        if et == "purchase":
            pu = us if pu is None else min(pu, us)
        users[uid] = (fu, pu, lu)
    data = []
    for uid, (fu, pu, lu) in users.items():
        grp = (
            int(hashlib.md5(f"arm|{uid}".encode()).hexdigest()[:15], 16) % 2
        )
        if pu is not None and (pu - fu) // 3600000000 < 48:
            data.append((grp, (pu - fu) // 3600000000, 1))
        else:
            data.append((grp, min(48, (lu - fu) // 3600000000), 0))
    n1 = sum(1 for g, _, _ in data if g == 1)
    n2 = len(data) - n1
    o1 = e1 = v = 0.0
    for t in sorted({t for _, t, e in data if e == 1}):
        at_risk = [(g, tt, e) for g, tt, e in data if tt >= t]
        n_t = len(at_risk)
        n1_t = sum(1 for g, _, _ in at_risk if g == 1)
        d_t = sum(1 for _, tt, e in at_risk if tt == t and e == 1)
        d1_t = sum(
            1 for g, tt, e in at_risk if g == 1 and tt == t and e == 1
        )
        o1 += d1_t
        e1 += d_t * n1_t / n_t
        if n_t > 1:
            v += (
                d_t
                * (n1_t / n_t)
                * (1 - n1_t / n_t)
                * (n_t - d_t)
                / (n_t - 1)
            )
    got = QUERIES["logrank_test_ab_arms"](spark, SF).collect()[0]
    assert got["n_arm1"] == n1 and got["n_arm0"] == n2
    assert got["observed_events_arm1"] == o1
    assert abs(got["expected_events_arm1"] - e1) < 1e-5
    if v > 0:
        assert abs(got["logrank_chi2"] - (o1 - e1) ** 2 / v) < 1e-4


def test_chatterjee_xi_brute(spark):
    rows = fetch(
        f"""
        SELECT CAST(l_quantity AS BIGINT), l_extendedprice,
               l_orderkey, l_linenumber
        FROM '{SF}/lineitem.parquet'
        """
    )
    n = len(rows)
    ys = [y for _, y, _, _ in rows]
    le_rank = {}
    for y in set(ys):
        le_rank[y] = sum(1 for o in ys if o <= y)
    srt = sorted(rows, key=lambda z: (z[0], z[1], z[2], z[3]))
    r = [le_rank[y] for _, y, _, _ in srt]
    num = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    ge = {y: sum(1 for o in ys if o >= y) for y in set(ys)}
    den = sum(ge[y] * (n - ge[y]) for y in ys)
    xi = 1 - n * num / (2 * den)
    got = QUERIES["chatterjee_xi_qty_price"](spark, SF).collect()[0]
    assert got["n_rows"] == n
    assert abs(got["chatterjee_xi"] - xi) < 1e-5


def test_cucconi_brute(spark):
    rows = fetch(
        f"SELECT dayofweek(ts), value FROM '{SF}/events.parquet'"
    )
    x = [v for d, v in rows if d in (0, 6)]
    y = [v for d, v in rows if d not in (0, 6)]
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    allv = x + y
    cnt = Counter(allv)
    pos = 0
    mid = {}
    for v in sorted(cnt):
        c = cnt[v]
        mid[v] = pos + (c + 1) / 2.0
        pos += c
    sr2 = sum(mid[v] ** 2 for v in x)
    sv2 = sum((nn + 1 - mid[v]) ** 2 for v in x)
    se = math.sqrt(
        n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0
    )
    mean = n1 * (nn + 1) * (2 * nn + 1)
    u = (6 * sr2 - mean) / se
    v = (6 * sv2 - mean) / se
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c_stat = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    got = QUERIES["cucconi_test_weekend_value"](spark, SF).collect()[0]
    assert got["n_weekend"] == n1 and got["n_weekday"] == n2
    assert abs(got["u_stat"] - u) < 1e-5
    assert abs(got["v_stat"] - v) < 1e-5
    assert abs(got["cucconi_c"] - c_stat) < 1e-5


def test_seasonal_mk_brute(spark):
    rows = fetch(
        f"""
        SELECT l_shipdate, dayofweek(l_shipdate),
               SUM(CAST(l_extendedprice AS DECIMAL(28,10)))
        FROM '{SF}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1
        """
    )
    seasons = {}
    for day, wd, rev in rows:
        seasons.setdefault(wd, []).append(int(round(rev * 100)))
    s_total = 0
    var18 = 0
    for vals in seasons.values():
        m = len(vals)
        for i in range(m):
            for j in range(i + 1, m):
                s_total += (vals[j] > vals[i]) - (vals[j] < vals[i])
        tc = Counter(vals)
        var18 += m * (m - 1) * (2 * m + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in tc.values()
        )
    var = var18 / 18.0
    if s_total > 0:
        z = (s_total - 1) / math.sqrt(var)
    elif s_total < 0:
        z = (s_total + 1) / math.sqrt(var)
    else:
        z = 0.0
    got = QUERIES["seasonal_mann_kendall_daily"](spark, SF).collect()[0]
    assert got["n_seasons"] == len(seasons)
    assert got["s_total"] == s_total
    assert abs(got["var_total"] - var) < 1e-4
    assert abs(got["z_mk"] - z) < 1e-5


def test_good_turing_brute(spark):
    rows = fetch(f"SELECT text FROM '{SF}/documents.parquet'")
    wc = Counter()
    n_tokens = 0
    for (text,) in rows:
        for w in text.split(" "):
            wc[w] += 1
            n_tokens += 1
    fof = Counter(wc.values())
    got = {
        r["r"]: r for r in QUERIES["good_turing_vocab"](spark, SF).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    for r in range(1, 6):
        row = got[r]
        assert row["n_r"] == fof.get(r, 0)
        assert row["n_r1"] == fof.get(r + 1, 0)
        if fof.get(r, 0) > 0:
            assert (
                abs(
                    row["gt_smoothed_count"]
                    - (r + 1) * fof.get(r + 1, 0) / fof[r]
                )
                < 1e-6
            )
        assert abs(row["missing_mass"] - fof.get(1, 0) / n_tokens) < 1e-6
