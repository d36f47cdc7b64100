"""Round-9 unit batch: the MI quantization guard-band audit (round-8
verdict task 7) and small determinism guards for the round's new queries.
"""

from __future__ import annotations

import math

import duckdb
import pytest


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_mi_quantization_guard_band(sf_dir):
    """mutual_information_lang_source quantizes each cell's ln(ratio) with
    floor(1e6*ln + 0.5); ln is the one in-engine transcendental (the
    WoE/Zipf idiom), so a cross-engine flip requires 1e6*ln(ratio) to land
    within ~an ulp of a k+0.5 boundary. This audit MEASURES the guard
    band on the committed testdata: the distance from every cell's
    1e6*ln(ratio) to its nearest half-integer boundary must exceed 1e-4 —
    ten-plus orders of magnitude above the ~1e-10 absolute error a 1-ulp
    libm-vs-Math divergence can produce at this magnitude. While the
    boundary is data-dependent (Python precomputation can't remove it —
    round-7 advisor), this pins the committed gate inputs safely away
    from it, so any future flip implies NEW data, not engine noise."""
    con = duckdb.connect()
    cells = con.execute(
        f"""
        WITH d AS (SELECT lang, source FROM '{sf_dir}/documents.parquet'),
        cell AS (SELECT lang, source, COUNT(*)::BIGINT AS nxy
                 FROM d GROUP BY lang, source),
        mx AS (SELECT lang, SUM(nxy)::BIGINT AS nx FROM cell GROUP BY lang),
        my AS (SELECT source, SUM(nxy)::BIGINT AS ny FROM cell GROUP BY source),
        t AS (SELECT SUM(nxy)::BIGINT AS n FROM cell)
        SELECT c.nxy, mx.nx, my.ny, t.n
        FROM cell c JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN t
        """
    ).fetchall()
    assert cells, "contingency table must be non-empty"
    min_gap = min(
        abs((v := 1e6 * math.log((nxy * n) / (nx * ny))) - math.floor(v) - 0.5)
        for nxy, nx, ny, n in cells
    )
    assert min_gap > 1e-4, (
        f"a cell's 1e6*ln(ratio) sits {min_gap} from a rounding boundary — "
        "within reach of cross-engine ln noise"
    )
