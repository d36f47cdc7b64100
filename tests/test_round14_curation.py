"""Round-14: the composed curation pipeline (r13 verdict task 4).

The registered `curation_pipeline_ledger` query is oracle-paired (the
DuckDB side recomputes the whole nine-stage composition); these tests
add the RECONCILIATION the verdict asks for — each stage's yield must
equal what the standalone queries / an independent pure-Python
recomputation produce on that stage's input:

- dedup tiers 1-3 == `dedup_tiered_pipeline`'s rows (same rules, same
  whole-corpus input when the clean stage drops nothing),
- the decontamination drop set == `decontamination_overlap`'s flags
  (restricted to the stage input — the flag is doc-local),
- Gopher, mixture sampling, SemDeDup and packing against brute-force
  Python recomputations on the collected stage frames.
"""

from __future__ import annotations

import hashlib
import math

from veri_spark.functions.text import EN_STOPWORDS
from veri_spark.plans.curation import curation_stage_frames
from veri_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ids(df):
    return {int(r["doc_id"]) for r in df.select("doc_id").collect()}


def test_ledger_chain_and_tier_reconciliation(spark):
    ledger = {
        int(r["stage_id"]): r
        for r in QUERIES["curation_pipeline_ledger"](spark, SF).collect()
    }
    assert [ledger[k]["stage"] for k in range(9)] == [
        "clean", "exact_dedup", "simhash_dedup", "minhash_dedup",
        "semantic_dedup", "decontaminate", "gopher_quality",
        "mixture_sample", "pack",
    ]
    # the chain: stage K's docs_in is stage K-1's docs_out, yields shrink
    for k in range(1, 9):
        assert ledger[k]["docs_in"] == ledger[k - 1]["docs_out"]
        assert ledger[k]["docs_out"] <= ledger[k]["docs_in"]
    assert ledger[8]["docs_out"] == ledger[8]["docs_in"]  # packing drops 0
    assert ledger[8]["chunks_out"] > 0
    for k in range(8):
        assert ledger[k]["chunks_out"] == 0

    # dedup tiers 1-3 reconcile with the standalone tiered pipeline
    # (clean is an identity on this corpus, so the inputs coincide)
    assert ledger[0]["docs_in"] == ledger[0]["docs_out"]
    tiers = {
        int(r["tier"]): r
        for r in QUERIES["dedup_tiered_pipeline"](spark, SF).collect()
    }
    for tier, stage in ((1, 1), (2, 2), (3, 3)):
        assert ledger[stage]["docs_in"] == tiers[tier]["n_in"]
        assert ledger[stage]["docs_out"] == tiers[tier]["n_out"]


def test_tiers_consume_prior_frames_not_the_parquet(spark):
    """The composition discipline the module docstring claims: every
    survivor frame is lineage-truncated, so downstream tiers plan
    against the prior tier's checkpointed rows — the documents parquet
    appears in NO stage plan except the initial raw projection."""
    fr = curation_stage_frames(spark, SF)
    raw_plan = fr["raw"]._jdf.queryExecution().optimizedPlan().toString()
    assert "documents.parquet" in raw_plan
    for key in ["s1", "s4", "s7", "packed"]:
        plan = fr[key]._jdf.queryExecution().optimizedPlan().toString()
        assert "documents.parquet" not in plan, key


def test_stage_drop_sets_reconcile_brute_force(spark):
    fr = curation_stage_frames(spark, SF)
    s3, s4, s5, s6, s7 = (
        _ids(fr["s3"]), _ids(fr["s4"]), _ids(fr["s5"]),
        _ids(fr["s6"]), _ids(fr["s7"]),
    )

    # --- stage 4: SemDeDup, pure-Python over the stage input ----------
    emb = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    q = {
        i: [math.floor(1e6 * v + 0.5) for v in vec] for i, vec in emb.items()
    }
    seeds = {i: q[i] for i in q if i < 16}
    emb_in = sorted(i for i in q if i in s3)
    cell = {}
    for i in emb_in:
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(q[i], sm)), cid)
            for cid, sm in seeds.items()
        )
        cell[i] = best[1]
    removed = set()
    for ii, ia in enumerate(emb_in):
        for ib in emb_in[ii + 1:]:
            if cell[ia] != cell[ib]:
                continue
            dot = sum(a * b for a, b in zip(q[ia], q[ib]))
            na = sum(a * a for a in q[ia])
            nb = sum(b * b for b in q[ib])
            if dot / (math.sqrt(na) * math.sqrt(nb)) >= 0.42:
                removed.add(ib)
    assert s4 == s3 - removed

    # --- stage 5: decontamination == the standalone query's flags ------
    flagged = {
        int(r["doc_id"])
        for r in QUERIES["decontamination_overlap"](spark, SF).collect()
    }
    assert s5 == {i for i in s4 if i >= 20} - flagged

    # --- stage 6: Gopher rules, pure Python ----------------------------
    # (round 15: stage frames are narrow — text re-attached from the raw
    # projection for the independent recomputation)
    texts = {
        int(r["doc_id"]): (r["text"], r["lang"], r["source"])
        for r in fr["s5"]
        .join(fr["raw"].select("doc_id", "text"), "doc_id")
        .collect()
    }
    stop = set(EN_STOPWORDS)

    def passes(text):
        ws = text.split(" ")
        wc = len(ws)
        chars = sum(len(w) for w in ws)
        sw = sum(1 for w in ws if w in stop)
        return 20 <= wc <= 90 and 42 * wc <= chars * 10 <= 48 * wc and sw >= 2

    assert s6 == {i for i, (t, _, _) in texts.items() if passes(t)}

    # --- stage 7: temperature-reweight sampler, pure Python ------------
    rows6 = [
        (int(r["doc_id"]), r["lang"], len(r["text"].split(" ")))
        for r in fr["s6"]
        .join(fr["raw"].select("doc_id", "text"), "doc_id")
        .collect()
    ]
    mass = {}
    for _, lang, nt in rows6:
        mass[lang] = mass.get(lang, 0) + nt
    tot = float(sum(mass.values()))
    w = {lang: (n / tot) ** 0.7 for lang, n in mass.items()}
    z = sum(w.values())
    permille = {
        lang: min(1000, math.floor(1000.0 * (w[lang] / z) / (mass[lang] / tot)))
        for lang in mass
    }
    expect7 = {
        i for i, lang, _ in rows6 if _h60(str(i)) % 1000 < permille[lang]
    }
    assert s7 == expect7
    # the reweight must actually bite: at least one lang downsampled
    assert any(p < 1000 for p in permille.values())
    assert any(p == 1000 for p in permille.values())

    # --- stage 8: packing, pure Python ---------------------------------
    rows7 = sorted(
        (r["source"], int(r["doc_id"]), len(r["text"].split(" ")))
        for r in fr["s7"]
        .join(fr["raw"].select("doc_id", "text"), "doc_id")
        .collect()
    )
    chunks = set()
    cum = {}
    for source, doc_id, nt in rows7:
        before = cum.get(source, 0)
        chunks.add((source, before // 1024))
        cum[source] = before + nt + 1
    got = {
        (r["source"], int(r["chunk_id"]))
        for r in fr["packed"].select("source", "chunk_id").collect()
    }
    assert got == chunks
