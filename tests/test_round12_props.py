"""Round-12 property tests: incremental dedup invariants on SYNTHETIC
corpora (Hypothesis-generated word soups with planted near-duplicates),
so the equalities proven on the fixture corpus also hold across random
shapes — empty deltas, all-duplicate shards, single-token docs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from veri_spark.operators.dedup import (
    dedup_signature_index,
    incremental_minhash_candidates,
    minhash_candidate_pairs,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=8),
    min_size=4,
    max_size=10,
)


@settings(max_examples=5, deadline=None)
@given(docs=docs_strategy, split=st.integers(min_value=1, max_value=3))
def test_incremental_equals_batch_on_random_corpora(spark, docs, split):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    delta = df.filter(f"doc_id % 4 < {split}")
    corpus = df.filter(f"doc_id % 4 >= {split}")
    delta_ids = {r[0] for r in delta.select("doc_id").collect()}

    idx_bands, _ = dedup_signature_index(corpus)
    d_bands, _ = dedup_signature_index(delta)
    inc = sorted(
        map(tuple, incremental_minhash_candidates(d_bands, idx_bands).collect())
    )

    batch = minhash_candidate_pairs(df, num_hashes=16, bands=4)
    restricted = sorted(
        (a, b) if a in delta_ids else (b, a)
        for a, b in map(tuple, batch.collect())
        if (a in delta_ids) != (b in delta_ids)
    )
    assert inc == restricted


@settings(max_examples=5, deadline=None)
@given(docs=docs_strategy)
def test_signature_index_fp_is_content_keyed(spark, docs):
    """Identical texts must produce identical (fp, band_key) rows and
    duplicated ids with changed text must change fp — the property the
    carry-forward refresh rests on."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    bands, sim = dedup_signature_index(df)
    got = {
        (r["doc_id"], r["band"]): (r["fp"], r["band_key"])
        for r in bands.collect()
    }
    by_text = {}
    for i, ws in enumerate(docs):
        t = " ".join(ws)
        for b in range(4):
            key = got[(i, b)]
            if (t, b) in by_text:
                assert by_text[(t, b)] == key  # same text => same signature
            by_text[(t, b)] = key
    # fp in the simhash frame matches the bands frame per doc
    fp_sim = {r["doc_id"]: r["fp"] for r in sim.collect()}
    for (i, _b), (fp, _bk) in got.items():
        assert fp_sim[i] == fp
