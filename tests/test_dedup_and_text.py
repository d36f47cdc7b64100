"""Dedup + text operators: planted duplicates, signature portability,
recall fixture (FIXTURES.md section 5 analog).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from veri_spark.functions.hashing import portable_hash64, portable_hash64_py
from veri_spark.functions.text import quality_score, tokens, word_shingles
from veri_spark.operators.dedup import (
    doc_shingles,
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_candidate_pairs,
    simhash32,
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "completely different words about spark catalyst tungsten shuffle plans"),
        (4, "the quick brown fox jumps over the lazy dog again and again today"),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_portable_hash_matches_python(spark):
    df = spark.createDataFrame([("hello world",), ("",), ("x|y",)], "s string")
    got = [r["h"] for r in df.select(portable_hash64("s").alias("h")).collect()]
    want = [portable_hash64_py(s) for s in ("hello world", "", "x|y")]
    assert got == want
    # seeded variant
    got_seeded = df.select(portable_hash64("s", seed=7).alias("h")).collect()[0]["h"]
    assert got_seeded == portable_hash64_py("hello world", seed=7)


def test_word_shingles_edges(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    out = df.select(word_shingles(tokens("t")).alias("sh")).collect()
    assert out[0]["sh"] == ["a b c", "b c d"]
    assert out[1]["sh"] == []  # fewer than k tokens
    assert out[2]["sh"] == []


def test_exact_dedup_keeps_lowest_id(spark, planted_docs):
    from veri_spark.functions.text import fingerprint

    kept = exact_dedup(planted_docs, fingerprint("text"), "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 3, 5}  # 4 is the dup of 1


def test_jaccard_identical_pair_is_one(spark, planted_docs):
    pairs = jaccard_pairs(doc_shingles(planted_docs))
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert j[(1, 4)] == pytest.approx(1.0)
    assert j[(1, 2)] > 0.7  # near-dup
    assert (1, 3) not in j  # no shared shingles


def test_minhash_finds_planted_dups_only(spark, planted_docs):
    pairs = sorted(
        (r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(planted_docs).collect()
    )
    assert (1, 4) in pairs  # exact dup always collides
    assert all(3 not in p and 5 not in p for p in pairs)


def test_simhash_hamming_ordering(spark, planted_docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash32(planted_docs).collect()}
    ham = lambda a, b: bin(sig[a] ^ sig[b]).count("1")
    assert ham(1, 4) == 0
    assert ham(1, 2) < ham(1, 3)
    assert all(0 <= s < 2**32 for s in sig.values())


def test_embedding_near_dup_recall_pairs(spark):
    """FIXTURES.md section 5 analog: planted near-identical pairs are each
    other's top match; unrelated vectors don't exceed the threshold."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(20):
        base = [rng.uniform(0, 1) for _ in range(8)]
        rows.append((2 * i, 0, [x + rng.uniform(0, 1e-3) for x in base]))
        rows.append((2 * i + 1, 0, [x + rng.uniform(0, 1e-3) for x in base]))
    df = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    pairs = embedding_near_dup_pairs(df, min_cosine=0.999999).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(20):
        assert (2 * i, 2 * i + 1) in found


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("one two three",), (" ".join(["w"] * 200),)], "text string"
    )
    vals = [r["q"] for r in df.select(quality_score("text").alias("q")).collect()]
    assert 0 < vals[0] <= 1
    assert vals[1] == pytest.approx(1.0 * (1 / 200))  # saturated length, low diversity


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation converges past multi-hop chains (the hard case
    for fixed-iteration propagation) and merges cliques."""
    from veri_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["id"]: r["cluster"] for r in connected_components(edges).collect()}
    assert all(got[i] == 1 for i in (1, 2, 3, 4, 5))
    assert all(got[i] == 10 for i in (10, 11, 12))
    assert got[20] == 20 and got[21] == 20
