"""BPE trainer/apply tests: distributed result == pure-Python reference."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import bpe
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _reference_train(vocab: dict[str, int], num_merges: int):
    merges, rows = [], []
    for step in range(num_merges):
        cnt = collections.Counter()
        for w, c in vocab.items():
            syms = bpe.apply_merges_py(w, merges)
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += c
        if not cnt:
            break
        top = max(cnt.values())
        a, b = sorted(p for p, n in cnt.items() if n == top)[0]
        merges.append((a, b))
        rows.append((step, a, b, a + b, top))
    return rows


def test_train_merges_matches_reference(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = [
        (r.step, r.left, r.right, r.merged, r.n)
        for r in bpe.train_merges(docs, num_merges=6).collect()
    ]
    vocab = {
        r.w: r.c
        for r in bpe.word_counts(docs).collect()
    }
    assert got == _reference_train(vocab, 6)


def test_segment_expr_matches_python_apply(spark):
    merges = [("e", "r"), ("i", "n"), ("m", "er"), ("a", "a")]
    words = ["merger", "inner", "aaa", "a", "x", "miner", "terminator"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r.w: r.toks
        for r in df.select(
            "w", bpe.segment_expr(F.col("w"), merges).alias("toks")
        ).collect()
    }
    for w in words:
        assert got[w] == bpe.apply_merges_py(w, merges), w


def test_train_is_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = bpe.train_merges(docs, num_merges=3).collect()
    b = bpe.train_merges(docs.repartition(7), num_merges=3).collect()
    assert a == b
