"""Byte-pair-encoding training and application (Sennrich et al. 2016,
arXiv:1508.07909) — the subword-tokenizer construction a training-data
pipeline runs over its corpus.

Division of labor (the same one SentencePiece/HF trainers use):

- **corpus pass (distributed, once)**: whitespace words -> distinct-word
  frequency table. This is the only stage that touches corpus-scale data;
  everything after is proportional to VOCABULARY size.
- **merge loop (distributed counting, driver-held state)**: per iteration,
  re-segment the vocab with the merges learned so far (one Arrow-batched
  pandas UDF over the cached vocab), count adjacent symbol pairs weighted
  by word frequency (hash-agg, map-side combined), and collect exactly ONE
  row (the argmax pair — count desc, pair asc tie-break). The merge table
  lives on the driver like k-means centroids (operators/clustering.py) and
  is re-broadcast through the UDF closure, so lineage never grows with
  iterations: every iteration is the same two-stage job over the cached
  vocab.
- **apply (map-only)**: segmenting the corpus with a FINISHED merge table
  is a stateless per-row transform.

BPE merge semantics: each merge (a, b) -> ab is applied to every word as a
single left-to-right pass over non-overlapping adjacent occurrences —
identical to replacing "a b" with "ab" in the space-joined symbol string,
which is what the engine-portable apply path does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import tokens_col


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python BPE segmentation: apply ``merges`` in order, each as one
    left-to-right pass over non-overlapping adjacent pairs. Shared by the
    executor UDF and the test-suite reference implementation."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (w, c) distinct-word frequency table (the one corpus-scale
    shuffle; everything downstream is vocabulary-sized)."""
    spark = docs.sparkSession
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_merges(
    docs: DataFrame, text_col: str = "text", num_merges: int = 8
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    (step, left, right, merged, n) — n is the frequency-weighted count of
    the pair at the iteration it was chosen. Deterministic: argmax with
    (count desc, left asc, right asc) tie-break, no RNG."""
    spark = docs.sparkSession
    wc = word_counts(docs, text_col).cache()
    merges: list[tuple[str, str]] = []
    rows: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(num_merges):
            frozen = list(merges)

            # no type hints: explicit returnType + `from __future__ import
            # annotations` breaks pandas_udf hint inference (CLAUDE.md)
            @F.pandas_udf(ArrayType(StringType()))
            def segs(ws):
                return ws.map(lambda w: apply_merges_py(w, frozen))

            s = F.col("syms")
            npairs = F.greatest(F.size(s) - 1, F.lit(0))
            zipped = F.arrays_zip(
                F.slice(s, 1, npairs).alias("a"), F.slice(s, 2, npairs).alias("b")
            )
            best = (
                wc.select("c", segs(F.col("w")).alias("syms"))
                .select(
                    "c",
                    F.explode(zipped).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("c").cast("long").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
            merges.append((a, b))
            rows.append((step, a, b, a + b, n))
    finally:
        wc.unpersist()
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, n long"
    )


def segment_expr(word, merges: list[tuple[str, str]]):
    """Engine-portable BPE application as a JVM-side expression chain:
    space-join the characters, then one literal REPLACE per merge (replace
    scans left-to-right over non-overlapping matches — exactly the BPE
    merge pass). Returns an array<string> of subword tokens."""
    col = word if not isinstance(word, str) else F.col(word)
    s = F.trim(F.regexp_replace(col, "(.)", "$1 "))
    for a, b in merges:
        s = F.replace(s, F.lit(f"{a} {b}"), F.lit(a + b))
    return F.split(s, " ")
