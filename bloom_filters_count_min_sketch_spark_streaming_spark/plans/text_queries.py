"""Text-analysis queries (SURVEY §2.D D4) over the documents table."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T
from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    sample_frames,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

_STOPS_SQL = "('" + "','".join(T.EN_STOPWORDS) + "')"


@query(
    "text_token_counts",
    oracle=f"""
    SELECT lang,
           CAST(SUM(len(list_filter(string_split(lower(text), ' '), w -> w <> ''))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{T.TOKEN_PATTERN}'))) AS BIGINT) AS bpeish_tokens
    FROM documents GROUP BY lang
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace + BPE-ish regex, aggregated per lang."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(T.token_count_whitespace(F.col("text"))).cast("long").alias("ws_tokens"),
        F.sum(T.token_count_bpeish(F.col("text"))).cast("long").alias("bpeish_tokens"),
    )


@query(
    "text_quality_by_source",
    oracle=f"""
    WITH m AS (
      SELECT source,
             len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tok,
             len(list_filter(string_split(lower(text), ' '), w -> w IN {_STOPS_SQL}))
               * 1.0 / len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS stop_ratio,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / length(text) AS punct_ratio
      FROM documents
    )
    SELECT source,
           ROUND(SUM(stop_ratio) / COUNT(*), 4) AS avg_stop_ratio,
           ROUND(SUM(punct_ratio) / COUNT(*), 4) AS avg_punct_ratio,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM m GROUP BY source
    """,
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal ratios (stopword / punctuation density) per source."""
    docs = load(spark, sf_dir, "documents")
    cnt = F.count(F.lit(1))
    return docs.groupBy("source").agg(
        F.round(F.sum(T.stopword_ratio(F.col("text"))) / cnt, 4).alias("avg_stop_ratio"),
        F.round(F.sum(T.punct_ratio(F.col("text"))) / cnt, 4).alias("avg_punct_ratio"),
        F.sum(T.token_count_whitespace(F.col("text"))).cast("long").alias("total_tokens"),
    )


@query(
    "lang_id_heuristic",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS labeled_lang,
             CASE WHEN len(list_filter(string_split(lower(text), ' '), w -> w IN {_STOPS_SQL}))
                       * 1.0 / len(list_filter(string_split(lower(text), ' '), w -> w <> '')) >= 0.05
                  THEN 'en' ELSE 'other' END AS predicted
      FROM documents
    )
    SELECT labeled_lang, predicted, COUNT(*) AS n_docs
    FROM scored GROUP BY 1, 2
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word (stopword-density) language ID vs the labeled lang —
    the n-gram-heuristic language-ID shape, fully SQL-expressible."""
    docs = load(spark, sf_dir, "documents")
    predicted = F.when(T.stopword_ratio(F.col("text")) >= 0.05, "en").otherwise("other")
    return (
        docs.select(F.col("lang").alias("labeled_lang"), predicted.alias("predicted"))
        .groupBy("labeled_lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_quality_scores",
    oracle=f"""
    -- full mirror of functions/text.py:quality_score: every component is
    -- an int/int double division (identical in both engines), the blend
    -- is +/- and least/greatest of those, rounded once at the end
    WITH c AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tok,
             len(list_filter(string_split(lower(text), ' '), w -> w IN {_STOPS_SQL}))
               * 1.0 / len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS stop_ratio,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               * 1.0 / length(text) AS punct_ratio,
             list_sum(list_transform(list_filter(string_split(lower(text), ' '), w -> w <> ''),
                                     w -> length(w)))
               * 1.0 / len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS avg_len
      FROM documents
    )
    SELECT doc_id,
           ROUND(GREATEST(LEAST(
             0.5 + LEAST(stop_ratio, 0.3) - LEAST(punct_ratio * 2, 0.4)
                 + CASE WHEN avg_len >= 3 AND avg_len <= 10 THEN 0.1 ELSE -0.1 END,
             1.0), 0.0), 4) AS quality,
           n_tok AS n_tokens
    FROM c
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite per-doc quality score (Gopher/C4-style heuristic blend),
    mirrored component-by-component in the DuckDB oracle."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.quality_score(F.col("text")), 4).alias("quality"),
        T.token_count_whitespace(F.col("text")).alias("n_tokens"),
    )


@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents GROUP BY source
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: attach utf-8 payloads (stand-in
    for image bytes), aggregate payload sizes per source. The byte-level
    schema is what a real media table looks like; only the codec is faked."""
    docs = load(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id").join(
        docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id"
    )
    return media.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
    )


@query(
    "multimodal_decode_features",
    oracle="""
    -- closed-form mirror of the fake decode's first byte-histogram moment
    -- (fixture text is pure ASCII, verified octet_length == length at
    -- every SF, so character positions == byte positions)
    SELECT doc_id AS media_id,
           length(text) AS n_bytes,
           ROUND(list_sum([ord(text[i]) FOR i IN range(1, length(text) + 1)
                           IF (i - 1) % 8 = 0]) * 1.0 / length(text), 4) AS f0
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas media decode (deterministic fake codec): real Arrow batch
    plumbing, schema, and partitioning — first feature component mirrored
    by a closed-form byte-moment oracle."""
    docs = load(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = decode_features(media, strict=False)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("features", 1).cast("double"), 4).alias("f0"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    -- closed-form twin of the REAL AVI demux (chunk walk over RIFF LIST
    -- hdrl/movi, '00db' DIB frame lift): 2 + (id % 5) solid-color 6x4
    -- frames per video, every 2nd sampled; a solid frame's channel mean
    -- IS its generator color, so per-media channel sums are exact ints
    WITH ids AS (SELECT doc_id AS media_id FROM documents),
         fs AS (SELECT unnest(range(6)) AS fi),
         f AS (SELECT media_id, fi FROM ids CROSS JOIN fs
               WHERE fi < 2 + media_id % 5 AND fi % 2 = 0)
    SELECT media_id,
           COUNT(*) AS n_sampled,
           CAST(SUM((media_id + fi) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((media_id * 3 + fi * 5) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((media_id * 7 + fi * 11) % 256) AS BIGINT) AS sum_b
    FROM f GROUP BY media_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path (D5): frame sampling over uncompressed RIFF/AVI
    payloads — container demux is a real chunk walk (LIST hdrl -> avih
    geometry, LIST movi -> '00db' DIB frames), every 2nd frame re-encoded
    as a standalone BMP and run through the real BMP decoder. The 1->N
    mapInPandas row explosion plus per-media channel sums are value-hash
    checked against the generator's closed form; the demux sees only
    bytes. Compressed codecs (H.264-class) stay env-blocked."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_avi_payload,
        decode_bmp_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_avi_payload(docs, "doc_id")
    frames = sample_frames(media, every_n=2)
    feats = decode_bmp_features(
        frames.select("media_id", F.col("frame").alias("payload"))
    )
    # frames are solid -> channel means are integer-valued doubles; the
    # cast is exact and keeps the compare in BIGINT
    return feats.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("mean_r").cast("long")).alias("sum_r"),
        F.sum(F.col("mean_g").cast("long")).alias("sum_g"),
        F.sum(F.col("mean_b").cast("long")).alias("sum_b"),
    )


@query(
    "multimodal_resize_roundtrip",
    oracle="""
    -- closed-form twin of the REAL image resize (BMP decode ->
    -- nearest-neighbor resample -> BMP re-encode -> BMP decode): gradient
    -- sources with pixel (x, y) = ((id+x)%256, (id+y)%256, (id+x+y)%256),
    -- pixel-center NN sampling to the fixed 8x6 target picks source
    -- column sx = (2x+1)*w // 16 and row sy = (2y+1)*h // 12; channel
    -- sums over the 48 resampled pixels are exact integers
    WITH ids AS (SELECT doc_id AS media_id,
                        4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
                 FROM documents),
         xs AS (SELECT unnest(range(8)) AS x),
         ys AS (SELECT unnest(range(6)) AS y),
         px AS (SELECT media_id,
                       ((2 * x + 1) * w) // 16 AS sx,
                       ((2 * y + 1) * h) // 12 AS sy
                FROM ids CROSS JOIN xs CROSS JOIN ys)
    SELECT media_id,
           CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
           CAST(SUM((media_id + sx) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((media_id + sy) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((media_id + sx + sy) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY media_id
    """,
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (D5, retiring the byte-tiling stub): gradient
    BMPs (non-solid, so a fake resize cannot pass) are decoded, resampled
    nearest-neighbor to 8x6 with integer pixel-center math, re-encoded as
    BMP, and decoded AGAIN by the independent feature decoder — the
    round-trip means the emitted geometry/channel sums come from actual
    resampled bytes. strict=True end-to-end: no fake path executes."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_bmp_gradient_payload,
        decode_bmp_features,
        resize_images,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_bmp_gradient_payload(docs, "doc_id").withColumn(
        "media_type", F.lit("image/bmp")
    )
    resized = resize_images(media, width=8, height=6, strict=True)
    feats = decode_bmp_features(resized.select("media_id", "payload"))
    n_px = 8 * 6
    return feats.select(
        "media_id",
        "width",
        "height",
        # mean * n_px recovers the integer channel sum exactly (sums are
        # < 2^24, far inside double's exact-integer range)
        F.round(F.col("mean_r") * n_px).cast("long").alias("sum_r"),
        F.round(F.col("mean_g") * n_px).cast("long").alias("sum_g"),
        F.round(F.col("mean_b") * n_px).cast("long").alias("sum_b"),
    )


@query(
    "llm_corpus_pipeline",
    oracle=f"""
    -- same three stages as the Spark build: exact dedup (keep lowest
    -- doc_id per content hash) -> component quality gate -> per-lang
    -- corpus stats. Ratios are int/int double divisions, identical in
    -- both engines, so the gate is engine-stable.
    WITH kept AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(lower(text))
    ), gated AS (
      SELECT d.lang, d.text,
             len(list_filter(string_split(lower(d.text), ' '), w -> w <> '')) AS n_tok
      FROM documents d JOIN kept USING (doc_id)
      WHERE len(list_filter(string_split(lower(d.text), ' '), w -> w IN {_STOPS_SQL}))
              * 1.0 / len(list_filter(string_split(lower(d.text), ' '), w -> w <> '')) >= 0.05
        AND length(regexp_replace(d.text, '[A-Za-z0-9\\s]', '', 'g'))
              * 1.0 / length(d.text) <= 0.2
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM gated GROUP BY lang
    """,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation in one declarative plan:
    exact dedup -> quality gate (stopword + punctuation components) ->
    per-language token accounting. One shuffle per stage boundary
    (dedup groupBy, self-join on kept ids, final lang agg); Catalyst
    pipelines the gate into the scan of the joined side."""
    docs = load(spark, sf_dir, "documents")
    kept = (
        docs.groupBy(F.md5(F.lower("text")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    gated = (
        docs.join(kept, "doc_id")
        .filter(
            (T.stopword_ratio(F.col("text")) >= 0.05)
            & (T.punct_ratio(F.col("text")) <= 0.2)
        )
    )
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count_whitespace(F.col("text"))).cast("long").alias("total_tokens"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
    -- tf-idf with exact integer tf/df and a double ln(): scores of
    -- different (tf, df) pairs differ by far more than cross-libm last-bit
    -- noise, and equal pairs produce bit-identical doubles in both
    -- engines, so the ranking (with the term tie-break) is engine-stable
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS term
      FROM documents
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (
      SELECT lang, term, COUNT(*) AS tf FROM toks GROUP BY lang, term
    ), scored AS (
      SELECT lang, term,
             ROUND(tf * ln(n_docs * 1.0 / df), 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY tf * ln(n_docs * 1.0 / df) DESC, term
             ) AS rnk
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT lang, term, score, rnk FROM scored WHERE rnk <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf top-5 terms per language: exploded token stream feeds both
    the document-frequency table (distinct doc-term) and per-lang term
    counts; idf join is broadcast-size (vocabulary), ranking is one
    window per lang. At 100 TB the vocab df table is the only broadcast
    and the token explode shuffles once per aggregation."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.word_tokens(F.col("text"))).alias("term")
    )
    df = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    tf = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(F.desc(score), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "term", F.round(score, 4).alias("score"), "rnk")
    )


@query(
    "corpus_pack_sequences",
    oracle="""
    -- identical greedy packing: running token cumsum in doc_id order,
    -- pack = floor((cumsum - n_tok) / budget). Integer window math ->
    -- bit-identical across engines.
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang, CAST(FLOOR((cum - n_tok) / 2048.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc
    FROM c
    GROUP BY 1, 2
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining (D4-adjacent): assign documents to
    fixed token-budget packs (2048 tokens) greedily in doc_id order within
    each language shard.

    Expressed as a window cumsum + integer division — one shuffle per
    language partition, no Python. At 100 TB the PARTITION BY key is the
    shard (here: lang), so packing parallelizes across shards while staying
    deterministic; packs then feed the tokenizer as contiguous units.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", T.token_count_whitespace(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.withColumn("pack_id", F.floor((F.col("cum") - F.col("n_tok")) / F.lit(2048.0)).cast("long"))
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "doc_chunk_windows",
    oracle="""
    -- overlapping token windows: starts 0, 24, 48, ... < n_tokens
    -- (every doc yields >= 1 chunk; empty docs would yield one empty chunk)
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), starts AS (
      SELECT doc_id, ws, len(ws) AS n,
             unnest(range(0, greatest(len(ws), 1), 24)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // 24 AS BIGINT) AS chunk_id,
           CAST(least(32, n - start) AS BIGINT) AS n_tokens,
           array_to_string(ws[start + 1 : start + 32], ' ') AS chunk_text
    FROM starts
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (size 32, stride 24) — the document ->
    training-sample / RAG-chunk splitter. Pure JVM expressions: tokenize
    once, explode a stride sequence, slice per start. One narrow pass, no
    shuffle — embarrassingly parallel at any corpus size."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import tokens_col

    size, stride = 32, 24
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("ws")).withColumn(
        "n", F.size("ws")
    )
    starts = toks.withColumn(
        "start",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(stride))),
    )
    return starts.select(
        "doc_id",
        (F.col("start") / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(size), F.col("n") - F.col("start")).cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.slice(F.col("ws"), F.col("start") + 1, size)).alias("chunk_text"),
    )


@query(
    "bm25_ranked_search",
    oracle="""
    -- BM25 (k1=1.2, b=0.75) for the fixed query {join, hash, vector}.
    -- Determinism: tf/df/dl are exact ints, avgdl is one double division,
    -- each per-term score is a pure elementwise double chain (identical
    -- IEEE ops in both engines; ln() last-bit noise is 1e-16 relative,
    -- rounded away at 1e-6); per-term scores are ROUNDed FIRST, then
    -- summed as DECIMAL so addition order can't matter.
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl, (SELECT COUNT(*) FROM documents) AS n_docs FROM dl
    ), q AS (SELECT unnest(['join', 'hash', 'vector']) AS term),
    df AS (
      SELECT t.term, COUNT(DISTINCT doc_id) AS df
      FROM toks t JOIN q USING (term) GROUP BY t.term
    ), tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM toks t JOIN q USING (term) GROUP BY doc_id, t.term
    ), per_term AS (
      SELECT tf.doc_id,
             ROUND(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)),
                   6) AS s
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scored AS (
      SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS score
      FROM per_term GROUP BY doc_id
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
    FROM scored
    QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10
    """,
)
def bm25_ranked_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones) for a fixed term
    query — the lexical-search complement to the embedding ANN operators.

    Scale shape: see functions/text.py bm25_doc_scores (shared with
    hybrid_search_rrf); the final ranking is one TakeOrderedAndProject.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = T.bm25_doc_scores(docs, ["join", "hash", "vector"])
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("doc_id", "score", "rnk")
    )


@query(
    "multimodal_wav_decode",
    oracle="""
    -- closed-form twin of the REAL WAV decode: the synthesized square
    -- wave (amplitude 1000, n = 100 + (doc_id % 50) * 10 samples @ 8 kHz)
    -- has rms exactly 1000 and duration n/8 ms, both exact in binary
    SELECT doc_id AS media_id,
           8000 AS sample_rate,
           CAST(100 + (doc_id % 50) * 10 AS BIGINT) AS n_samples,
           (100 + (doc_id % 50) * 10) / 8.0 AS duration_ms,
           1000.0 AS rms,
           CAST(1000 AS BIGINT) AS peak
    FROM documents
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec multimodal path (D5): WAV/PCM is parseable with pure
    struct+numpy, so unlike the PIL/ffmpeg-class formats (stubbed,
    env-blocked) this decode is REAL — RIFF chunk walk, int16 PCM lift,
    acoustic features (duration/RMS/peak) per file, Arrow-batched via
    mapInPandas. The payload generator synthesizes a deterministic square
    wave per id, giving the oracle a closed form; the decoder never sees
    the formula, only bytes."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_wav_payload(docs, "doc_id")
    return decode_wav_features(media)


@query(
    "multimodal_bmp_decode",
    oracle="""
    -- closed-form twin of the real BMP decode: solid-color images, so the
    -- per-channel means are exactly the generator's channel values
    SELECT doc_id AS media_id,
           CAST(4 + (doc_id % 13) AS BIGINT) AS width,
           CAST(3 + (doc_id % 7) AS BIGINT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec IMAGE path (D5, the picture twin of multimodal_wav_decode):
    uncompressed 24-bit BMP parses with pure struct+numpy — header walk,
    stride-padded BGR rows lifted to a (h, w, 3) array, per-channel means
    out. Solid-color synthesis keeps the oracle closed-form while the
    decoder sees only bytes. JPEG/PNG/video stay env-blocked stubs."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_bmp_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_bmp_payload(docs, "doc_id")
    return decode_bmp_features(media)


@query(
    "multimodal_png_decode",
    oracle="""
    -- closed-form twin of the real PNG decode: solid-color images, so
    -- the per-channel means equal the generator's channel values exactly
    SELECT doc_id AS media_id,
           CAST(3 + (doc_id % 11) AS BIGINT) AS width,
           CAST(2 + (doc_id % 5) AS BIGINT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 11) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 3) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real COMPRESSED-image codec path (D5): PNG decodes with pure
    stdlib+numpy because zlib ships with Python — chunk walk with CRC32
    verification, inflate, and full scanline-filter reconstruction (the
    generator cycles through all five PNG filter types per row, so a
    decoder that skips filter math cannot round-trip it). Solid-color
    synthesis keeps the oracle closed-form while the decoder sees only
    bytes. JPEG/GIF/video stay env-blocked stubs."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_png_payload,
        decode_png_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_png_payload(docs, "doc_id")
    return decode_png_features(media)


@query(
    "phrase_search_positions",
    oracle="""
    -- Positional phrase search for "table hash": adjacency of the two
    -- terms' posting lists. Positions are 1-based list indices.
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), occ AS (
      SELECT doc_id,
             unnest([i for i in range(1, len(ws))
                     if ws[i] = 'table' AND ws[i+1] = 'hash']) AS pos
      FROM toks WHERE len(ws) >= 2
    )
    SELECT doc_id, COUNT(*) AS n_occurrences, CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM occ GROUP BY doc_id ORDER BY doc_id
    """,
)
def phrase_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index phrase search: the posting lists of the
    phrase's terms (posexplode positions, filtered to each term BEFORE the
    join) are equi-joined on (doc, pos+1=pos) — the scalable phrase-query
    plan: per-term postings shuffle on doc_id, no document-wide arrays in
    the hot path (the repo's interpreted-lambda-HOF hazard)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(T.word_tokens(F.col("text"))).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    t1 = toks.filter(F.col("term") == "table").select("doc_id", F.col("pos").alias("p1"))
    t2 = toks.filter(F.col("term") == "hash").select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("p2")
    )
    occ = t1.join(
        t2, (t1.doc_id == t2.doc_id2) & (t2.p2 == t1.p1 + 1)
    ).select("doc_id", F.col("p1").alias("pos"))
    return (
        occ.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


@query(
    "unigram_perplexity_scores",
    oracle="""
    -- Per-doc cross-entropy under a corpus unigram LM with add-one
    -- smoothing: p(w) = (c_w + 1) / (N + V). The language-model quality
    -- signal (high avg bits = out-of-distribution doc). p is an exact
    -- int ratio; log2 can differ in the last ulp -> per-token bits are
    -- ROUNDed at 1e-8 and DECIMAL-summed; the per-doc mean divides that
    -- exact sum by an exact int, identical in both engines.
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS term
      FROM documents
    ), vocab AS (
      SELECT term, COUNT(*) AS c FROM toks GROUP BY term
    ), stats AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS v_size
      FROM vocab
    ), bits AS (
      SELECT t.doc_id,
             ROUND(-log2((v.c + 1) * 1.0 / (s.n_total + s.v_size)), 8) AS b
      FROM toks t JOIN vocab v USING (term) CROSS JOIN stats s
      WHERE t.doc_id < 25
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(b AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 6)
             AS avg_bits
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """,
)
def unigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (bits/token) of each document under the corpus's own
    add-one-smoothed unigram LM — the classic LM-based quality/outlier
    filter (KenLM-perplexity's shape with a SQL-expressible model).

    Scale shape: one wordcount pass builds the model; scoring is a
    broadcastable |vocab| join against the token stream, partial-aggregated
    per doc. Model "training" and scoring are both single-shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.word_tokens(F.col("text"))).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist()
    row = vocab.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    ).collect()[0]
    denom = float(row["n_total"] + row["v_size"])
    bits = (
        toks.filter(F.col("doc_id") < 25)
        .join(F.broadcast(vocab), "term")
        .select(
            "doc_id",
            F.round(-F.log2((F.col("c") + 1) * 1.0 / F.lit(denom)), 8).alias("b"),
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("b").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_bits"),
        )
        .orderBy("doc_id")
    )


# --- Unicode normalization audit (corpus-cleaning NFC pass) -------------------


@query(
    "unicode_nfc_stats",
    oracle="""
    -- DuckDB's nfc_normalize (utf8proc) and Python's unicodedata.normalize
    -- implement the same Unicode NFC algorithm, so both engines compose the
    -- planted e + U+0301 sequences to U+00E9 identically; length() counts
    -- code points in both.
    WITH mutated AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0
                  THEN replace(text, 'e', 'e' || chr(769))
                  ELSE text END AS raw
      FROM documents
    ),
    norm AS (SELECT source, raw, nfc_normalize(raw) AS nfc FROM mutated)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN nfc <> raw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_denormalized,
           CAST(SUM(length(raw) - length(nfc)) AS BIGINT) AS codepoints_saved
    FROM norm GROUP BY source ORDER BY source
    """,
)
def unicode_nfc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit — the corpus-cleaning pass that
    collapses decomposed combining sequences before tokenization (decomposed
    text breaks exact dedup and inflates token counts). The fixture corpus
    is ASCII, so denormalized docs are planted deterministically (every
    'e' in doc_id % 7 == 0 becomes e + COMBINING ACUTE); Spark normalizes
    with an Arrow-batched unicodedata.normalize UDF (no JVM builtin exists)
    and audits docs-changed / code-points-saved per source.

    Scale shape: embarrassingly parallel map over docs, one tiny agg."""
    import unicodedata

    docs = load(spark, sf_dir, "documents")
    raw = F.when(
        F.col("doc_id") % 7 == 0,
        F.replace(F.col("text"), F.lit("e"), F.lit("é")),
    ).otherwise(F.col("text"))

    # no type hints: `from __future__ import annotations` breaks pandas_udf
    # hint inference (returnType is explicit)
    @F.pandas_udf("string")
    def nfc(texts):
        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    m = docs.select("source", raw.alias("raw")).withColumn("nfc", nfc(F.col("raw")))
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("nfc") != F.col("raw")).cast("long"))
            .cast("long")
            .alias("n_denormalized"),
            F.sum(F.length("raw") - F.length("nfc"))
            .cast("long")
            .alias("codepoints_saved"),
        )
        .orderBy("source")
    )


# --- weighted sparse similarity: tf-idf cosine all-pairs ----------------------


@query(
    "sparse_cosine_topk_pairs",
    oracle="""
    -- identical doubles cross-engine: tf/df are exact ints, ln() is one
    -- libm call on the same double, norms and dot products are per-term
    -- ROUND -> DECIMAL sums (order-independent), everything else is an
    -- elementwise IEEE chain
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    w AS (
      SELECT doc_id, term, tf * ln(n_docs * 1.0 / df) AS w
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE df BETWEEN 2 AND 1000
    ),
    nrm AS (
      SELECT doc_id,
             sqrt(CAST(SUM(CAST(ROUND(w * w, 8) AS DECIMAL(28,8))) AS DOUBLE))
               AS nrm
      FROM w GROUP BY 1
    ),
    u AS (SELECT w.doc_id, term, w / nrm AS u FROM w JOIN nrm USING (doc_id)),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(CAST(ROUND(a.u * b.u, 8) AS DECIMAL(28,8))) AS DOUBLE)
               AS cos
      FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, ROUND(cos, 6) AS cosine
    FROM p
    ORDER BY cosine DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def sparse_cosine_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sparse similarity: tf-idf cosine between documents via the
    inverted-index self-join (Bayardo et al. AllPairs shape) — the WEIGHTED
    counterpart of the Jaccard / containment dedup family: boilerplate
    terms contribute ~nothing (idf), rare shared terms dominate.

    Scale shape: work is sum over terms of df², so the df cap [2, 1000] is
    the AllPairs hot-term defense (df=1 terms can't pair; ubiquitous terms
    are idf≈0 noise and would otherwise dominate the join). The vocabulary
    (df table) broadcasts; postings equi-join on term; top-k is
    TakeOrderedAndProject, no global sort."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.word_tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = docs.count()
    w = (
        tf.join(F.broadcast(df.filter((F.col("df") >= 2) & (F.col("df") <= 1000))), "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 8).cast("decimal(28,8)")).cast(
                "double"
            )
        ).alias("nrm")
    )
    u = w.join(nrm, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("nrm")).alias("u")
    )
    a = u.select(F.col("doc_id").alias("doc_a"), "term", F.col("u").alias("ua"))
    b = u.select(F.col("doc_id").alias("doc_b"), "term", F.col("u").alias("ub"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.round(F.col("ua") * F.col("ub"), 8).cast("decimal(28,8)"))
            .cast("double")
            .alias("cos")
        )
    )
    return (
        pairs.select("doc_a", "doc_b", F.round("cos", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(20)
    )


# --- interpolated bigram LM scoring -------------------------------------------


@query(
    "bigram_perplexity_scores",
    oracle="""
    -- Interpolated bigram LM (Jelinek-Mercer, lambda = 0.75): p(w2|w1) =
    -- 0.75 * (c(w1 w2)+1)/(c1(w1)+V) + 0.25 * (c(w2)+1)/(N+V), where c1
    -- is the bigram-context count (so the bigram term normalizes). All
    -- probabilities are exact int ratios -> identical doubles; per-token
    -- bits ROUND@1e-8 -> DECIMAL sum; first token scored by the unigram.
    WITH lsts AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS lst
      FROM documents
    ),
    toks AS (SELECT doc_id, unnest(lst) AS term FROM lsts),
    vocab AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
    stats AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS v_size
      FROM vocab
    ),
    bg AS (
      SELECT doc_id,
             unnest([struct_pack(w1 := lst[i], w2 := lst[i + 1])
                     for i in range(1, len(lst))]) AS p
      FROM lsts WHERE len(lst) >= 2
    ),
    bgc AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
    bits AS (
      SELECT b.doc_id,
             ROUND(-log2(
               0.75 * (g.cb + 1) * 1.0 / (x.c1 + s.v_size)
               + 0.25 * (v.c + 1) * 1.0 / (s.n_total + s.v_size)
             ), 8) AS b
      FROM bg b
      JOIN bgc g ON g.w1 = b.p.w1 AND g.w2 = b.p.w2
      JOIN ctx x ON x.w1 = b.p.w1
      JOIN vocab v ON v.term = b.p.w2
      CROSS JOIN stats s
      WHERE b.doc_id < 25
    ),
    first_tok AS (
      SELECT l.doc_id,
             ROUND(-log2((v.c + 1) * 1.0 / (s.n_total + s.v_size)), 8) AS b,
             len(l.lst) AS n_tokens
      FROM lsts l JOIN vocab v ON v.term = l.lst[1] CROSS JOIN stats s
      WHERE l.doc_id < 25 AND len(l.lst) >= 1
    )
    SELECT f.doc_id,
           CAST(f.n_tokens AS BIGINT) AS n_tokens,
           ROUND(CAST(
                   SUM(CAST(g.b AS DECIMAL(28,8))) + ANY_VALUE(CAST(f.b AS DECIMAL(28,8)))
                 AS DOUBLE) / f.n_tokens, 6) AS avg_bits
    FROM first_tok f JOIN bits g USING (doc_id)
    GROUP BY f.doc_id, f.n_tokens
    ORDER BY f.doc_id
    """,
)
def bigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy under an interpolated bigram LM (Jelinek-Mercer
    smoothing) — the sequence-aware upgrade of the unigram scorer: word-
    order-scrambled or template-stitched text scores high here while
    passing unigram filters.

    Scale shape: bigram stream via arrays_zip of shifted slices (no
    interpreted element_at lambdas), two wordcount-shaped model passes
    (bigram counts, context counts), scoring joins are broadcast-sized
    (vocab / bigram vocab); everything partial-aggregates per doc."""
    docs = load(spark, sf_dir, "documents")
    lsts = docs.select("doc_id", T.word_tokens(F.col("text")).alias("lst"))
    toks = lsts.select("doc_id", F.explode("lst").alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist()
    srow = vocab.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("v_size"),
    ).collect()[0]
    n_total, v_size = int(srow["n_total"]), int(srow["v_size"])

    sz = F.size("lst")
    bg = (
        lsts.filter(sz >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("lst", 1, sz - 1).alias("w1"),
                    F.slice(F.col("lst"), 2, sz - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")).persist()
    ctx = bgc.groupBy("w1").agg(F.sum("cb").cast("long").alias("c1"))
    p_bi = (F.col("cb") + 1) * 1.0 / (F.col("c1") + F.lit(v_size))
    p_uni = (F.col("c") + 1) * 1.0 / F.lit(float(n_total + v_size))
    bits = (
        bg.filter(F.col("doc_id") < 25)
        .join(F.broadcast(bgc), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(vocab), F.col("w2") == F.col("term"))
        .select(
            "doc_id",
            F.round(-F.log2(F.lit(0.75) * p_bi + F.lit(0.25) * p_uni), 8).alias("b"),
        )
    )
    first_tok = (
        lsts.filter((F.col("doc_id") < 25) & (sz >= 1))
        .select("doc_id", F.col("lst")[0].alias("term"), sz.alias("n_tokens"))
        .join(F.broadcast(vocab), "term")
        .select(
            "doc_id",
            F.round(
                -F.log2((F.col("c") + 1) * 1.0 / F.lit(float(n_total + v_size))), 8
            ).alias("fb"),
            "n_tokens",
        )
    )
    return (
        first_tok.join(bits, "doc_id")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.round(
                (
                    F.sum(F.col("b").cast("decimal(28,8)"))
                    + F.any_value(F.col("fb").cast("decimal(28,8)"))
                ).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("avg_bits")
        )
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "avg_bits")
        .orderBy("doc_id")
    )


@query(
    "vocab_oov_rates",
    oracle="""
    -- tokenizer-coverage audit: fix the vocabulary to the corpus's top-1k
    -- words (count desc, word asc — a total order), then measure the
    -- out-of-vocabulary token rate per source. All exact integers until
    -- the final ratio.
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS term
      FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS c,
               row_number() OVER (ORDER BY COUNT(*) DESC, term) AS rn
        FROM toks GROUP BY term
      ) WHERE rn <= 1000
    )
    SELECT t.source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (term)
    GROUP BY t.source ORDER BY t.source
    """,
)
def vocab_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate audit: per-source fraction of tokens
    outside the corpus top-1000 vocabulary — the pre-training check that a
    tokenizer (or frequency-capped vocab) won't shred a particular source
    into unknowns. One wordcount pass fixes the vocab (broadcast-sized),
    one left join scores the stream; the top-1000 cut uses a total order
    so the vocabulary itself is engine-stable."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.word_tokens(F.col("text"))).alias("term")
    )
    w = Window.orderBy(F.desc("c"), "term")
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1000)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    j = toks.join(F.broadcast(vocab), "term", "left")
    oov = F.col("in_vocab").isNull().cast("long")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(F.sum(oov) * 1.0 / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


@query(
    "zipf_fit_slope",
    oracle="""
    -- Zipf exponent of the corpus: OLS slope of log(freq) on log(rank)
    -- over the top-500 words — natural text sits near -1, templated or
    -- deduplicated-to-death corpora drift off. Closed-form slope from
    -- rounded-term DECIMAL moments (the trend_slope_per_type machinery).
    WITH wc AS (
      SELECT term, COUNT(*) AS c FROM (
        SELECT unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
          AS term
        FROM documents
      ) GROUP BY term
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rnk
      FROM wc
    ),
    pts AS (
      SELECT ROUND(ln(rnk), 8) AS x, ROUND(ln(c), 8) AS y
      FROM ranked WHERE rnk <= 500
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM m
    """,
)
def zipf_fit_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus word-frequency distribution: OLS slope
    of the log-log rank/frequency curve over the top-500 words. Natural
    language sits near slope -1; big deviations flag templated/synthetic
    text or over-aggressive dedup — a one-number corpus-health metric.
    One wordcount pass + a 500-row regression via decimal moments."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.word_tokens(F.col("text"))).alias("term"))
    wc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), "term")
    pts = (
        wc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 500)
        .select(
            F.round(F.log("rnk"), 8).alias("x"), F.round(F.log("c"), 8).alias("y")
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "readability_scores",
    oracle="""
    -- Flesch-Kincaid grade per source from pure regex counts: sentences =
    -- [.!?]+ runs (min 1), words = whitespace tokens, syllables ≈ vowel
    -- groups per word (min 1 per word). All exact integers; the FK
    -- formula is one elementwise double chain.
    WITH f AS (
      SELECT source,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
             len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS words,
             GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')),
                      len(list_filter(string_split(lower(text), ' '),
                                      w -> w <> ''))) AS sylls
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(
             0.39 * (words * 1.0 / sents)
             + 11.8 * (sylls * 1.0 / words) - 15.59, 6)
             AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_fk_grade,
           ROUND(CAST(SUM(CAST(ROUND(words * 1.0 / sents, 6)
                               AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4)
             AS avg_words_per_sentence
    FROM f GROUP BY source ORDER BY source
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid readability per source — the classic text-quality
    feature (too-low grade = fragments/boilerplate, too-high = OCR salad
    or legalese) computed entirely from regex counts: sentence runs,
    whitespace words, vowel-group syllable approximation (floored at one
    per word). Zero Python; one scan; per-term ROUND -> DECIMAL means."""
    docs = load(spark, sf_dir, "documents")
    words = F.size(T.word_tokens(F.col("text")))
    sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    sylls = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
        ),
        words,
    )
    fk = F.round(
        F.lit(0.39) * (words * F.lit(1.0) / sents)
        + F.lit(11.8) * (sylls * F.lit(1.0) / words)
        - F.lit(15.59),
        6,
    )
    wps = F.round(words * F.lit(1.0) / sents, 6)
    f = docs.filter(words > 0).select("source", fk.alias("fk"), wps.alias("wps"))
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("fk").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_fk_grade"),
            F.round(
                F.sum(F.col("wps").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_words_per_sentence"),
        )
        .orderBy("source")
    )


@query(
    "vocab_novelty_by_batch",
    oracle="""
    -- vocabulary novelty curve over ingest order (batches of 200 docs):
    -- share of each batch's distinct terms never seen in earlier batches.
    -- Declining novelty = the crawl is saturating; a spike = a new domain
    -- entered the pipeline. Exact set logic on (term, first batch).
    WITH toks AS (
      SELECT CAST(doc_id // 200 AS BIGINT) AS batch,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS term
      FROM documents
    ),
    bt AS (SELECT DISTINCT batch, term FROM toks),
    first_b AS (SELECT term, MIN(batch) AS fb FROM bt GROUP BY term)
    SELECT bt.batch,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(CASE WHEN f.fb = bt.batch THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new_terms,
           ROUND(SUM(CASE WHEN f.fb = bt.batch THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS novelty_rate
    FROM bt JOIN first_b f USING (term)
    GROUP BY bt.batch ORDER BY bt.batch
    """,
)
def vocab_novelty_by_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary novelty curve across ingest batches (200 docs each):
    the fraction of each batch's distinct terms appearing for the first
    time — the saturation signal that tells a crawl when marginal data
    stops adding vocabulary (and flags a new domain when it spikes). One
    distinct (batch, term) table, a min-batch aggregate, one join."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") / 200).cast("long").alias("batch"),
        F.explode(T.word_tokens(F.col("text"))).alias("term"),
    )
    bt = toks.distinct().persist()
    first_b = bt.groupBy("term").agg(F.min("batch").alias("fb"))
    return (
        bt.join(first_b, "term")
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum((F.col("fb") == F.col("batch")).cast("long"))
            .cast("long")
            .alias("n_new_terms"),
            F.round(
                F.sum((F.col("fb") == F.col("batch")).cast("long")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("batch")
    )


@query(
    "source_vocab_jaccard",
    oracle="""
    -- corpus-level similarity between sources: Jaccard of their
    -- vocabularies via one distinct (source, term) table self-joined on
    -- term (intersections) against per-source vocab sizes (union by
    -- inclusion-exclusion). Top-10 most similar pairs; exact ints.
    WITH st AS (
      SELECT DISTINCT source,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS term
      FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS v FROM st GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS i
      FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(i AS BIGINT) AS n_shared_terms,
           ROUND(i * 1.0 / (sa.v + sb.v - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY jaccard DESC, src_a, src_b
    LIMIT 10
    """,
)
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-to-source vocabulary Jaccard: which data sources speak the
    same language (near-identical vocab = likely mirrors or shared
    boilerplate; disjoint vocab = genuinely new material). The
    inverted-index self-join shape again — work ∝ shared terms, never
    |sources|² × |vocab| — with union sizes by inclusion-exclusion."""
    docs = load(spark, sf_dir, "documents")
    st = docs.select(
        "source", F.explode(T.word_tokens(F.col("text"))).alias("term")
    ).distinct().persist()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = st.select(F.col("source").alias("src_a"), "term")
    b = st.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("v").alias("va"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("v").alias("vb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("i").cast("long").alias("n_shared_terms"),
            F.round(
                F.col("i") * 1.0 / (F.col("va") + F.col("vb") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "src_a", "src_b")
        .limit(10)
    )


@query(
    "source_binaryfile_media",
    oracle="""
    -- closed-form twin of the binaryFile-source ingest + real BMP decode
    -- (same generator formulas as multimodal_bmp_decode, first 100 docs)
    SELECT doc_id AS media_id,
           CAST(54 + ((( (4 + (doc_id % 13)) * 3 + 3) // 4) * 4)
                * (3 + (doc_id % 7)) AS BIGINT) AS n_bytes,
           CAST(4 + (doc_id % 13) AS BIGINT) AS width,
           CAST(3 + (doc_id % 7) AS BIGINT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r
    FROM documents WHERE doc_id < 100
    """,
)
def source_binaryfile_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 completed for media: ``spark.read.format('binaryFile')`` — the
    ingestion path a 100 TB multimodal corpus actually starts from (one
    opaque file per asset, scanned in parallel, payload as a binary
    column + (path, length) metadata) — feeding the REAL BMP codec. Files
    are synthesized once per fixture fingerprint; media_id recovers from
    the filename; decoded geometry/color and the source's own length
    column are both oracle-checked against the generator's closed form."""
    import os
    import tempfile

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_bytes,
        _bmp_feats,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.misc_queries import (
        _path_fingerprint,
    )

    fp = _path_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    media_dir = os.path.join(tempfile.gettempdir(), f"bfcms_binmedia_{fp}")
    if not os.path.isdir(media_dir):
        tmp = f"{media_dir}.tmp-{os.getpid()}"
        os.makedirs(tmp)
        ids = [
            r[0]
            for r in load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100)
            .select("doc_id")
            .collect()
        ]
        for i in ids:
            with open(os.path.join(tmp, f"media_{i:06d}.bmp"), "wb") as fh:
                fh.write(_bmp_bytes(int(i)))
        try:
            os.rename(tmp, media_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(media_dir)
        .select("path", "length", "content")
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, length, content in zip(
                pdf["path"], pdf["length"], pdf["content"]
            ):
                mid = int(os.path.basename(path)[6:12])
                w, h, mr, _mg, _mb = _bmp_feats(bytes(content))
                rows.append((mid, int(length), w, h, mr))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "width", "height", "mean_r"]
            )

    return raw.mapInPandas(
        decode,
        "media_id long, n_bytes long, width long, height long, mean_r double",
    )


@query(
    "stream_binaryfile_decode",
    oracle="""
    -- same closed form as source_binaryfile_media: continuous ingest of
    -- the media directory decodes every asset exactly once (stateless
    -- map over micro-batches; order can't affect the appended set)
    SELECT doc_id AS media_id,
           CAST(4 + (doc_id % 13) AS BIGINT) AS width,
           CAST(3 + (doc_id % 7) AS BIGINT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r
    FROM documents WHERE doc_id < 100
    """,
)
def stream_binaryfile_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS multimodal ingest (C1 meets D5): readStream over the
    binary media directory — the arrive-and-decode pipeline a production
    corpus runs — with the real BMP codec applied per micro-batch via
    mapInPandas. Stateless map, so the appended result equals the batch
    decode regardless of batch order; exactly-once comes from the file
    source's checkpointed log."""
    import os

    # materialize the media dir via the batch query's cache
    source_binaryfile_media(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        _bmp_feats,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.misc_queries import (
        _path_fingerprint,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
        run_available_now,
    )
    import tempfile

    fp = _path_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    media_dir = os.path.join(tempfile.gettempdir(), f"bfcms_binmedia_{fp}")
    raw = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed by the source; streaming requires
        # stating it explicitly
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.bmp")
        .option("maxFilesPerTrigger", 30)
        .load(media_dir)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                mid = int(os.path.basename(path)[6:12])
                w, h, mr, _mg, _mb = _bmp_feats(bytes(content))
                rows.append((mid, w, h, mr))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "mean_r"])

    decoded = raw.mapInPandas(
        decode, "media_id long, width long, height long, mean_r double"
    )
    return run_available_now(decoded, "append")


@query(
    "heaps_law_vocab_growth",
    oracle="""
    -- Heaps'-law fit V(N) = K * N^beta of 3-gram-shingle vocabulary
    -- growth over the doc_id ingest order: V at 10 checkpoint prefixes
    -- via first-occurrence flags, then log-log OLS with rounded-term
    -- decimal moments. beta << 1 = fast novelty decay (duplication);
    -- the curve a curation pipeline watches to decide when more data
    -- stops buying new content.
    WITH w AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      FROM w WHERE len(ws) >= 3
    ), firsts AS (
      SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    ), ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS n_docs
      FROM (SELECT DISTINCT doc_id FROM sh)
    ), ck AS (
      SELECT n_docs, doc_id FROM ranked
      WHERE n_docs % (SELECT CAST(CEIL(MAX(n_docs) / 10.0) AS BIGINT) FROM ranked) = 0
         OR n_docs = (SELECT MAX(n_docs) FROM ranked)
    ), pts AS (
      SELECT DISTINCT ck.n_docs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
              WHERE first_doc <= ck.doc_id) AS v
      FROM ck
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(CAST(ROUND(ln(n_docs), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(ln(n_docs) * ln(n_docs), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(ln(v), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(ln(n_docs) * ln(v), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      FROM pts
    )
    SELECT np AS n_checkpoints,
           ROUND((sxy - sx * sy / np) / (sxx - sx * sx / np), 6) AS beta,
           ROUND(exp(sy / np - (sxy - sx * sy / np) / (sxx - sx * sx / np) * sx / np), 4) AS k_coef
    FROM m
    """,
)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over the shingle vocabulary —
    the curation diagnostic for 'is more data still buying new content':
    V(N) = K·N^beta with beta near 1 = every batch novel, beta near 0 =
    saturated/duplicated corpus. First-occurrence flags (one groupBy)
    give V at 10 ingest checkpoints without re-scanning prefixes; the
    log-log OLS uses the repo's rounded-term decimal moments, so K and
    beta are hash-checked cross-engine."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        shingles_col,
    )

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles_col(F.col("text"), 3)).alias("s")
    )
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    ranked = (
        sh.select("doc_id")
        .distinct()
        .withColumn("n_docs", F.row_number().over(Window.orderBy("doc_id")))
    )
    tot = ranked.agg(
        F.max("n_docs").alias("nmax"),
        F.ceil(F.max("n_docs") / 10.0).cast("long").alias("step"),
    )
    ck = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("n_docs") % F.col("step") == 0)
            | (F.col("n_docs") == F.col("nmax"))
        )
        .select("n_docs", "doc_id")
        .distinct()
    )
    pts = (
        ck.join(firsts, firsts["first_doc"] <= ck["doc_id"])
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    lx, ly = F.log(F.col("n_docs").cast("double")), F.log(F.col("v").cast("double"))
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.round(lx, 8).cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.round(lx * lx, 8).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum(F.round(ly, 8).cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum(F.round(lx * ly, 8).cast("decimal(28,8)")).cast("double").alias("sxy"),
    )
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np")
    )
    return m.select(
        F.col("np").alias("n_checkpoints"),
        F.round(beta, 6).alias("beta"),
        F.round(
            F.exp(F.col("sy") / F.col("np") - beta * F.col("sx") / F.col("np")), 4
        ).alias("k_coef"),
    )


@query(
    "zipf_slope_shingles",
    oracle="""
    -- Zipf rank-frequency fit over the top-100 shingles: slope of
    -- ln(freq) vs ln(rank) by the same rounded-term decimal OLS. A slope
    -- near -1 is natural-language-like; far flatter flags templated /
    -- machine-generated text — a generation-artifact audit.
    WITH w AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ), sh AS (
      SELECT unnest(list_transform(range(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      FROM w WHERE len(ws) >= 3
    ), freq AS (
      SELECT s, COUNT(*) AS f FROM sh GROUP BY s
    ), ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, s) AS r FROM freq
      QUALIFY r <= 100
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(CAST(ROUND(ln(r), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(ln(r) * ln(r), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(ln(f), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(ln(r) * ln(f), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy
      FROM ranked
    )
    SELECT np AS n_ranks,
           ROUND((sxy - sx * sy / np) / (sxx - sx * sx / np), 6) AS zipf_slope
    FROM m
    """,
)
def zipf_slope_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope over the top-100 shingles — the
    companion audit to Heaps' law (growth says how fast novelty decays;
    Zipf says whether the frequency mass LOOKS like language): slope
    near -1 is natural text, a flat curve flags templated or synthetic
    content. Occurrence counts are exact ints; the log-log OLS rides the
    rounded-term decimal moments."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        shingle_occurrences_col,
    )

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(F.explode(shingle_occurrences_col(F.col("text"), 3)).alias("s"))
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        freq.withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("f"), "s"))
        )
        .filter(F.col("r") <= 100)
    )
    lx, ly = F.log(F.col("r").cast("double")), F.log(F.col("f").cast("double"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.round(lx, 8).cast("decimal(28,8)")).cast("double").alias("sx"),
        F.sum(F.round(lx * lx, 8).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum(F.round(ly, 8).cast("decimal(28,8)")).cast("double").alias("sy"),
        F.sum(F.round(lx * ly, 8).cast("decimal(28,8)")).cast("double").alias("sxy"),
    )
    return m.select(
        F.col("np").alias("n_ranks"),
        F.round(
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np")),
            6,
        ).alias("zipf_slope"),
    )


@query(
    "kneser_ney_bigram_scores",
    oracle="""
    -- Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the smoothing
    -- n-gram LMs shipped with for two decades): absolute discount d=0.75
    -- on the bigram term, mass redistributed via CONTINUATION counts —
    -- Pcont(w2) = |contexts w2 follows| / |bigram types| — not raw
    -- unigram frequency (the "San Francisco" fix: 'francisco' is frequent
    -- but follows only one context, so KN scores it low as a novel
    -- continuation). P_KN(w2|w1) = max(cb-d,0)/c1(w1)
    -- + d*N1p_fwd(w1)/c1(w1) * Pcont(w2). All counts are exact integers,
    -- ratios identical doubles; per-occurrence bits ROUND@1e-8 -> DECIMAL
    -- sum (the repo's float-agg rule), reported per lang.
    WITH lsts AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS lst
      FROM documents
    ),
    bg AS (
      SELECT lang,
             unnest([struct_pack(w1 := lst[i], w2 := lst[i + 1])
                     for i in range(1, len(lst))]) AS p
      FROM lsts WHERE len(lst) >= 2
    ),
    bgc AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS cb
            FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1p_fwd
            FROM bgc GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM bgc GROUP BY w2),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_types FROM bgc),
    bits AS (
      SELECT b.lang,
             ROUND(-log2(
               greatest(g.cb - 0.75, 0) / x.c1
               + 0.75 * x.n1p_fwd / x.c1 * (c.n1p_bwd * 1.0 / s.b_types)
             ), 8) AS bits
      FROM bg b
      JOIN bgc g ON g.w1 = b.p.w1 AND g.w2 = b.p.w2
      JOIN ctx x ON x.w1 = b.p.w1
      JOIN cont c ON c.w2 = b.p.w2
      CROSS JOIN stats s
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(bits AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 6)
             AS avg_bits
    FROM bits GROUP BY lang
    """,
)
def kneser_ney_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang cross-entropy under an interpolated Kneser-Ney bigram LM —
    the continuation-count smoothing that distinguishes "frequent word"
    from "versatile continuation" (the standard against which the JM model
    in bigram_perplexity_scores is the baseline). Model passes are
    wordcount-shaped (bigram counts, context totals + fan-out, continuation
    fan-in, one global type count); scoring joins are broadcast-sized
    (bigram vocab is O(vocab^2), independent of corpus rows); per-occurrence
    bits partial-aggregate per lang."""
    docs = load(spark, sf_dir, "documents")
    lsts = docs.select("doc_id", "lang", T.word_tokens(F.col("text")).alias("lst"))
    sz = F.size("lst")
    bg = (
        lsts.filter(sz >= 2)
        .select(
            "lang",
            F.explode(
                F.arrays_zip(
                    F.slice("lst", 1, sz - 1).alias("w1"),
                    F.slice(F.col("lst"), 2, sz - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb")).persist()
    ctx = bgc.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    cont = bgc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_bwd"))
    stats = bgc.agg(F.count(F.lit(1)).cast("long").alias("b_types"))
    p_kn = (
        F.greatest(F.col("cb") - 0.75, F.lit(0)) / F.col("c1")
        + F.lit(0.75) * F.col("n1p_fwd") / F.col("c1")
        * (F.col("n1p_bwd") * 1.0 / F.col("b_types"))
    )
    bits = (
        bg.join(F.broadcast(bgc), ["w1", "w2"])
        .join(F.broadcast(ctx), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(stats))
        .select("lang", F.round(-F.log2(p_kn), 8).alias("bits"))
    )
    return bits.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("bits").cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("avg_bits"),
    )


@query(
    "multimodal_gif_decode",
    oracle="""
    -- closed-form twin of the REAL animated-GIF decode (block walk,
    -- sub-block reassembly, variable-width LZW inflate, palette map):
    -- screen (4 + id%9) x (3 + id%5), 2 + id%3 frames, pixel (x,y,f)
    -- indexes palette entry (id + 3x + 5y + 7f) % 16 whose channels are
    -- ((id + 17i) % 256, (id*7 + 29i) % 256, (id*3 + 41i) % 256);
    -- channel sums over every pixel of every frame are exact integers.
    WITH ids AS (SELECT doc_id AS media_id,
                        4 + doc_id % 9 AS w, 3 + doc_id % 5 AS h,
                        2 + doc_id % 3 AS nf
                 FROM documents),
         xs AS (SELECT unnest(range(12)) AS x),
         ys AS (SELECT unnest(range(7)) AS y),
         fs AS (SELECT unnest(range(4)) AS f),
         px AS (
           SELECT media_id, w, h, nf,
                  (media_id + 3 * x + 5 * y + 7 * f) % 16 AS i
           FROM ids CROSS JOIN xs CROSS JOIN ys CROSS JOIN fs
           WHERE x < w AND y < h AND f < nf
         )
    SELECT media_id,
           CAST(ANY_VALUE(w) AS BIGINT) AS width,
           CAST(ANY_VALUE(h) AS BIGINT) AS height,
           CAST(ANY_VALUE(nf) AS BIGINT) AS n_frames,
           CAST(SUM((media_id + 17 * i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((media_id * 7 + 29 * i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((media_id * 3 + 41 * i) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY media_id
    """,
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-ANIMATION path (D5): animated GIF89a decoded by a
    complete pure-stdlib LZW implementation — variable-width little-endian
    codes, dictionary growth past the initial 5-bit width, CLEAR/EOI,
    KwKwK, sub-block reassembly, palette mapping — no codec library. GIF
    was on the env-blocked list solely for PIL; its only compression is
    LZW, which needs none. Exact integer geometry + channel sums are
    value-hash-checked against the generator's closed form, so a decoder
    that shortcuts any stage cannot pass. JPEG (DCT imaging stack) is now
    the sole env-blocked image format. See operators/multimodal.py:
    _gif_lzw_encode/_gif_lzw_decode/_gif_decode_frames."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_gif_payload,
        decode_gif_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_gif_payload(docs, "doc_id")
    return decode_gif_features(media)


@query(
    "multimodal_jpeg_decode",
    oracle="""
    -- closed-form twin of the real baseline-JPEG decode: images are
    -- constant per 8x8 tile with EVEN offsets from 128, so the quantized
    -- DC coefficients are exact, the decode is bit-exact, and the mean
    -- gray equals the tile-generator average (identical IEEE division of
    -- an exact integer sum by the tile count).
    WITH dims AS (
      SELECT doc_id AS media_id,
             2 + (doc_id % 3) AS wt,
             1 + (doc_id % 2) AS ht
      FROM documents
    ),
    tiles AS (
      SELECT d.media_id, d.wt, d.ht,
             128 + 2 * ((((d.media_id * 7 + t.t * 13) % 121) + 121) % 121 - 60)
               AS v
      FROM dims d JOIN (SELECT unnest(range(8)) AS t) t
        ON t.t < d.wt * d.ht
    )
    SELECT media_id,
           CAST(8 * wt AS INTEGER) AS width,
           CAST(8 * ht AS INTEGER) AS height,
           ROUND(CAST(SUM(v) AS BIGINT) * 1.0 / (wt * ht), 6) AS mean_gray
    FROM tiles GROUP BY media_id, wt, ht
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real DCT-compressed-image codec path (D5's last image format):
    baseline grayscale JPEG decodes with pure stdlib+numpy — marker walk,
    canonical Huffman built from the carried DHT, entropy decode with
    byte unstuffing, differential DC + run-length AC, dezigzag,
    dequantize, 8x8 IDCT, level shift. The synthesized bitstreams are
    REAL JPEGs (any baseline reader decodes them); their constant-tile
    spectra make the lossy pipeline exact (quantized DCs hit integers) so
    the oracle is closed-form. The general encode path (full FDCT, ZRL/
    EOB run-length, per-file Huffman) is exercised by the roundtrip
    property tests; MP3/compressed-video remain the only env-blocked
    formats."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_jpeg_payload,
        decode_jpeg_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_jpeg_payload(docs, "doc_id")
    return decode_jpeg_features(media).select(
        "media_id",
        "width",
        "height",
        F.round("mean_gray", 6).alias("mean_gray"),
    )


@query(
    "gopher_quality_rules",
    oracle=f"""
    -- The Gopher (Rae et al. 2021, A1.1) document-quality rule battery as
    -- a per-source audit: each rule evaluated exactly (integer counts and
    -- int/int double divisions, identical cross-engine), then pass RATES
    -- per source. Thresholds are the published ones; rates (not a
    -- pass/fail corpus) keep the report informative on fixture-sized docs.
    WITH m AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws,
             string_split(text, chr(10)) AS lines,
             length(text) - length(replace(text, '#', ''))
               + (length(text) - length(replace(text, '...', ''))) / 3 AS n_sym
      FROM documents
    ),
    r AS (
      SELECT source,
             len(ws) AS n_tok,
             CASE WHEN len(ws) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r1,
             CASE WHEN list_sum(list_transform(ws, w -> length(w))) * 1.0
                         / len(ws) BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS r2,
             CASE WHEN n_sym * 1.0 / len(ws) < 0.1 THEN 1 ELSE 0 END AS r3,
             CASE WHEN len(list_filter(lines,
                          l -> left(ltrim(l), 1) IN ('-', '*'))) * 1.0
                         / len(lines) <= 0.9 THEN 1 ELSE 0 END AS r4,
             CASE WHEN len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                         * 1.0 / len(ws) > 0.8 THEN 1 ELSE 0 END AS r5,
             CASE WHEN len(list_distinct(list_filter(ws,
                          w -> w IN {_STOPS_SQL}))) >= 2 THEN 1 ELSE 0 END AS r6
      FROM m
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(r1) * 1.0 / COUNT(*), 6) AS word_count_rate,
           ROUND(SUM(r2) * 1.0 / COUNT(*), 6) AS mean_word_len_rate,
           ROUND(SUM(r3) * 1.0 / COUNT(*), 6) AS symbol_ratio_rate,
           ROUND(SUM(r4) * 1.0 / COUNT(*), 6) AS bullet_line_rate,
           ROUND(SUM(r5) * 1.0 / COUNT(*), 6) AS alpha_word_rate,
           ROUND(SUM(r6) * 1.0 / COUNT(*), 6) AS stopword_rate,
           ROUND(SUM(r1 * r2 * r3 * r4 * r5 * r6) * 1.0 / COUNT(*), 6)
             AS pass_all_rate
    FROM r GROUP BY source ORDER BY source
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery (word-count bounds, mean word length 3-10,
    symbol-to-word ratio < 0.1, bullet-line fraction <= 0.9, >80% words
    alphabetic, >= 2 distinct stopwords) evaluated exactly per document
    and reported as per-source pass rates plus the all-rules rate — the
    canonical pre-training hygiene report. Every rule is an integer count
    or an int/int division, so pass flags are engine-exact.

    Scale shape: one map-only pass per document (no shuffle before the
    per-source aggregation); the HOF lambdas run on short per-doc arrays,
    not hot inner loops."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    lines = F.split(F.col("text"), "\n")
    n_sym = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), "#", ""))
        + (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), r"\.\.\.", ""))
        )
        / 3
    )
    n_tok = F.size(ws)
    avg_len = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    ) * 1.0 / n_tok
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*"),
            )
        )
        * 1.0
        / F.size(lines)
    )
    alpha_frac = (
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))) * 1.0 / n_tok
    )
    n_stops = F.size(
        F.array_distinct(F.filter(ws, lambda w: w.isin(T.EN_STOPWORDS)))
    )
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    r = docs.select(
        "source",
        flag(n_tok.between(50, 100000)).alias("r1"),
        flag(avg_len.between(3, 10)).alias("r2"),
        flag(n_sym * 1.0 / n_tok < 0.1).alias("r3"),
        flag(bullet_frac <= 0.9).alias("r4"),
        flag(alpha_frac > 0.8).alias("r5"),
        flag(n_stops >= 2).alias("r6"),
    )
    cnt = F.count(F.lit(1))
    rate = lambda c: F.round(F.sum(c) * 1.0 / cnt, 6)  # noqa: E731
    return (
        r.groupBy("source")
        .agg(
            cnt.cast("long").alias("n_docs"),
            rate(F.col("r1")).alias("word_count_rate"),
            rate(F.col("r2")).alias("mean_word_len_rate"),
            rate(F.col("r3")).alias("symbol_ratio_rate"),
            rate(F.col("r4")).alias("bullet_line_rate"),
            rate(F.col("r5")).alias("alpha_word_rate"),
            rate(F.col("r6")).alias("stopword_rate"),
            rate(
                F.col("r1")
                * F.col("r2")
                * F.col("r3")
                * F.col("r4")
                * F.col("r5")
                * F.col("r6")
            ).alias("pass_all_rate"),
        )
        .orderBy("source")
    )


_TEXTRANK_ITERS = 4
_TEXTRANK_VOCAB = 40


def _textrank_oracle(iters: int = _TEXTRANK_ITERS) -> str:
    sql = f"""
    -- TextRank (Mihalcea & Tarau 2004): PageRank over the word
    -- co-occurrence graph (adjacent whitespace tokens), vocabulary capped
    -- at the top-{_TEXTRANK_VOCAB} non-stopword alphabetic words so the
    -- unrolled iterations run on a bounded graph. The symmetric edge set
    -- means no dangling nodes, so the recurrence needs no dangling-mass
    -- term; contributions ROUND@12 into DECIMAL(38,12) sums exactly like
    -- pagerank_nation_trade. Per-iteration CTEs are MATERIALIZED (DuckDB
    -- inlines CTEs; >1 reference would re-evaluate exponentially).
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ),
    wc AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(ws) AS w FROM toks)
      WHERE regexp_matches(w, '^[a-z]+$') AND w NOT IN {_STOPS_SQL}
      GROUP BY w
    ),
    vocab AS MATERIALIZED (
      SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM wc
      ) WHERE rn <= {_TEXTRANK_VOCAB}
    ),
    pairs AS (
      SELECT unnest([{{'wa': ws[i], 'wb': ws[i+1]}}
                     for i in range(1, len(ws))], recursive := true)
      FROM toks WHERE len(ws) >= 2
    ),
    e AS MATERIALIZED (
      SELECT LEAST(wa, wb) AS u, GREATEST(wa, wb) AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM pairs
      WHERE wa <> wb
        AND wa IN (SELECT w FROM vocab) AND wb IN (SELECT w FROM vocab)
      GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT u AS src, v AS dst, w FROM e
      UNION ALL SELECT v, u, w FROM e
    ),
    ow AS MATERIALIZED (
      SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM sym GROUP BY src
    ),
    ew AS MATERIALIZED (
      SELECT sym.src, sym.dst, sym.w * 1.0 / ow.ow AS f
      FROM sym JOIN ow USING (src)
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
    nn AS MATERIALIZED (SELECT COUNT(*) * 1.0 AS n FROM nodes),
    pr0 AS MATERIALIZED (
      SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn
    )"""
    for i in range(1, iters + 1):
        sql += f""",
    pr{i} AS MATERIALIZED (
      SELECT nodes.node,
             0.15 / nn.n + 0.85 * COALESCE(s.m, 0.0) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT ew.dst AS node,
               CAST(SUM(CAST(ROUND(p.r * ew.f, 12) AS DECIMAL(38,12)))
                 AS DOUBLE) AS m
        FROM pr{i - 1} p JOIN ew ON p.node = ew.src
        GROUP BY ew.dst
      ) s ON s.node = nodes.node
    )"""
    sql += f"""
    SELECT p.node AS word, ROUND(p.r, 8) AS textrank,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(p.r, 8) DESC, p.node)
             AS BIGINT) AS rnk
    FROM pr{iters} p
    QUALIFY rnk <= 15
    ORDER BY rnk
    """
    return sql


@query("textrank_keywords", oracle=_textrank_oracle())
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: PageRank (d=0.85, 4 supersteps) over
    the adjacency graph of corpus tokens, vocabulary capped at the top-40
    non-stopword alphabetic words. The symmetric co-occurrence edge set has
    no dangling nodes, so the recurrence is the pure weighted-contribution
    form; contributions ROUND@12 into decimal sums — the same engine-exact
    iterative-float discipline as pagerank_nation_trade.

    Scale shape: the only corpus-wide work is the token bigram explode
    (arrays_zip of slices — no interpreted per-element lambda over long
    arrays) feeding two hash aggregations; the PageRank loop runs on the
    driver over the collected <=40-node / <=780-edge graph (CAP-bounded
    at any corpus scale — the dimension-bounded driver-peel discipline of
    the graph family) with bit-exact Catalyst float semantics via
    functions/exactfloat. Until r13 the 4 supersteps were Spark jobs
    with eager localCheckpoints (~2.4 s of driver+job overhead,
    OPTIMIZATION_r13.md); output unchanged under the hash gate."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.exactfloat import (
        dec_sum_double,
        round_half_up,
    )
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    toks = docs.select(ws.alias("ws")).persist()
    wc = (
        toks.select(F.explode("ws").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$") & ~F.col("w").isin(T.EN_STOPWORDS))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    vocab = (
        wc.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w")))
        )
        .filter(F.col("rn") <= _TEXTRANK_VOCAB)
        .select("w")
    )
    n_ws = F.size("ws")
    pairs = (
        toks.filter(n_ws >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, n_ws - 1).alias("wa"),
                    F.slice("ws", 2, n_ws - 1).alias("wb"),
                )
            ).alias("p")
        )
        .select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
        .filter(F.col("wa") != F.col("wb"))
    )
    va = F.broadcast(vocab.select(F.col("w").alias("wa")))
    vb = F.broadcast(vocab.select(F.col("w").alias("wb")))
    e = (
        pairs.join(va, "wa")
        .join(vb, "wb")
        .select(
            F.least("wa", "wb").alias("u"), F.greatest("wa", "wb").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    # ONE distributed action: the CAP-bounded undirected edge list.
    e_rows = [(r["u"], r["v"], r["w"]) for r in e.collect()]
    sym = e_rows + [(v, u, w) for u, v, w in e_rows]
    ow: dict[str, int] = {}
    for s, _, w in sym:
        ow[s] = ow.get(s, 0) + w
    # (w * 1.0 / ow) exactly as Catalyst evaluates it: long -> double
    # promotion then one IEEE division.
    ew = [(s, d, float(w) * 1.0 / float(ow[s])) for s, d, w in sym]
    nodes = sorted(ow)
    n = float(len(nodes))
    r = {v: 1.0 / n for v in nodes}
    for _ in range(_TEXTRANK_ITERS):
        terms: dict[str, list[float]] = {}
        for s, d, f in ew:
            terms.setdefault(d, []).append(round_half_up(r[s] * f, 12))
        m = {d: dec_sum_double(ts, 12) for d, ts in terms.items()}
        r = {v: 0.15 / n + 0.85 * m.get(v, 0.0) for v in nodes}
    ranked = sorted(
        ((v, round_half_up(r[v], 8)) for v in nodes), key=lambda t: (-t[1], t[0])
    )[:15]
    rows = [(wd, tr, i + 1) for i, (wd, tr) in enumerate(ranked)]
    return spark.createDataFrame(
        rows, "word string, textrank double, rnk long"
    ).orderBy("rnk")


GT_ORACLE = """
    -- Good-Turing unseen-vocabulary mass + Chao1 richness per source: from
    -- the frequency-of-frequencies (N1 = hapaxes, N2 = dis legomena) the
    -- Turing estimator puts P(next token is a NEW word) = N1/N and the
    -- bias-corrected Chao1 puts total richness at V + N1(N1-1)/(2(N2+1)).
    -- All inputs are exact integers; each output is one exact-int ratio.
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS term
      FROM documents
    ),
    wc AS (SELECT source, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    a AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS v_observed,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM wc GROUP BY source
    )
    SELECT source, n_tokens, v_observed, n1, n2,
           ROUND(n1 * 1.0 / n_tokens, 6) AS p_unseen_gt,
           ROUND(1.0 - n1 * 1.0 / n_tokens, 6) AS coverage_gt,
           ROUND(v_observed + n1 * (n1 - 1.0) / (2.0 * (n2 + 1)), 4)
             AS chao1_richness
    FROM a ORDER BY source
    """


def gt_estimates(partials: DataFrame) -> DataFrame:
    """Fold per-source Good-Turing partials (n_tokens, v_observed, n1, n2 —
    additive as long as every (source, term) pair is counted by exactly one
    contributor) into the estimator row the batch and streaming twins share."""
    a = partials.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("v_observed").cast("long").alias("v_observed"),
        F.sum("n1").cast("long").alias("n1"),
        F.sum("n2").cast("long").alias("n2"),
    )
    return a.select(
        "source",
        "n_tokens",
        "v_observed",
        "n1",
        "n2",
        F.round(F.col("n1") * F.lit(1.0) / F.col("n_tokens"), 6).alias("p_unseen_gt"),
        F.round(F.lit(1.0) - F.col("n1") * F.lit(1.0) / F.col("n_tokens"), 6).alias(
            "coverage_gt"
        ),
        F.round(
            F.col("v_observed")
            + F.col("n1") * (F.col("n1") - F.lit(1.0)) / (F.lit(2.0) * (F.col("n2") + 1)),
            4,
        ).alias("chao1_richness"),
    ).orderBy("source")


@query("good_turing_vocab_coverage", oracle=GT_ORACLE)
def good_turing_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass and Chao1 vocabulary-richness estimates per
    source — the "how much vocabulary have we NOT crawled yet" companion to
    the Heaps'-law growth fit: P0 = N1/N (probability the next token is a
    never-seen word) and Chao1 = V + N1(N1-1)/(2(N2+1)) (asymptotic distinct
    vocabulary), both closed forms over the frequency-of-frequencies.

    Scale shape: one wordcount pass (the canonical map-side-combine shuffle
    on (source, term)), then a per-source fold of exact integer counters —
    no vocabulary leaves the cluster, no second scan. Every estimator input
    (N, V, N1, N2) is an exact int64, so the outputs are identical doubles
    cross-engine."""
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select("source", F.explode(T.word_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    partials = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_observed"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    return gt_estimates(partials)


@query(
    "pmi_top_collocations",
    oracle="""
    -- top-25 PMI collocations: pointwise mutual information of adjacent
    -- word pairs, log2(p(xy) / (p(x)p(y))) decomposed into six integer-
    -- argument log terms, each ROUND@1e-8 then combined in DECIMAL so both
    -- engines add the same quantized values. Min bigram count 10 filters
    -- the unstable low-count tail (classic Church-Hanks practice).
    WITH lsts AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS lst
      FROM documents
    ),
    toks AS (SELECT unnest(lst) AS term FROM lsts),
    uni AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY term),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
    bg AS (
      SELECT unnest([struct_pack(w1 := lst[i], w2 := lst[i + 1])
                     for i in range(1, len(lst))]) AS p
      FROM lsts WHERE len(lst) >= 2
    ),
    bgc AS (
      SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c_xy
      FROM bg GROUP BY 1, 2
    ),
    b AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_bg FROM bgc),
    pmi AS (
      SELECT g.w1, g.w2, g.c_xy,
             ROUND(CAST(
               CAST(ROUND(log2(g.c_xy), 8) AS DECIMAL(28,8))
               - CAST(ROUND(log2(b.n_bg), 8) AS DECIMAL(28,8))
               - CAST(ROUND(log2(u1.c), 8) AS DECIMAL(28,8))
               - CAST(ROUND(log2(u2.c), 8) AS DECIMAL(28,8))
               + 2 * CAST(ROUND(log2(n.n_tok), 8) AS DECIMAL(28,8))
             AS DOUBLE), 6) AS pmi_bits
      FROM bgc g
      JOIN uni u1 ON u1.term = g.w1
      JOIN uni u2 ON u2.term = g.w2
      CROSS JOIN n CROSS JOIN b
      WHERE g.c_xy >= 10
    )
    SELECT w1, w2, c_xy, pmi_bits
    FROM pmi
    ORDER BY pmi_bits DESC, w1, w2
    LIMIT 25
    """,
)
def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 PMI collocations (Church-Hanks pointwise mutual information
    over adjacent word pairs) — the phrase-discovery primitive under
    tokenizer-merge seeding and boilerplate detection: pairs that co-occur
    far above their unigram rates are names, idioms, or template fragments.

    Scale shape: bigram stream via arrays_zip of shifted slices (no
    interpreted element_at lambdas), two wordcount passes (unigram, bigram)
    that partial-aggregate map-side, broadcast unigram joins onto the
    bigram table, TakeOrderedAndProject for the top-k. PMI is decomposed
    into integer-argument logs, each quantized @1e-8 and combined in
    DECIMAL, so the ranking key is bit-identical cross-engine; ties break
    on (w1, w2)."""
    docs = load(spark, sf_dir, "documents")
    lsts = docs.select("doc_id", T.word_tokens(F.col("text")).alias("lst"))
    uni = (
        lsts.select(F.explode("lst").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    nrow = uni.agg(F.sum("c").cast("long").alias("n_tok")).collect()[0]
    n_tok = int(nrow["n_tok"])  # bounded: one scalar

    sz = F.size("lst")
    bg = (
        lsts.filter(sz >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("lst", 1, sz - 1).alias("w1"),
                    F.slice(F.col("lst"), 2, sz - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    n_bg = bgc.agg(F.sum("c_xy").cast("long").alias("n_bg")).collect()[0]["n_bg"]
    n_bg = int(n_bg)  # bounded: one scalar

    def dec8(col):
        return F.round(col, 8).cast("decimal(28,8)")

    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        bgc.filter(F.col("c_xy") >= 10)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                (
                    dec8(F.log2("c_xy"))
                    - dec8(F.log2(F.lit(float(n_bg))))
                    - dec8(F.log2("c1"))
                    - dec8(F.log2("c2"))
                    + F.lit(2) * dec8(F.log2(F.lit(float(n_tok))))
                ).cast("double"),
                6,
            ).alias("pmi_bits"),
        )
    )
    return pmi.orderBy(F.desc("pmi_bits"), "w1", "w2").limit(25)


_FUZZY_PATTERNS = ["custmer", "filtre", "orden", "vectr", "windw"]
_FUZZY_PAT_SQL = "('" + "','".join(_FUZZY_PATTERNS) + "')"


@query(
    "trigram_fuzzy_vocab_search",
    oracle=f"""
    -- pg_trgm-style fuzzy search: for each misspelled pattern, find the
    -- vocabulary terms within edit distance 2 WITHOUT scanning the
    -- vocabulary — an inverted character-trigram index supplies the
    -- candidates (terms sharing >= 1 trigram with the pattern; recall is
    -- index-bounded, exactly as in pg_trgm — a match destroying every
    -- common trigram is invisible by design), exact levenshtein verifies.
    WITH vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      w -> w <> '')) AS term
            FROM documents)
      GROUP BY term
    ),
    tg AS (
      SELECT DISTINCT term, unnest([substr(term, i, 3)
                                    for i in range(1, len(term) - 1)]) AS g
      FROM vocab WHERE len(term) >= 3
    ),
    pats AS (SELECT unnest({_FUZZY_PATTERNS!r}) AS pattern),
    pat AS (
      SELECT DISTINCT pattern, unnest([substr(pattern, i, 3)
                                       for i in range(1, len(pattern) - 1)]) AS g
      FROM pats
    ),
    cand AS (
      SELECT DISTINCT p.pattern, t.term FROM tg t JOIN pat p ON p.g = t.g)
    SELECT c.pattern AS pattern, c.term AS term, v.freq,
           CAST(levenshtein(c.term, c.pattern) AS BIGINT) AS edit_dist
    FROM cand c JOIN vocab v ON v.term = c.term
    WHERE levenshtein(c.term, c.pattern) <= 2
    ORDER BY c.pattern, edit_dist, c.term
    """,
)
def trigram_fuzzy_vocab_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-indexed fuzzy search (the pg_trgm / code-search primitive):
    find vocabulary terms within edit distance 2 of a misspelled pattern
    by equi-joining an inverted character-trigram index for candidates,
    then verifying with exact levenshtein — the index join touches only
    trigram-sharing terms, never the full vocabulary.

    Scale shape: the trigram index is a wordcount-shaped build over the
    DISTINCT vocabulary (Heaps-sublinear in corpus size); a query is one
    broadcast of ~|pattern| trigrams + an index equi-join + verification
    on candidates only — the same prefilter-then-verify discipline as the
    Bloom contamination gate. Everything exact integers/strings."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(T.word_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist()
    )
    tg = (
        vocab.filter(F.length("term") >= 3)
        .select(
            "term",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(term) - 2), i -> substring(term, i, 3))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    pat_rows = sorted(
        {
            (p, p[i : i + 3])
            for p in _FUZZY_PATTERNS
            for i in range(len(p) - 2)
        }
    )
    pat = docs.sparkSession.createDataFrame(pat_rows, "pattern string, g string")
    cand = tg.join(F.broadcast(pat), "g").select("pattern", "term").distinct()
    return (
        cand.join(vocab, "term")
        .withColumn(
            "edit_dist", F.levenshtein("term", F.col("pattern")).cast("long")
        )
        .filter(F.col("edit_dist") <= 2)
        .select("pattern", "term", "freq", "edit_dist")
        .orderBy("pattern", "edit_dist", "term")
    )


@query(
    "multimodal_tiff_decode",
    oracle="""
    -- closed-form twin of the real TIFF decode: solid-color images, so
    -- the per-channel means equal the generator's channel values; byte
    -- order alternates with id parity (the decoder must honor the
    -- II/MM byte-order mark, not assume one)
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(5 + (doc_id % 9) AS BIGINT) AS width,
           CAST(2 + (doc_id % 6) AS BIGINT) AS height,
           CAST((doc_id * 5) % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 17) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 23) % 256 AS DOUBLE) AS mean_b
    FROM documents
    """,
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec TIFF path (D5's tag-directory format, completing the
    image matrix beside BMP/PNG/JPEG/GIF): byte-order mark (II and MM both
    synthesized and both decoded), magic 42, IFD tag walk with
    SHORT-in-value-field semantics, uncompressed RGB strip lift — the
    whole format IS its tag directory, which is exactly what a real
    ingest pipeline must parse to route scanned-document corpora. Solid
    colors keep the oracle closed-form while the decoder sees only
    bytes."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.multimodal import (
        attach_tiff_payload,
        decode_tiff_features,
    )

    docs = load(spark, sf_dir, "documents")
    media = attach_tiff_payload(docs, "doc_id")
    return decode_tiff_features(media)


@query(
    "dunning_llr_collocations",
    oracle="""
    -- Dunning log-likelihood-ratio collocations (Dunning 1993) — the
    -- rare-event-honest companion to PMI: G2 = 2 * sum O ln(O/E) over the
    -- 2x2 bigram contingency (O11 = c(xy), margins = bigram-position
    -- counts, E from independence). Zero cells contribute 0. Every O and
    -- E is an exact int or exact-int ratio; each term ROUND@1e-8 ->
    -- DECIMAL sum -> one double at the end. Top-25, ties on (w1, w2).
    WITH lsts AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS lst
      FROM documents
    ),
    bg AS (
      SELECT unnest([struct_pack(w1 := lst[i], w2 := lst[i + 1])
                     for i in range(1, len(lst))]) AS p
      FROM lsts WHERE len(lst) >= 2
    ),
    bgc AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS o11
      FROM bg GROUP BY 1, 2
    ),
    m1 AS (SELECT w1, CAST(SUM(o11) AS BIGINT) AS c1 FROM bgc GROUP BY w1),
    m2 AS (SELECT w2, CAST(SUM(o11) AS BIGINT) AS c2 FROM bgc GROUP BY w2),
    tot AS (SELECT CAST(SUM(o11) AS BIGINT) AS b FROM bgc),
    cells AS (
      SELECT g.w1, g.w2, g.o11,
             m1.c1 - g.o11 AS o12,
             m2.c2 - g.o11 AS o21,
             t.b - m1.c1 - m2.c2 + g.o11 AS o22,
             m1.c1, m2.c2, t.b
      FROM bgc g JOIN m1 ON m1.w1 = g.w1 JOIN m2 ON m2.w2 = g.w2
      CROSS JOIN tot t
      WHERE g.o11 >= 10
    ),
    llr AS (
      SELECT w1, w2, o11,
             ROUND(CAST(
               CAST(ROUND(CASE WHEN o11 > 0 THEN 2.0 * o11 *
                 ln(o11 * 1.0 * b / (c1 * 1.0 * c2)) ELSE 0 END, 8)
                 AS DECIMAL(28,8))
               + CAST(ROUND(CASE WHEN o12 > 0 THEN 2.0 * o12 *
                 ln(o12 * 1.0 * b / (c1 * 1.0 * (b - c2))) ELSE 0 END, 8)
                 AS DECIMAL(28,8))
               + CAST(ROUND(CASE WHEN o21 > 0 THEN 2.0 * o21 *
                 ln(o21 * 1.0 * b / ((b - c1) * 1.0 * c2)) ELSE 0 END, 8)
                 AS DECIMAL(28,8))
               + CAST(ROUND(CASE WHEN o22 > 0 THEN 2.0 * o22 *
                 ln(o22 * 1.0 * b / ((b - c1) * 1.0 * (b - c2))) ELSE 0 END, 8)
                 AS DECIMAL(28,8))
             AS DOUBLE), 6) AS llr_g2
      FROM cells
    )
    SELECT w1, w2, o11 AS bigram_count, llr_g2
    FROM llr
    ORDER BY llr_g2 DESC, w1, w2
    LIMIT 25
    """,
)
def dunning_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations (Dunning 1993) — the
    standard fix for PMI's rare-event bias (PMI rewards low-frequency
    flukes; G2 weights evidence by volume): 2 * sum O ln(O/E) over the
    2x2 contingency of each adjacent pair vs its bigram-position margins.
    Same wordcount-shaped passes and broadcast margin joins as the PMI
    query; the two rankings side by side are the classic collocation
    lecture in query form.

    Determinism: each of the four G2 terms is an exact integer times ln of
    an exact-int ratio, quantized @1e-8 and summed in DECIMAL; zero cells
    contribute exactly 0 (CASE, not ln(0) guards)."""
    docs = load(spark, sf_dir, "documents")
    lsts = docs.select("doc_id", T.word_tokens(F.col("text")).alias("lst"))
    sz = F.size("lst")
    bg = (
        lsts.filter(sz >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("lst", 1, sz - 1).alias("w1"),
                    F.slice(F.col("lst"), 2, sz - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("o11")).persist()
    m1 = bgc.groupBy("w1").agg(F.sum("o11").cast("long").alias("c1"))
    m2 = bgc.groupBy("w2").agg(F.sum("o11").cast("long").alias("c2"))
    b_tot = int(bgc.agg(F.sum("o11")).collect()[0][0])  # bounded: one scalar

    cells = (
        bgc.filter(F.col("o11") >= 10)
        .join(F.broadcast(m1), "w1")
        .join(F.broadcast(m2), "w2")
        .withColumn("b", F.lit(b_tot))
        .withColumn("o12", F.col("c1") - F.col("o11"))
        .withColumn("o21", F.col("c2") - F.col("o11"))
        .withColumn("o22", F.col("b") - F.col("c1") - F.col("c2") + F.col("o11"))
    )

    def term(o, num_margin, den_margin):
        return F.when(
            o > 0,
            F.round(
                2.0 * o * F.log(o * F.lit(1.0) * F.col("b") / (num_margin * F.lit(1.0) * den_margin)),
                8,
            ),
        ).otherwise(F.lit(0.0)).cast("decimal(28,8)")

    llr = (
        term(F.col("o11"), F.col("c1"), F.col("c2"))
        + term(F.col("o12"), F.col("c1"), F.col("b") - F.col("c2"))
        + term(F.col("o21"), F.col("b") - F.col("c1"), F.col("c2"))
        + term(F.col("o22"), F.col("b") - F.col("c1"), F.col("b") - F.col("c2"))
    ).cast("double")
    out = cells.select(
        "w1",
        "w2",
        F.col("o11").alias("bigram_count"),
        F.round(llr, 6).alias("llr_g2"),
    )
    return out.orderBy(F.desc("llr_g2"), "w1", "w2").limit(25)
