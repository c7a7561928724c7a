"""Deduplication operators for large-scale training-data pipelines.

Four tiers, all shuffle-based (no driver-side materialization, no cross
product of documents):

- **exact**: content hash + dropDuplicates / min-id-per-group.
- **n-gram Jaccard (exact near-dup)**: shingle -> inverted-index self-join
  on shingle -> per-pair intersection counts -> Jaccard. The join is an
  equi-join on the shingle value, so work scales with the number of
  *shared* shingles, not |docs|^2. Hot shingles (stopword runs) can skew;
  at 100 TB add a document-frequency cap on shingles (drop shingles
  appearing in > X% of docs) — standard practice and exposed as
  ``max_shingle_df``.
- **MinHash + LSH banding**: k xxhash64-based min-hashes (JVM-side
  hashing), banded into b buckets; candidate pairs share >= 1 band bucket;
  candidates verified with exact Jaccard. O(docs x k) + equi-join on
  (band, bucket-hash) — the 100 TB path for near-dedup (Broder 1997).
- **SimHash**: 64-bit sign-fingerprint of the token multiset; near-dups
  have small Hamming distance. One groupBy per doc; Hamming verification
  over band-bucketed candidates.

All hashing is deterministic (xxhash64 with per-permutation salt columns),
so outputs are stable across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def tokens_col(text: Column) -> Column:
    """Lowercased whitespace tokens (empty strings removed)."""
    return F.filter(F.split(F.lower(text), " "), lambda w: w != "")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (JVM-side array ops).

    Implementation note: built with arrays_zip of n shifted slices rather
    than transform+element_at — per-index element_at lambdas make Catalyst
    re-evaluate the tokenization expression for every array element
    (observed ~100x slowdown at sf0.1); the zip form evaluates it O(n)
    times per row.
    """
    return F.array_distinct(shingle_occurrences_col(text, n))


def shingle_occurrences_col(text: Column, n: int = 3) -> Column:
    """Every n-word shingle occurrence in order (duplicates preserved).

    Same zip-of-shifted-slices construction as ``shingles_col`` minus the
    distinct — position i of the result is the shingle starting at token i.
    """
    ws = tokens_col(text)
    if n == 1:
        return ws
    shifted = [ws] + [F.slice(ws, j + 1, F.greatest(F.size(ws) - j, F.lit(0))) for j in range(1, n)]
    zipped = F.arrays_zip(*[s.alias(f"w{j}") for j, s in enumerate(shifted)])
    # zip length = len(ws); the last n-1 entries have null components — keep
    # only the size-n+1 full shingles.
    full = F.slice(zipped, 1, F.greatest(F.size(ws) - (n - 1), F.lit(0)))
    return F.transform(full, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)]))


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact dedup on a column subset (hash-shuffle dropDuplicates)."""
    return df.dropDuplicates(cols)


# Default document-frequency cap for inverted-index shingle joins: shingles
# in more documents than this are dropped from candidate generation (they are
# boilerplate, carry ~no Jaccard signal, and cost O(df^2) join pairs each).
# Far above anything the fixtures produce (max df 25 at sf0.1), so capped and
# uncapped results coincide there; at corpus scale this is the knob that keeps
# the join linear in shared-shingle pairs.
DEFAULT_MAX_SHINGLE_DF = 1024


def doc_shingle_sets(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingle sets.

    The input is repartitioned first: shingling is CPU-heavy per row, and a
    small source (one parquet file -> one partition) would otherwise run
    single-threaded regardless of cluster size. At real scale the source
    has many splits and the repartition collapses into a cheap rebalance.
    """
    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    return docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text")).repartition(
        n_parts
    ).select("doc", F.explode(shingles_col(F.col("_text"), n)).alias("sh"))


def doc_shingle_tf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    snapshot: bool = False,
) -> DataFrame:
    """(doc, s, tf) term-frequency table over n-gram occurrences with the
    hot-shingle document-frequency cap — the multiset analogue of the
    capped sets ``ngram_jaccard_pairs`` joins on. A boilerplate shingle
    present in D documents contributes O(D^2) pairs to any tf-intersection
    self-join, so shingles with df > ``max_shingle_df`` are dropped from
    the tf universe (weights AND totals — the capped universe stays
    self-consistent, like the set version). The hot list is tiny by
    construction and broadcast, so the cap adds no shuffle. The default
    cap is far above fixture document frequencies, so capped and uncapped
    results coincide on the fixtures; pass ``None`` for exact uncapped
    semantics.

    ``snapshot=True`` returns a per-invocation tmp-parquet stage snapshot
    (guide §3.3, the r13 minhash recipe) — for callers that reference the
    FULL tf table several times (totals + both intersection-join sides),
    where the doc-keyed broadcast builds are separate concurrent jobs that
    re-evaluate the explode+agg above a mere persist (r14 profile of
    dedup_weighted_jaccard_pairs: 11.4 s summed job wall for ~4 s wall
    before, 3.0 s after — 3.8x less cluster work, wall flat at fixture
    scale). Default False: callers that FILTER the tf table before
    materializing (the icws audit joins it to ~|pairs| docs and
    localCheckpoints) would pay a full-table write for a subset read —
    measured as a strict pessimization in r14's interleaved A/B.
    Snapshots are written fresh per call, released by
    session.release_tmp_snapshots."""
    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    sh = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
        .repartition(n_parts)
        .select("doc", F.explode(shingle_occurrences_col(F.col("_text"), n)).alias("s"))
    )
    tf = sh.groupBy("doc", "s").agg(F.count(F.lit(1)).alias("tf"))
    if max_shingle_df is not None:
        if snapshot:
            tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        hot = (
            tf.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("s")
        )
        capped = tf.join(F.broadcast(hot), "s", "left_anti")
    else:
        capped = tf
    if not snapshot:
        return capped
    import os

    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        tmp_snapshot_dir,
    )

    snap = os.path.join(tmp_snapshot_dir("bfcms_tf_"), "tf.parquet")
    capped.write.parquet(snap)
    if capped is not tf:
        tf.unpersist()
    return spark.read.parquet(snap)


def duplicate_ngram_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document exact-duplicate-n-gram coverage (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — the ExactSubstr signal, at n-gram granularity).

    An n-gram occurrence is *duplicated* when the same n-gram appears in at
    least 2 distinct documents. Output per document: total n-gram count,
    duplicated-occurrence count, and the duplicated fraction — the signal a
    curation pipeline thresholds to drop or trim boilerplate-heavy docs.

    Scale shape: one explode of all n-gram occurrences; the corpus-level
    duplicate decision is a hash-agg on the n-gram (map-side combined); the
    occurrence-vs-duplicate decision is a shuffle equi-join on the n-gram
    value — everything is linear in corpus token count, no pair join at
    all (unlike Jaccard, which needs doc pairs). The occurrence table is
    persisted because it feeds both the agg and the join branch.
    """
    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    occ = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
        .repartition(n_parts)
        .select("doc", F.explode(shingle_occurrences_col(F.col("_text"), n)).alias("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = (
        occ.groupBy("sh")
        .agg(F.count_distinct("doc").alias("_docs"))
        .filter(F.col("_docs") >= 2)
        .select("sh")
    )
    per_doc_dups = (
        occ.join(dup, "sh").groupBy("doc").agg(F.count(F.lit(1)).alias("dup_ngrams"))
    )
    totals = docs.select(
        F.col(id_col).alias("doc"),
        F.greatest(
            F.size(tokens_col(F.col(text_col))) - (n - 1), F.lit(0)
        ).cast("long").alias("n_ngrams"),
    )
    return (
        totals.join(per_doc_dups, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_ngrams",
            F.coalesce(F.col("dup_ngrams"), F.lit(0)).cast("long").alias("dup_ngrams"),
            F.when(
                F.col("n_ngrams") > 0,
                F.round(
                    F.coalesce(F.col("dup_ngrams"), F.lit(0)) / F.col("n_ngrams"), 6
                ),
            ).alias("dup_frac"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    persisted_out: list | None = None,
    snapshot: bool = False,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (doc_a < doc_b).

    Inverted-index self-join: |pairs sharing a shingle| work, not |docs|^2.

    The hot-shingle cap is ON by default (``DEFAULT_MAX_SHINGLE_DF``): a
    boilerplate shingle appearing in D documents contributes O(D^2) join
    pairs, which is the operator's only super-linear term at 100 TB. Pass
    ``max_shingle_df=None`` for the exact uncapped semantics.

    With ``snapshot=True`` the returned DataFrame is lazy over a
    per-invocation tmp-parquet stage snapshot of the capped shingle sets
    (released by the harnesses via session.release_tmp_snapshots): the
    capped sets feed THREE plan branches (sizes, both join sides), and the
    doc-keyed sizes join is an AQE broadcast build at fixture scale — a
    separate concurrent job that re-evaluates everything above a mere
    persist() (r13 minhash finding; this query measured 14.1 s summed job
    wall for 7.2 s of wall in the r13 sweep). One evaluation of
    explode+cap, every consumer a cheap parquet scan with real file
    statistics; written fresh per call — nothing keyed on the input path,
    nothing reused across runs. Callers that fully materialize the pair
    table (the headline query, the recursive-components edge build, the
    release cascade) pass True; the default stays lazy because
    count-shaped consumers (the sorted-neighborhood recall audit counts
    pairs instead of reading them) measured a strict ~3x regression paying
    the full-table write (r14 interleaved A/B: 1.3-2.2 s -> 4.4-6.3 s).

    ``persisted_out`` is kept for callers that unpersist the transient
    shingle cache early (under ``snapshot=True`` its entry is already
    unpersisted on return).
    """
    sets = doc_shingle_sets(docs, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    if persisted_out is not None:
        persisted_out.append(sets)
    if max_shingle_df is not None:
        # The hot list is tiny by construction (only shingles with df >
        # cap), so broadcast it: the anti-join then adds NO shuffle on top
        # of the groupBy (whose exchange Catalyst reuses for the main join).
        hot = (
            sets.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        capped = sets.join(F.broadcast(hot), "sh", "left_anti")
    else:
        capped = sets
    if snapshot:
        import os

        from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
            tmp_snapshot_dir,
        )

        snap = os.path.join(tmp_snapshot_dir("bfcms_ngram_sets_"), "sets.parquet")
        capped.write.parquet(snap)
        sets.unpersist()
        sets = docs.sparkSession.read.parquet(snap)
    else:
        sets = capped
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    # Carry each doc's set size on the join sides so the SIZE GATE can run
    # BEFORE the pair aggregation: J >= t forces min(na, nb) >= t * max
    # (c <= min and c >= t(na+nb)/(1+t)), so size-incompatible candidates
    # never reach the (doc_a, doc_b) shuffle — at sf0.1 that's 63% of the
    # 1.27M inverted-index candidate rows, and the pruned fraction grows
    # with corpus skew. The `> t*max - 1` float form can never false-drop
    # (counts are integers; t*max's rounding error is << 1). The doc-keyed
    # sizes join is left unhinted: AQE broadcasts it at fixture scale,
    # sort-merges at corpus scale.
    sets_n = sets.join(sizes, "doc")
    a = sets_n.select(F.col("doc").alias("doc_a"), "sh", F.col("n_sh").alias("na"))
    b = sets_n.select(F.col("doc").alias("doc_b"), "sh", F.col("n_sh").alias("nb"))
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("na", "nb").cast("double")
            > F.lit(float(threshold)) * F.greatest("na", "nb").cast("double")
            - F.lit(1.0)
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(doc, sig: array<bigint>) MinHash signatures.

    Permutation i is simulated by xxhash64(shingle, i) — deterministic,
    JVM-side, vectorized in whole-stage codegen. min() per permutation is
    a map-side-combinable aggregate.
    """
    sets = doc_shingle_sets(docs, id_col, text_col, n)
    mins = sets.groupBy("doc").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    b=16 bands x r=4 rows -> s-curve threshold (1/b)^(1/r) ~ 0.5, so
    candidates comfortably cover jaccard >= 0.8; exact verification then
    removes false positives, making the output deterministic (equal to
    ngram_jaccard_pairs restricted to LSH candidates).

    ``max_shingle_df`` drops boilerplate shingles from BOTH the signatures
    and the verification sets (consistently, so verified Jaccard stays
    well-defined); on by default as the 100 TB guard, None = uncapped.
    """
    rows_per_band = num_hashes // bands
    # The capped shingle-set table feeds SIX plan subtrees (signatures,
    # sizes x2, both verification sides, the hot-list build), and most of
    # them are broadcast-exchange builds that Spark launches as separate
    # concurrent jobs — a persisted DataFrame bounds only the UNCAPPED
    # explode; everything above the cache re-evaluated per build (r13
    # profile: 20-36 s summed job wall for a 6-8 s query; an eager
    # count() to pre-fill the cache did not help for exactly this
    # reason). Snapshot the capped table to a per-invocation tmp parquet
    # instead (the r9 stage-snapshot pattern): ONE evaluation of the
    # explode + cap, after which every subtree is a cheap scan with real
    # file statistics. The snapshot is written fresh on every call —
    # nothing is keyed on the input path or reused across runs — and is
    # registered with session.release_tmp_snapshots for deferred cleanup
    # (r14: the r13 per-invocation dirs leaked, ADVICE #2).
    import os

    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        tmp_snapshot_dir,
    )

    spark = docs.sparkSession
    sets_shared = doc_shingle_sets(docs, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    if max_shingle_df is not None:
        hot = (
            sets_shared.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        capped = sets_shared.join(F.broadcast(hot), "sh", "left_anti")
    else:
        capped = sets_shared
    snap = os.path.join(tmp_snapshot_dir("bfcms_lsh_sets_"), "sets.parquet")
    capped.write.parquet(snap)
    sets_shared.unpersist()
    sets_shared = spark.read.parquet(snap)
    mins = sets_shared.groupBy("doc").agg(
        *[F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )
    sigs = mins.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    band_rows = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = band_rows.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = band_rows.select(F.col("doc").alias("doc_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Exact verification of candidates only (the cheap post-filter).
    sets = sets_shared
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    pa = sets.select(F.col("doc").alias("doc_a"), "sh")
    pb = sets.select(F.col("doc").alias("doc_b"), "sh")
    common = (
        pa.join(candidates, "doc_a")
        .join(pb, ["sh", "doc_b"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash fingerprint per document (Charikar 2002).

    Per token: xxhash64 -> 64 sign contributions; per doc: sum each bit's
    +/-1 contributions and take the sign. Implemented as 64 conditional-sum
    aggregate columns — wide but fully JVM/codegen, one shuffle by doc.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens_col(F.col(text_col))).alias("w")
    )
    h = F.xxhash64("w")
    bit_sums = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    # Reassemble: sum of 2^i for positive bit-sums, as one signed 64-bit value.
    acc = F.lit(0).cast("long")
    for i in range(64):
        acc = acc + F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bit_sums.select("doc", acc.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count(XOR))."""
    return F.bit_count(a.bitwiseXOR(b))


def components_min_label(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup candidate pairs -> (node, component).

    ``component`` is the minimum node id reachable from ``node`` through the
    undirected edge set ``pairs(doc_a, doc_b)`` — i.e. the canonical cluster
    representative for dedup "keep one per cluster" decisions. Nodes absent
    from every pair are their own singleton component.

    Algorithm: min-label propagation. Per iteration, every node takes the min
    of its own label and its neighbors' labels — one equi-join on the edge
    list plus one map-side-combinable min aggregate (two shuffles), repeated
    until a fixpoint. Labels decrease monotonically elementwise, so the
    global label sum is a convergence witness: one scalar action per
    iteration, no row-level comparison join.

    Scale notes (100 TB): work per iteration is O(|edges|) shuffled on node
    id; iterations = component diameter. LSH dup clusters are near-cliques
    (diameter ~2), so 3-4 iterations in practice; ``max_iter`` bounds
    adversarial chains (the large-star/small-star variant of Kiveris et al.
    2014 trades per-iteration cost for O(log n) worst-case rounds if such
    graphs are expected). Labels are localCheckpoint'ed per iteration —
    truncated lineage, so both execution AND Catalyst analysis stay
    constant-depth per round (persist alone only bounds execution).
    """
    base = pairs.select(
        F.col("doc_a").cast("long").alias("u"), F.col("doc_b").cast("long").alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    base.count()  # materialize: the upstream pair pipeline (e.g. LSH) runs
    # once, not once per direction of the mirrored edge list below.
    # (Materializing via localCheckpoint instead was tried in r13 and
    # REGRESSED 2-4x: the eager RDD checkpoint executes the pair pipeline
    # outside the SQL action path, where the LSH tree's AQE-planned
    # broadcasts don't kick in — see OPTIMIZATION_r13.md.)
    edges = base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # The label vector, by contrast, is a leaf-sized tree: checkpointing
    # each generation truncates the lineage that otherwise grows one
    # union+join+agg layer per iteration ON TOP of the full pair-pipeline
    # plan, which Catalyst re-analyzed per iteration action (persist only
    # bounds execution, not analysis — the r9 lesson).
    labels = (
        nodes.select(F.col(id_col).cast("long").alias("u"))
        .distinct()
        .withColumn("label", F.col("u"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        msgs = edges.join(labels, "u").select(F.col("v").alias("u"), "label")
        new_labels = (
            labels.select("u", "label")
            .union(msgs)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # Monotone-decreasing labels => unchanged sum <=> fixpoint. DECIMAL
        # accumulator so the witness can't overflow at any id range.
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        # superseded label generations are checkpoint RDDs (|nodes| rows
        # each); both sweep harnesses release all persisted RDDs after the
        # query is consumed (session.checkpoint_scope documents the rule)
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("component"))


def contamination_gate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Benchmark-contamination check: per corpus document, how many of its
    n-gram shingles appear anywhere in the benchmark set.

    The 100 TB shape: the benchmark shingle set is small (benchmarks are
    kilo-to-megadocument); it compresses to a kilobyte-to-megabyte Bloom
    filter built in one distributed aggregate. Corpus shingles stream
    through the broadcast filter so only probable hits (<= fpp of clean
    shingles) reach the exact verification semi-join — the full corpus
    never shuffles on shingle. The Bloom gate is a superset filter (no
    false negatives) and the semi-join is exact, so the result equals the
    plain shingle-join's: approximate structure, exact answer.

    Returns (doc_id, n_shingles, n_contaminated) for contaminated docs.
    """
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    bench_sh = (
        doc_shingle_sets(benchmark, id_col, text_col, n)
        .select("sh")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if expected_items is None:
        expected_items = bench_sh.count()
    bloom_bytes = bloom_build(bench_sh, "sh", max(int(expected_items), 1), fpp)

    corp_sh = doc_shingle_sets(corpus, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = corp_sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    gated = (
        bloom_might_contain(corp_sh, "sh", bloom_bytes, out="__hit")
        .filter(F.col("__hit"))
        .drop("__hit")
    )
    verified = gated.join(bench_sh, "sh", "left_semi")
    hits = verified.groupBy("doc").agg(F.count(F.lit(1)).alias("n_contaminated"))
    return (
        hits.join(sizes, "doc")
        .select(F.col("doc").alias(id_col), "n_shingles", "n_contaminated")
    )


def minhash_band_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(doc, band, bucket) LSH band rows — the at-rest near-dup INDEX
    payload: ``bands`` longs per document regardless of document size, so
    a 100 TB corpus indexes into ~tens of GB that new batches join against
    without ever re-reading corpus text."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, num_hashes)
    return sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def verify_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    left_col: str,
    right_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (left_col, right_col) id
    pairs: re-shingles ONLY documents that appear in a candidate pair
    (semi-join pushes the id filter to the scan), so verification cost is
    linear in candidate volume, not corpus size."""
    cand_ids = (
        candidates.select(F.col(left_col).alias(id_col))
        .unionAll(candidates.select(F.col(right_col).alias(id_col)))
        .distinct()
    )
    sets = doc_shingle_sets(
        docs.join(cand_ids, id_col, "left_semi"), id_col, text_col, n
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    pa = sets.select(F.col("doc").alias(left_col), "sh")
    pb = sets.select(F.col("doc").alias(right_col), "sh")
    common = (
        pa.join(candidates, left_col)
        .join(pb, ["sh", right_col])
        .groupBy(left_col, right_col)
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(
            sizes.select(F.col("doc").alias(left_col), F.col("n_sh").alias("na")),
            left_col,
        )
        .join(
            sizes.select(F.col("doc").alias(right_col), F.col("n_sh").alias("nb")),
            right_col,
        )
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(left_col, right_col, "jaccard")
    )


def portable_minhash_band_buckets(
    text: Column, num_perms: int = 16, bands: int = 8
) -> Column:
    """array<struct<band:long, bucket:string>> — per-document MinHash band
    buckets computed MAP-ONLY (no shuffle), with an md5-derived hash so the
    construction is reproducible in any engine (same portability trick as
    simhash_portable_fingerprints; the shuffle-based xxhash64 pipeline in
    ``minhash_signatures`` stays the batch fast path).

    Permutation p of token w = first 15 hex chars of md5(w || '|p'):
    fixed-length lowercase hex, so lexicographic MIN == numeric MIN of the
    60-bit value in both Spark and DuckDB. A band's bucket key is its
    signature rows joined with '_'.

    Per-doc cost is num_perms interpreted HOF passes over the token array
    (Catalyst lambdas don't codegen) — fine for streaming micro-batches
    and modest batch jobs; the xxhash64 groupBy path wins on huge batch
    corpora.
    """
    if num_perms % bands != 0:
        raise ValueError(
            f"num_perms ({num_perms}) must be divisible by bands ({bands}); "
            "otherwise the trailing permutations are silently dropped from "
            "every band's bucket key"
        )
    toks = F.array_distinct(tokens_col(text))
    r = num_perms // bands

    # single-arg lambda via factory: a `lambda w, p=p:` would have arity 2,
    # which pyspark's transform() interprets as an (element, index) lambda
    # and silently binds p to the array INDEX
    def perm_hash(p: int):
        return lambda w: F.substring(F.md5(F.concat(w, F.lit(f"|{p}"))), 1, 15)

    sigs = [F.array_min(F.transform(toks, perm_hash(p))) for p in range(num_perms)]
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws("_", *sigs[b * r : (b + 1) * r]).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def duplicate_span_removal_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """The REMOVAL phase of ExactSubstr dedup (Lee et al. 2022,
    arXiv:2107.06499): ``duplicate_ngram_stats`` only *measures* duplicated
    coverage — this operator applies the rewrite rule ("excise every token
    covered by a cross-document duplicated n-gram") and reports, per group,
    what the rewritten corpus looks like: docs trimmed, tokens removed,
    retained-token ratio. That retained ratio is the number a curation run
    actually acts on before re-training.

    A token position is covered when ANY duplicated n-gram occurrence
    overlaps it (occurrence start p covers p..p+n-1), so coverage is the
    union of spans — computed distributively as distinct (doc, position)
    pairs, never by rebuilding strings.

    Scale shape: identical to duplicate_ngram_stats (one explode, hash-agg
    for the corpus-duplicate decision, equi-join back) plus an O(n)-wide
    position explode restricted to DUPLICATED occurrences only; the
    distinct on (doc, pos) is a hash shuffle linear in covered tokens.
    No doc-pair join, no driver-side text assembly.
    """
    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    occ = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("_text"))
        .repartition(n_parts)
        .select(
            "doc",
            F.posexplode(shingle_occurrences_col(F.col("_text"), n)).alias("pos", "sh"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = (
        occ.groupBy("sh")
        .agg(F.count_distinct("doc").alias("_docs"))
        .filter(F.col("_docs") >= 2)
        .select("sh")
    )
    covered = (
        occ.join(dup, "sh")
        .select("doc", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tokpos"))
        .distinct()
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("removed"))
    )
    totals = docs.select(
        F.col(id_col).alias("doc"),
        F.col(group_col).alias("grp"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tok"),
    )
    return (
        totals.join(covered, "doc", "left")
        .select("grp", "n_tok", F.coalesce(F.col("removed"), F.lit(0)).cast("long").alias("removed"))
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("removed") > 0).cast("long")).cast("long").alias("docs_trimmed"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum("removed").cast("long").alias("tokens_removed"),
            F.round(
                F.lit(1.0) - F.sum("removed") * 1.0 / F.sum("n_tok"), 6
            ).alias("retained_ratio"),
        )
    )


def icws_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_samples: int = 32,
) -> DataFrame:
    """ICWS — Ioffe's Consistent Weighted Sampling (ICDM 2010): the
    weighted-Jaccard analogue of MinHash. For each of ``num_samples``
    independent samples, every (shingle s, tf weight w) draws
    r, c ~ Gamma(2,1) and b ~ U(0,1) deterministically from xxhash64(s, k),
    then t = floor(ln w / r + b), y = exp(r (t - b)), a = c / (y e^r);
    the sample's signature element is the argmin-a (s, t) pair, and
    P[element_A == element_B] = J_w(A, B) exactly — the property the
    companion test pins against dedup_weighted_jaccard_pairs' exact
    values.

    All arithmetic is JVM expressions (xxhash64-derived 32-bit uniforms,
    ln/exp/floor, one min_by per (doc, sample)); the fan-out is
    tf-rows x num_samples with map-side partial argmins, so the shuffle
    carries O(docs x samples) rows. Rows-only (the argmin chain crosses
    libm, so near-tied a-values make cross-engine hashing luck-dependent
    by construction — the guarantee is statistical, property-tested).

    r14 adjudicated negative (VERDICT r13 #6): an Arrow-batched numpy
    ln/exp sampler CANNOT replace this expression fan without changing
    results — over the operator's own (i+0.5)/2^32 uniform grid, numpy's
    log/exp disagree with the JVM's in the last bit on 21%/25% of 1M
    probed values (and CPython's math.log disagrees with the JVM on 7%),
    so the per-sample argmin would flip elements wholesale. Bit-identity
    would require a Python port of the JVM's exact libm; the JVM fan
    stays."""
    sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(shingle_occurrences_col(F.col(text_col), n)).alias("s"),
    )
    tf = sh.groupBy("doc", "s").agg(F.count(F.lit(1)).alias("w"))
    fan = tf.withColumn(
        "k", F.explode(F.array(*[F.lit(i) for i in range(num_samples)]))
    )

    def u01(tag: str):
        # two (2^-32)-grid uniforms per native 64-bit hash. xxhash64 here,
        # not md5: the draw only has to be a DETERMINISTIC seeded function
        # of (shingle, sample) — this operator is rows-only, so engine
        # portability buys nothing, and the old md5-string -> hex-substring
        # -> conv chain dominated the fan stage (r9: ~12 s of the query's
        # 14 s wall at sf0.1; xxhash64 cut the signature pass ~3x).
        h = F.xxhash64(F.col("s"), F.col("k"), F.lit(tag))
        hi = F.shiftrightunsigned(h, 32).cast("double")
        lo = F.shiftrightunsigned(F.shiftleft(h, 32), 32).cast("double")
        return [(x + F.lit(0.5)) / F.lit(float(1 << 32)) for x in (hi, lo)]

    u1, u2 = u01("rc1")
    u3, u4 = u01("rc2")
    b = u01("b")[0]
    r = -(F.log(u1) + F.log(u2))  # Gamma(2,1) = Exp(1) + Exp(1)
    c = -(F.log(u3) + F.log(u4))
    t_idx = F.floor(F.log(F.col("w").cast("double")) / r + b)
    y = F.exp(r * (t_idx - b))
    a = c / (y * F.exp(r))
    return (
        fan.select("doc", "k", "s", t_idx.cast("long").alias("t"), a.alias("a"))
        .groupBy("doc", "k")
        .agg(F.min_by(F.struct("s", "t"), F.struct("a", "s")).alias("el"))
        .select("doc", "k", F.col("el.s").alias("sig_s"), F.col("el.t").alias("sig_t"))
    )
