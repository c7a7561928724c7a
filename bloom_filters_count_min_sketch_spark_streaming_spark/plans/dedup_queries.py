"""Deduplication queries (SURVEY §2.D D1-D2) over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup, similarity
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY md5(lower(text))
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash; keeps the lowest doc_id per group."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.lower("text")).alias("h")).agg(
        F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("dup_count")
    ).select("kept_doc_id", "dup_count")


@query(
    "dedup_ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-duplicate pairs (inverted-index join —
    no |docs|^2 product)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8, snapshot=True)


@query(
    "dedup_minhash_lsh_pairs",
    oracle="""
    -- MinHash banding is a candidate-generation optimization; with exact
    -- Jaccard verification at threshold 0.9 the LSH b=16/r=4 s-curve
    -- (P[candidate] = 1-(1-s^4)^16 > 0.99996 at s=0.9) recovers every
    -- pair, so the exact computation is a valid oracle at this scale.
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + LSH(16 bands x 4 rows) candidate pairs, verified with
    exact Jaccard at 0.9 — the 100 TB near-dedup path."""
    docs = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.9)


@query("dedup_simhash_candidates", witness="dedup_simhash_banded_exact")
def dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 64-bit fingerprints, pairs at Hamming
    distance <= 6 via 4-band bucketing (each 16-bit band must match exactly
    for at least one band — pigeonhole guarantee for d <= 3, probabilistic
    above). Deterministic but xxhash64-based -> rows-only check; covered
    against n-gram Jaccard in tests."""
    docs = load(spark, sf_dir, "documents")
    fp = dedup.simhash64(docs)
    bands = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.band", "bb.key")
    a = bands.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = bands.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", dedup.hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= 6)
    )


@query(
    "contamination_bloom_gate",
    oracle="""
    -- the Bloom gate is a superset prefilter and the verify semi-join is
    -- exact, so the result equals the plain shingle join's
    WITH bt AS (
      SELECT string_split(lower(text), ' ') AS ws FROM documents WHERE source = 'src0'
    ), bsh AS (
      SELECT DISTINCT unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              for i in range(1, len(ws)-1)]) AS s
      FROM bt WHERE len(ws) >= 3
    ), ct AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws
      FROM documents WHERE source <> 'src0'
    ), csh AS (
      SELECT DISTINCT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                      for i in range(1, len(ws)-1)]) AS s
      FROM ct WHERE len(ws) >= 3
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM csh GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
      FROM csh WHERE s IN (SELECT s FROM bsh) GROUP BY doc_id
    )
    SELECT h.doc_id, n_shingles, n_contaminated
    FROM hits h JOIN sizes USING (doc_id)
    """,
)
def contamination_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination (training-data hygiene): treat the src0
    slice as the held-out benchmark, count each remaining document's
    3-gram shingles that appear in it. Bloom-gated shingle flow: corpus
    shingles pass a broadcast filter of the benchmark shingle set before
    the exact verify semi-join — at 100 TB the corpus never shuffles on
    shingle, only probable hits do."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    benchmark = docs.filter(F.col("source") == "src0")
    return dedup.contamination_gate(corpus, benchmark, n=3, fpp=0.01)


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(lower(text)) AS fingerprint, length(text) AS n_chars
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting (md5) — the exact-dedup / provenance substrate."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.lower("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    -- both engines: exact DOUBLE dot products from identical float32
    -- inputs, rounded to 6 before the threshold compare (nearest fixture
    -- pair is >= 1e-4 from the 0.45 boundary at sf0.01/sf0.1)
    SELECT id_a, id_b, cos FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_sum(list_transform(
                      list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
                      t -> t[1] * t[2]))
                   / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
                      * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)))),
                   6) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cos >= 0.45
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline;
    LSH-bucketed variant is the 100 TB path — see operators/similarity.py)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(emb, threshold=0.45)


@query(
    "dedup_cluster_assignment",
    oracle="""
    -- Connected components over the verified near-dup pairs (exact Jaccard
    -- >= 0.9; see dedup_minhash_lsh_pairs for why exact = LSH-verified at
    -- this threshold), via transitive closure in a recursive CTE. Every
    -- document gets the min doc_id of its component; singletons keep
    -- themselves.
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b FROM cand
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, MIN(v) AS cluster_id, (MIN(v) = u) AS kept
    FROM reach GROUP BY u
    """,
)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS -> keep-one-per-cluster decision:
    the dedup endgame a training-data pipeline actually executes. MinHash-LSH
    candidate pairs (verified Jaccard >= 0.9) feed min-label-propagation
    connected components; every document is assigned its component's min
    doc_id and ``kept`` marks the survivor."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.9)
    comp = dedup.components_min_label(pairs, docs, id_col="doc_id")
    return comp.select(
        "doc_id",
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("doc_id")).alias("kept"),
    )


@query(
    "dedup_keep_best_quality",
    oracle="""
    -- quality-aware survivor selection: same near-dup clusters as
    -- dedup_cluster_assignment, but the kept document is the cluster's
    -- HIGHEST-QUALITY member (n_chars desc, doc_id asc tie-break) — what
    -- production pipelines actually keep, instead of min-id.
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b FROM cand
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ), reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (
      SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    ), ranked AS (
      SELECT comp.doc_id, cluster_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY d.n_chars DESC, comp.doc_id) AS r
      FROM comp JOIN documents d ON d.doc_id = comp.doc_id
    )
    SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars,
           (r = 1) AS kept
    FROM ranked
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame with QUALITY-AWARE survivor selection: near-dup
    clusters (MinHash-LSH pairs -> min-label components) keep their
    highest-quality member (n_chars as the stand-in score; any scalar
    quality column slots in), not the arbitrary min-id. One extra
    broadcast-join + per-cluster window over the component table — the
    cluster table is tiny relative to the corpus, so survivor policy is
    free to change without re-running pair generation."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.9)
    comp = dedup.components_min_label(pairs, docs, id_col="doc_id")
    from pyspark.sql import Window

    ranked = (
        comp.select("doc_id", F.col("component").alias("cluster_id"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc("n_chars"), F.asc("doc_id")
                )
            ),
        )
    )
    return ranked.select(
        "doc_id",
        "cluster_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        (F.col("r") == 1).alias("kept"),
    )


@query(
    "lsh_parameter_planner",
    oracle="""
    -- closed-form twin of the LSH (bands, rows) planner: over every
    -- (b, r) factorization of 64 permutations, the s-curve collision
    -- probability P(s) = 1 - (1 - s^r)^b at the target threshold, and
    -- the chosen config = the factorization whose P(threshold) sits
    -- closest to 0.5 (steepest cut at the target). Pure float math on
    -- ~7 rows; terms ROUND at 8 so last-ulp pow noise can't flip ranks.
    WITH factorizations AS (
      SELECT * FROM (VALUES (1, 64), (2, 32), (4, 16), (8, 8),
                            (16, 4), (32, 2), (64, 1)) AS f(b, r)
    ), thresholds AS (SELECT unnest([0.8, 0.9]) AS s),
    curve AS (
      SELECT s, b, r,
             ROUND(1 - POWER(1 - POWER(s, r), b), 8) AS p_collide
      FROM factorizations CROSS JOIN thresholds
    ), ranked AS (
      SELECT s, b, r, p_collide,
             ROW_NUMBER() OVER (PARTITION BY s
                                ORDER BY ABS(p_collide - 0.5), b) AS rk
      FROM curve
    )
    SELECT s AS threshold, b AS bands, r AS rows_per_band, p_collide,
           (rk = 1) AS chosen
    FROM ranked
    """,
)
def lsh_parameter_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The design step every MinHash deployment runs before any data
    moves: sweep the (bands, rows) factorizations of the permutation
    budget, evaluate the s-curve P(collide) = 1-(1-s^r)^b at the target
    Jaccard threshold, and choose the factorization whose curve cuts
    steepest there (P closest to 0.5). Pure Catalyst expression math over
    a literal factorization table — the planner itself is free at any
    scale, and its chosen (b, r) feeds dedup_minhash_lsh_pairs."""
    facts = spark.createDataFrame(
        [(1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (32, 2), (64, 1)],
        "b INT, r INT",
    )
    th = spark.createDataFrame([(0.8,), (0.9,)], "s DOUBLE")
    from pyspark.sql import Window

    curve = facts.crossJoin(th).select(
        "s", "b", "r",
        F.round(
            1 - F.pow(1 - F.pow(F.col("s"), F.col("r")), F.col("b")), 8
        ).alias("p_collide"),
    )
    w = Window.partitionBy("s").orderBy(F.abs(F.col("p_collide") - 0.5), F.col("b"))
    return (
        curve.withColumn("rk", F.row_number().over(w))
        .select(
            F.col("s").alias("threshold"),
            F.col("b").alias("bands"),
            F.col("r").alias("rows_per_band"),
            "p_collide",
            (F.col("rk") == 1).alias("chosen"),
        )
    )


# --- SimHash exactness witness (engine-portable md5 variant) -----------------

_SH_BITS = 60  # 15 hex chars of md5 -> fits a signed 64-bit int in both engines

_SH_ORACLE = f"""
    -- engine-portable SimHash: token hash = first 15 hex chars of md5
    -- (60 bits), per-bit +/-1 sums, sign -> fingerprint bit. This puts the
    -- full SimHash construction (per-bit sign aggregation + reassembly)
    -- under the value hash; the production simhash64 uses xxhash64 (not
    -- expressible in DuckDB) but shares the exact same aggregation shape.
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS w
      FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM tok
    ), bits AS (
      SELECT doc_id,
             {", ".join(f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(_SH_BITS))}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(_SH_BITS))}
                AS BIGINT) AS simhash
    FROM bits
"""


def portable_simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) md5-derived 60-bit SimHash — the engine-portable
    construction shared by the fingerprint witness and the banded-candidate
    witness. One shuffle keyed on doc_id, 60 codegen'd conditional sums."""
    toks = docs.select(
        F.col("doc_id"), F.explode(dedup.tokens_col(F.col("text"))).alias("w")
    )
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(_SH_BITS)
        ]
    )
    acc = F.lit(0).cast("long")
    for i in range(_SH_BITS):
        acc = acc + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(0)
    return bit_sums.select("doc_id", acc.alias("simhash"))


@query("simhash_portable_fingerprints", oracle=_SH_ORACLE)
def simhash_portable_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash witness (Charikar 2002) with an md5-derived 60-bit token
    hash, computable identically in any engine: per token, bit i
    contributes +1/-1 by the hash bit; per document, the fingerprint bit
    is the sign of the summed contributions. One shuffle keyed on doc_id,
    60 codegen'd conditional sums — the same plan shape as the production
    xxhash64 simhash64 (operators/dedup.py), which stays the fast path;
    this variant pins the construction under the driver's value hash."""
    return portable_simhash(load(spark, sf_dir, "documents"))


_SH_BAND_W = _SH_BITS // 4  # 15 bits per band
_SH_BANDED_ORACLE = f"""
    -- SimHash BANDING witness: the production banding path
    -- (dedup_simhash_candidates) is rows-only because xxhash64 isn't
    -- SQL-expressible; this twin runs the IDENTICAL banding machinery —
    -- 4 x {_SH_BAND_W}-bit band keys by shift/mask, band equi-join,
    -- doc_a < doc_b, pair distinct, bit_count(xor) Hamming filter — over
    -- the engine-portable md5 simhash, putting the whole candidate
    -- pipeline under the value hash. Hamming <= 16 keeps fixture rows
    -- non-empty (the pigeonhole d<=3 guarantee is threshold-independent).
    WITH sh AS ({_SH_ORACLE}),
    bands AS (
      SELECT doc_id, simhash, b.band,
             (simhash >> (b.band * {_SH_BAND_W})) & {(1 << _SH_BAND_W) - 1} AS key
      FROM sh CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                                AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
      SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      FROM pairs
    ) WHERE hamming <= 16
"""


@query("dedup_simhash_banded_exact", oracle=_SH_BANDED_ORACLE)
def dedup_simhash_banded_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding exactness witness: the same band-bucket candidate
    generation as dedup_simhash_candidates (4 equal-width band keys by
    shift/mask, band equi-join, pair distinct, Hamming re-rank) run over
    the md5-portable fingerprint (portable_simhash), so the ENTIRE
    banding code path is hash-checked — the production query differs only
    in the token hash (xxhash64). Same scale shape: band equi-join on
    16-ish-bit keys, never all-pairs; Hamming is one codegen'd
    bit_count(xor) per candidate."""
    fp = portable_simhash(load(spark, sf_dir, "documents"))
    mask = (1 << _SH_BAND_W) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * _SH_BAND_W)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            dedup.hamming64(F.col("sa"), F.col("sb")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 16)
    )


@query(
    "semdedup_embeddings",
    oracle="""
    -- SemDeDup keep/drop decision, cluster = label. Exact DOUBLE dot
    -- products in both engines; the 0.45 threshold compares the ROUNDED
    -- cosine (fixture margin to the boundary >= 0.02, engine-stable).
    WITH dropped AS (
      SELECT DISTINCT b.vec_id AS vid
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE ROUND(list_sum(list_transform(
                    list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
                    t -> t[1] * t[2]))
              / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
                 * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)))),
              6) >= 0.45
    )
    SELECT e.vec_id, e.label, (d.vid IS NULL) AS kept
    FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vid
    """,
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup with the pairwise
    cosine scoped to coarse clusters — drop a vector when a lower-id
    member of its cluster is within 0.45 cosine. Cluster = the label
    column here (keeps the construction oracle-checkable); at scale the
    cluster id comes from the distributed k-means, bounding the quadratic
    term to sum_c |c|^2. See operators/similarity.py:semdedup."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.semdedup(emb, cluster_col="label", threshold=0.45)


@query(
    "duplicate_ngram_spans",
    oracle="""
    -- Lee et al. 2022 ExactSubstr signal at 3-gram granularity: an n-gram
    -- occurrence is duplicated when the n-gram appears in >= 2 distinct
    -- docs; per-doc duplicated fraction is the curation threshold input.
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), occ AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws) - 1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), dup AS (
      SELECT s FROM occ GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
    ), per AS (
      SELECT o.doc_id, COUNT(*) AS dup_ngrams
      FROM occ o JOIN dup d ON o.s = d.s GROUP BY o.doc_id
    ), tot AS (
      SELECT doc_id, GREATEST(len(ws) - 2, 0) AS n_ngrams FROM toks
    )
    SELECT t.doc_id,
           CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
           CAST(COALESCE(p.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
           CASE WHEN t.n_ngrams > 0
                THEN ROUND(COALESCE(p.dup_ngrams, 0) * 1.0 / t.n_ngrams, 6)
           END AS dup_frac
    FROM tot t LEFT JOIN per p ON t.doc_id = p.doc_id
    """,
)
def duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact-duplicate-n-gram coverage (the ExactSubstr dedup
    signal of Lee et al. 2022): fraction of a doc's 3-gram occurrences that
    also appear in another document. Linear in corpus tokens — hash-agg on
    the n-gram for the corpus-duplicate decision, one equi-join back to
    occurrences; no doc-pair join. See operators/dedup.py:duplicate_ngram_stats."""
    docs = load(spark, sf_dir, "documents")
    return dedup.duplicate_ngram_stats(docs, n=3)


@query(
    "dedup_incremental_minhash",
    oracle="""
    -- Incoming batch (doc_id % 11 = 0) vs corpus-at-rest (% 11 <> 0):
    -- LSH banding only GENERATES candidates; with exact-Jaccard verification
    -- at 0.9 the b=16/r=4 s-curve recovers every pair (P > 0.99996 at
    -- s=0.9), so the exact cross-boundary computation is a valid oracle.
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), verified AS (
      SELECT doc_a, doc_b, c * 1.0 / (sa.n + sb.n - c) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
        AND ((doc_a % 11 = 0) <> (doc_b % 11 = 0))
    )
    SELECT CASE WHEN doc_a % 11 = 0 THEN doc_a ELSE doc_b END AS doc_incoming,
           CASE WHEN doc_a % 11 = 0 THEN doc_b ELSE doc_a END AS doc_corpus,
           jaccard
    FROM verified
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup ingest against a MinHash-LSH index AT REST:
    the corpus's band rows ((doc, band, bucket) — ``bands`` longs per doc,
    independent of doc size) are persisted as a parquet index; an incoming
    batch computes ONLY its own signatures and equi-joins the index for
    candidates, then exact-Jaccard-verifies by re-shingling just the
    candidate docs (semi-join pushdown). New data never re-shingles or
    re-hashes the corpus — the architecture that makes near-dedup
    affordable as a continuous ingest gate at 100 TB. Complements
    dedup_incremental_ingest (exact tier) with the near-dup tier."""
    import os
    import tempfile

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    incoming = docs.filter(F.col("doc_id") % 11 == 0)

    # Build + persist the index ONCE per fixture content (keyed on a
    # parquet fingerprint, like dpp_partitioned_join's temp copy): the
    # whole point of the at-rest index is that repeated ingest batches
    # never re-shingle the corpus — rebuilding it per call would charge
    # every batch the one-time cost the architecture exists to avoid.
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.misc_queries import (
        _path_fingerprint,
    )

    fp = _path_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    index_dir = os.path.join(tempfile.gettempdir(), f"bfcms_mh_index_{fp}")
    if not os.path.isdir(index_dir):
        tmp = f"{index_dir}.tmp-{os.getpid()}"
        dedup.minhash_band_rows(corpus).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, index_dir)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    index = spark.read.parquet(index_dir).select(
        F.col("doc").alias("doc_corpus"), "band", "bucket"
    )

    batch_bands = dedup.minhash_band_rows(incoming).select(
        F.col("doc").alias("doc_incoming"), "band", "bucket"
    )
    candidates = (
        batch_bands.join(index, ["band", "bucket"])
        .select("doc_incoming", "doc_corpus")
        .distinct()
    )
    return dedup.verify_jaccard_pairs(
        docs, candidates, "doc_incoming", "doc_corpus", threshold=0.9
    )


@query(
    "dedup_containment_pairs",
    oracle="""
    -- Containment similarity c(A,B) = |A ∩ B| / |A| (the GB-KMV /
    -- asymmetric-dedup measure): catches a small document embedded inside
    -- a larger one, which symmetric Jaccard misses (|A∩B|/|A∪B| stays
    -- small when |B| >> |A|). Same inverted-index shape as the Jaccard
    -- pairs; both directions reported for each unordered pair.
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(c * 1.0 / sa.n, 6) AS containment_a,
           ROUND(c * 1.0 / sb.n, 6) AS containment_b
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / sa.n >= 0.9 OR c * 1.0 / sb.n >= 0.9
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (asymmetric) near-dup pairs: c(A,B) = |A∩B|/|A| over
    3-gram shingle sets — flags a document whose content is (nearly) a
    subset of another even when their sizes differ wildly. Reuses the
    inverted-index equi-join on shingles (work ∝ shared shingles, never
    |docs|²); thresholded at 0.9 in either direction."""
    docs = load(spark, sf_dir, "documents")
    sets = dedup.doc_shingle_sets(docs, "doc_id", "text").distinct().persist()
    sizes = sets.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sets.select(F.col("doc").alias("doc_a"), "sh")
    b = sets.select(F.col("doc").alias("doc_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n").alias("nb"))
    ca = F.col("c") * 1.0 / F.col("na")
    cb = F.col("c") * 1.0 / F.col("nb")
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((ca >= 0.9) | (cb >= 0.9))
        .select(
            "doc_a",
            "doc_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


@query(
    "dedup_prefix_filter_jaccard_join",
    oracle="""
    -- semantic spec of the prefix-filtered similarity join: the FULL
    -- quadratic 3-gram-shingle Jaccard join at theta=0.9. The Spark side
    -- must reproduce it while generating candidates only through
    -- rare-shingle prefixes — equality against this oracle proves the
    -- filter is LOSSLESS, not just fast.
    WITH w AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
      FROM documents
    ), t AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS toks
      FROM w WHERE len(ws) >= 3
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.toks, b.toks)) AS i,
             len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS u
      FROM t a, t b WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter_sz, CAST(u AS BIGINT) AS union_sz
    FROM pairs WHERE u > 0 AND 10 * i >= 9 * u  -- integer-exact threshold
    ORDER BY doc_a, doc_b
    """,
)
def dedup_prefix_filter_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold similarity join via PREFIX FILTERING (Chaudhuri/
    Ganti/Kaushik ICDE'06, the PPJoin family) — the deterministic
    complement of MinHash LSH: every pair with 3-gram-shingle Jaccard >=
    theta is returned, none missed, yet candidates come only from an
    equi-join on each document's RARE-SHINGLE PREFIX. With shingles in a
    global rarest-first order and prefix length |t| - ceil(theta*|t|) + 1,
    any qualifying pair must collide inside both prefixes (missing the
    prefix caps the intersection below theta*|t|), so the quadratic pair
    space is never materialized. Shingles, not words: the fixture's word
    vocabulary is 31 tokens (every prefix hot, filter useless — measured
    6.9M candidates); the 27k-shingle vocabulary gives genuinely rare
    prefixes and candidate volume tracking true-duplicate clusters.

    At 100 TB: vocabulary ranking is one count + broadcast-join, the
    candidate join shuffles on rare shingles (frequency-ordered prefixes
    make hot tokens structurally impossible), verification touches
    candidates only. All JVM expressions; the integer filter 10i >= 9u
    avoids any float comparison ambiguity."""
    theta = 0.9
    docs = load(spark, sf_dir, "documents")
    # NOTE (r13): repartitioning docs before the shingle build was tried
    # to spread the one-row-group scan's single-task CPU and REGRESSED
    # ~2x — the exchange inflates the size estimate of `toks`, flipping
    # the candidate/verify joins from broadcast to sort-merge. The three
    # ~1.2 s single-task broadcast-build jobs are the cheaper trade at
    # fixture scale; real multi-file inputs parallelize the scan anyway.
    toks = docs.select(
        "doc_id", dedup.shingles_col(F.col("text"), 3).alias("toks")
    ).filter(F.size("toks") >= 1)
    tok = toks.select("doc_id", F.explode("toks").alias("w"))
    # global rarest-first total order over the (bounded) vocabulary
    from pyspark.sql import Window

    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    vrank = vocab.select(
        "w", F.row_number().over(Window.orderBy("freq", "w")).alias("r")
    )
    ranked = tok.join(F.broadcast(vrank), "w")
    ordered = ranked.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("r", "w"))).alias("rw")
    )
    # prefix of length |t| - ceil(theta*|t|) + 1 in rarest-first order.
    # ceil via INTEGER arithmetic ((9n+9) div 10), not float ceil(0.9*n):
    # a float product landing one ulp above an exact integer boundary
    # would shorten the prefix by one and silently break losslessness.
    pref = ordered.select(
        "doc_id",
        F.slice(
            F.transform("rw", lambda s: s["w"]),
            1,
            (
                F.size("rw")
                - F.expr("(size(rw) * 9 + 9) div 10").cast("long")
                + 1
            ).cast("int"),
        ).alias("prefix"),
    ).select("doc_id", F.explode("prefix").alias("w"))
    cand = (
        pref.alias("pa")
        .join(pref.alias("pb"), "w")
        .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("inter_sz"),
            (
                F.size("ta") + F.size("tb") - F.size(F.array_intersect("ta", "tb"))
            )
            .cast("long")
            .alias("union_sz"),
        )
        # integer-exact threshold: i >= theta*u as 10*i >= 9*u
        .filter(
            (F.col("union_sz") > 0)
            & (F.col("inter_sz") * 10 >= F.col("union_sz") * 9)
        )
    )
    return verified.select("doc_a", "doc_b", "inter_sz", "union_sz").orderBy(
        "doc_a", "doc_b"
    )


@query(
    "exact_substring_dedup_rewrite",
    oracle="""
    -- The ExactSubstr REMOVAL phase (Lee et al. 2022): a token position is
    -- excised when any cross-document duplicated 3-gram occurrence covers
    -- it (start p covers p, p+1, p+2); per-source rewrite report. Coverage
    -- is the distinct (doc, position) union of spans — the same linear
    -- explode/hash-agg/equi-join shape as the detection signal, no pair
    -- join and no string rebuild.
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), occ AS (
      SELECT doc_id, u.pos, u.s FROM (
        SELECT doc_id,
               unnest([{'pos': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]}
                       for i in range(1, len(ws) - 1)]) AS u
        FROM toks WHERE len(ws) >= 3) q
    ), dup AS (
      SELECT s FROM occ GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
    ), cov AS (
      SELECT DISTINCT o.doc_id, o.pos + d.j AS tokpos
      FROM occ o JOIN dup USING (s)
      CROSS JOIN (VALUES (0), (1), (2)) d(j)
    ), per AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS removed FROM cov GROUP BY doc_id
    ), base AS (
      SELECT t.source, len(t.ws) AS n_tok, COALESCE(p.removed, 0) AS removed
      FROM toks t LEFT JOIN per p ON t.doc_id = p.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_trimmed,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(removed) AS BIGINT) AS tokens_removed,
           ROUND(1.0 - SUM(removed) * 1.0 / SUM(n_tok), 6) AS retained_ratio
    FROM base GROUP BY source
    """,
)
def exact_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup, removal phase: excise every token covered by a
    cross-document duplicated 3-gram and report the per-source rewrite
    (docs trimmed, tokens removed, retained ratio) — the step that turns
    duplicate_ngram_spans' detection signal into the corpus a training run
    would actually consume. See operators/dedup.py:duplicate_span_removal_stats."""
    docs = load(spark, sf_dir, "documents")
    return dedup.duplicate_span_removal_stats(docs, n=3)


# --- Winnowing (MOSS) fingerprint overlap -------------------------------------

_WIN_K = 4  # words per gram
_WIN_W = 5  # grams per winnowing window

# Shared CTE prefix producing fp(doc_id, h) — the winnowing fingerprint set
# per document. Used by the batch overlap oracle AND the streaming first-seen
# contamination oracle.
_WINNOW_FP_CTES = f"""
    WITH dt AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest([struct_pack(
                       g := ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3],
                       p := i)
                     for i in range(1, len(ws) - {_WIN_K - 2})]) AS s
      FROM dt WHERE len(ws) >= {_WIN_K + _WIN_W - 1}
    ),
    k AS (
      SELECT doc_id, s.p AS p,
             ('0x' || substr(md5(s.g), 1, 10))::BIGINT * 8192 + (8191 - s.p) AS key
      FROM g
    ),
    m AS (
      SELECT doc_id, p,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW)
               AS mk
      FROM k
    ),
    fp AS (SELECT DISTINCT doc_id, mk // 8192 AS h FROM m WHERE p >= {_WIN_W})"""


def winnow_fingerprints_py(text: str) -> list[int]:
    """Pure-Python twin of the winnowing fingerprint construction (same
    tokenization, md5-derived 40-bit gram hash, packed rightmost-tie-break
    key, full-window minima). Kept as the readable specification and used
    by the property tests; the hot paths (batch window-min, streaming
    numpy sliding-min over JVM-hashed keys) are equality-tested against
    it via the shared oracle."""
    import hashlib

    ws = [w for w in text.lower().split(" ") if w != ""]
    if len(ws) < _WIN_K + _WIN_W - 1:
        return []
    keys = []
    for i in range(len(ws) - _WIN_K + 1):
        g = " ".join(ws[i : i + _WIN_K])
        h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:10], 16)
        keys.append(h * 8192 + (8191 - (i + 1)))  # 1-indexed position
    sel = set()
    for end in range(_WIN_W - 1, len(keys)):
        sel.add(min(keys[end - _WIN_W + 1 : end + 1]) // 8192)
    return sorted(sel)


def winnow_doc_fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc, bucket) distinct winnowing fingerprints per document, 100%
    JVM expressions and map-only — the shared construction behind the
    batch overlap query AND the streaming contamination gate: tokenize,
    form every k-word gram via arrays_zip of shifted slices, md5 -> 40-bit
    hash with the rightmost tie-break packed into
    ``key = h * 8192 + (8191 - p)`` (positions 1-indexed, < 8192), take
    the w-wide sliding MIN as ``least`` over w shifted slices of the
    per-doc key array, shiftright(13) back to the hash, array_distinct,
    explode. No per-doc shuffle (the old batch path's window needed one)
    and no Arrow boundary (the old streaming path shipped every gram row
    to a numpy sliding-min); only the selected fingerprints — expected
    density 2/(w+1) of gram volume — ever leave the row. Stateless, so it
    works on bounded and unbounded inputs alike.

    The two lambdas are interpreted (Catalyst HOFs don't codegen) but
    each does O(1) work per element with direct lambda-variable access —
    no element_at indexing — so the per-doc cost stays linear and
    JVM-side; md5 dominates either way."""
    dt = docs.select(F.col(id_col).alias("doc"), dedup.tokens_col(F.col("text")).alias("ws"))
    n = F.size("ws")
    zipped = F.arrays_zip(
        *[F.slice("ws", i + 1, n - (_WIN_K - 1)).alias(f"g{i}") for i in range(_WIN_K)]
    )
    # key_j = md5-40bit(gram_j) * 8192 + (8191 - p) with p = j+1 (1-indexed)
    keys = F.transform(
        zipped,
        lambda s, j: F.conv(
            F.substring(F.md5(F.concat_ws(" ", *[s[f"g{i}"] for i in range(_WIN_K)])), 1, 10),
            16,
            10,
        ).cast("long")
        * F.lit(8192)
        + (F.lit(8190) - j),
    )
    ks = dt.filter(n >= _WIN_K + _WIN_W - 1).select("doc", keys.alias("ks"))
    m = F.size("ks")
    shifted = F.arrays_zip(
        *[F.slice("ks", j + 1, m - (_WIN_W - 1)).alias(f"k{j}") for j in range(_WIN_W)]
    )
    mins = F.transform(shifted, lambda s: F.least(*[s[f"k{j}"] for j in range(_WIN_W)]))
    # keys are positive (< 2^53): shiftright 13 == // 8192 exactly, no
    # float division anywhere near the 53-bit mantissa edge
    buckets = F.array_distinct(F.transform(mins, lambda mk: F.shiftright(mk, 13)))
    return ks.select("doc", F.explode(buckets).alias("bucket"))


@query(
    "winnowing_fingerprint_overlap",
    oracle=_WINNOW_FP_CTES
    + f"""
    -- Winnowing (Schleimer-Wilkerson-Aiken, MOSS): hash every {_WIN_K}-word
    -- gram, slide a {_WIN_W}-gram window, keep the RIGHTMOST MINIMUM hash of
    -- each full window — the selected set is a position-robust fingerprint
    -- that provably catches any shared run of >= w+k-1 words. Tie-break is
    -- packed into the key (40-bit md5 hash * 8192 + (8191 - pos), positions
    -- < 8192), so the window MIN is a total order. Docs sharing fingerprints
    -- are plagiarism/contamination candidates; top-20 pairs by shared count.
    , pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fps
      FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared_fps
    FROM pairs
    ORDER BY shared_fps DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def winnowing_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken 2003 —
    the MOSS algorithm): hash all k-word grams, keep the rightmost minimum
    of every w-gram window. Guarantee: any match of >= w+k-1 consecutive
    words shares at least one selected fingerprint, with expected density
    2/(w+1) — position-robust contamination/plagiarism detection that
    md5-whole-doc (doc_fingerprints) and bag-of-shingles MinHash both miss.

    Scale shape: the whole fingerprint construction is map-only JVM array
    expressions (winnow_doc_fingerprints — shared with the streaming
    gate): gram hash, sliding min, and distinct all happen inside the
    document row, so the only shuffle is the candidate equi-join on the
    selected hash, carrying ~2/(w+1) of gram volume. The rightmost
    tie-break is packed INTO the key (hash*8192 + (8191 - pos)) so the
    argmin is total and the selected set is deterministic cross-engine."""
    docs = load(spark, sf_dir, "documents")
    fp = winnow_doc_fingerprints(docs).select(
        F.col("doc").alias("doc_id"), F.col("bucket").alias("h")
    )
    a = fp.select(F.col("doc_id").alias("doc_a"), "h")
    b = fp.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return pairs.orderBy(F.desc("shared_fps"), "doc_a", "doc_b").limit(20)


@query(
    "dedup_weighted_jaccard_pairs",
    oracle="""
    -- tf-WEIGHTED Jaccard top-20: J_w(a,b) = sum_s min(tf_a, tf_b) /
    -- sum_s max(tf_a, tf_b) over 3-gram occurrence counts — the multiset
    -- refinement of dedup_ngram_jaccard_pairs (set semantics saturate on
    -- doc pairs that repeat the same boilerplate shingle many times;
    -- weighted semantics count every occurrence). sum max = T_a + T_b -
    -- sum min keeps it one intersection join. Exact integers -> exact-int
    -- ratio -> identical doubles; ties break on (doc_a, doc_b).
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ),
    tf AS (SELECT doc_id, s, CAST(COUNT(*) AS BIGINT) AS tf
           FROM sh GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS t FROM tf GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(LEAST(a.tf, b.tf)) AS BIGINT) AS s_min
      FROM tf a JOIN tf b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, s_min,
           ROUND(s_min * 1.0 / (ta.t + tb.t - s_min), 6) AS weighted_jaccard
    FROM inter
    JOIN tot ta ON ta.doc_id = doc_a
    JOIN tot tb ON tb.doc_id = doc_b
    ORDER BY weighted_jaccard DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def dedup_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-weighted Jaccard near-duplicate pairs (top-20) — the multiset
    member of the similarity family: set Jaccard (dedup_ngram_jaccard_pairs)
    treats a shingle repeated 50x and once as identical evidence; the
    weighted form sum-min/sum-max counts occurrences, separating genuine
    near-copies from boilerplate-heavy pairs.

    Scale shape: identical to the set version — inverted-index equi-join on
    the shingle (no |docs|^2 product), tf tables partial-aggregate map-side,
    sum-max derived from per-doc totals so only the intersection join runs,
    and the same hot-shingle df cap as the set path (dedup.doc_shingle_tf:
    a boilerplate shingle in D docs is O(D^2) join pairs; the cap is far
    above fixture dfs so results here are exactly the uncapped oracle's).
    Exact integer tf everywhere; the ratio is an exact-int division."""
    docs = load(spark, sf_dir, "documents")
    tf = dedup.doc_shingle_tf(docs, n=3, snapshot=True)
    tot = tf.groupBy("doc").agg(F.sum("tf").cast("long").alias("t"))
    a = tf.select(F.col("doc").alias("doc_a"), "s", F.col("tf").alias("tf_a"))
    b = tf.select(F.col("doc").alias("doc_b"), "s", F.col("tf").alias("tf_b"))
    inter = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("tf_a", "tf_b")).cast("long").alias("s_min"))
    )
    ta = tot.select(F.col("doc").alias("doc_a"), F.col("t").alias("t_a"))
    tb = tot.select(F.col("doc").alias("doc_b"), F.col("t").alias("t_b"))
    wj = (
        inter.join(F.broadcast(ta), "doc_a")
        .join(F.broadcast(tb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "s_min",
            F.round(
                F.col("s_min")
                * F.lit(1.0)
                / (F.col("t_a") + F.col("t_b") - F.col("s_min")),
                6,
            ).alias("weighted_jaccard"),
        )
    )
    return wj.orderBy(F.desc("weighted_jaccard"), "doc_a", "doc_b").limit(20)


# Streaming first-seen contamination oracle: a fingerprint is "owned" by the
# lowest doc_id presenting it; every later doc's hit count + earliest owner.
WINNOW_FIRST_SEEN_ORACLE = (
    _WINNOW_FP_CTES
    + """
    , own AS (SELECT h, MIN(doc_id) AS owner FROM fp GROUP BY h)
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(o.owner) AS BIGINT) AS first_owner
    FROM fp f JOIN own o ON o.h = f.h AND o.owner < f.doc_id
    GROUP BY f.doc_id
    ORDER BY doc_id
    """
)


@query(
    "dedup_icws_weighted_minhash",
    no_witness_reason=(
        "sampling estimator by construction; its exact-J_w audit join is "
        "hash-checked via dedup_weighted_jaccard_pairs' oracle"
    ),
)
def dedup_icws_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted MinHash via ICWS (Ioffe 2010) — the SKETCH path to the
    weighted-Jaccard values dedup_weighted_jaccard_pairs computes exactly:
    per-sample consistent weighted samples whose collision probability IS
    J_w, so matching signature elements estimate the multiset similarity
    in O(docs x samples) space instead of an intersection join. Output:
    top-20 candidate pairs by matched samples, with the estimate beside
    the exact value (the estimator audit, same report shape as the ANN
    recall scorecards). Rows-only: the argmin chain crosses libm (see
    operators/dedup.py:icws_signatures); the collision guarantee is
    property-tested in tests/test_dedup.py."""
    m = 32
    docs = load(spark, sf_dir, "documents")
    sig = dedup.icws_signatures(docs, num_samples=m).persist()
    a = sig.select(
        F.col("doc").alias("doc_a"), "k", "sig_s", "sig_t"
    )
    b = sig.select(F.col("doc").alias("doc_b"), "k", "sig_s", "sig_t")
    matches = (
        a.join(b, ["k", "sig_s", "sig_t"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("matched_samples"))
        .filter(F.col("matched_samples") >= 4)
    )
    # The report is the TOP-20 candidates (total tie-break), selected
    # BEFORE the exact audit: exact J_w then touches <= 40 documents no
    # matter the corpus — the r9 10x stress caught the old order (audit
    # join over every candidate pair) going O(sum_s df_s^2) and OOMing
    # once the synthetic gave every doc 9 deliberate near-copies. The 20
    # rows come to the driver (bounded artifact), which also lets the
    # signature cache be released before the audit runs.
    top_rows = matches.orderBy(F.desc("matched_samples"), "doc_a", "doc_b").limit(20).collect()
    sig.unpersist()
    top = spark.createDataFrame(
        top_rows, "doc_a long, doc_b long, matched_samples long"
    )
    pair_docs = (
        top.select(F.col("doc_a").alias("doc"))
        .union(top.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    # exact J_w audit, same construction as dedup_weighted_jaccard_pairs
    # (doc_shingle_tf applies the hot-shingle df cap on the FULL corpus
    # first, so the audited values are identical to the unscoped ones),
    # restricted to the reported pairs' documents. localCheckpoint: the
    # scoped tf is <= 40 docs of shingles, but its lineage embeds the
    # full-corpus df-cap pass — tot/ta/tb would otherwise re-run that
    # pass three times (measured ~5 s of the query's wall). The <=20
    # audit rows are collected INSIDE checkpoint_scope so the checkpoint
    # RDD is released instead of sitting in executor storage for the
    # rest of the sweep.
    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        checkpoint_scope,
    )

    with checkpoint_scope(spark):
        tf = (
            dedup.doc_shingle_tf(docs, n=3)
            .join(F.broadcast(pair_docs), "doc")
            .localCheckpoint(eager=True)
        )
        tot = tf.groupBy("doc").agg(F.sum("tf").cast("long").alias("t"))
        ta = tf.select(F.col("doc").alias("doc_a"), "s", F.col("tf").alias("tf_a"))
        tb = tf.select(F.col("doc").alias("doc_b"), "s", F.col("tf").alias("tf_b"))
        inter = (
            ta.join(tb, "s")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.least("tf_a", "tf_b")).cast("long").alias("s_min"))
        )
        sa = tot.select(F.col("doc").alias("doc_a"), F.col("t").alias("t_a"))
        sb = tot.select(F.col("doc").alias("doc_b"), F.col("t").alias("t_b"))
        out = (
            top.join(inter, ["doc_a", "doc_b"], "left")
            .join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "matched_samples",
                F.round(F.col("matched_samples") * F.lit(1.0) / m, 4).alias("est_jw"),
                F.round(
                    F.coalesce(F.col("s_min"), F.lit(0))
                    * F.lit(1.0)
                    / (
                        F.col("t_a")
                        + F.col("t_b")
                        - F.coalesce(F.col("s_min"), F.lit(0))
                    ),
                    6,
                ).alias("exact_jw"),
            )
            .orderBy(F.desc("matched_samples"), "doc_a", "doc_b")
        )
        schema = out.schema
        rows = out.collect()
    return spark.createDataFrame(rows, schema)
