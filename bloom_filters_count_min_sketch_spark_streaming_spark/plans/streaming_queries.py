"""Streaming queries (SURVEY §2.C), each verified against a batch twin.

Every query replays `events` as a multi-file micro-batch stream
(availableNow), lands in a memory sink, and returns a bounded DataFrame
whose content must equal the equivalent batch computation — which is the
DuckDB oracle. This is the strongest correctness statement Structured
Streaming offers: stream output == batch output on the same data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
    CountMinSketchTable,
    cms_agg,
    cms_estimate_from_table,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming import stateful
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    _ephemeral_ckpt,
    events_stream_source,
    ntile_stream_source,
    run_available_now,
    run_foreach_batch,
    table_stream_source,
)

# --- streaming MinHash-LSH dedup (stateful first-seen bucket index) ----------

_LSH_PERMS = 16
_LSH_BANDS = 8
_LSH_R = _LSH_PERMS // _LSH_BANDS


def _stream_lsh_oracle() -> str:
    sig_cols = ", ".join(
        f"MIN(substr(md5(w || '|{p}'), 1, 15)) AS s{p}" for p in range(_LSH_PERMS)
    )
    band_case = " ".join(
        f"WHEN {b} THEN "
        + " || '_' || ".join(f"s{p}" for p in range(b * _LSH_R, (b + 1) * _LSH_R))
        for b in range(_LSH_BANDS)
    )
    return f"""
    -- batch twin of the streaming first-seen LSH index: with the replay
    -- source ordered by doc_id, "arrived before" == "smaller doc_id", so a
    -- doc is flagged in band b iff it shares b's bucket with a smaller doc,
    -- and its owner is the bucket minimum. md5-derived MinHash makes the
    -- signature engine-portable (same trick as simhash_portable_
    -- fingerprints).
    WITH tok AS (
      -- duplicates don't affect MIN, so no DISTINCT needed (the Spark side
      -- applies array_distinct purely for clarity)
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS w
      FROM documents
    ), sig AS (
      SELECT doc_id, {sig_cols}
      FROM tok GROUP BY doc_id
    ), bk AS (
      SELECT doc_id, b.band,
             CASE b.band {band_case} END AS bucket
      FROM sig CROSS JOIN (SELECT unnest(range({_LSH_BANDS})) AS band) b
    ), flagged AS (
      SELECT band, doc_id,
             MIN(doc_id) OVER (PARTITION BY band, bucket) AS owner
      FROM bk
    )
    SELECT doc_id, COUNT(*) AS n_bands_hit, CAST(MIN(owner) AS BIGINT) AS first_owner
    FROM flagged WHERE doc_id > owner
    GROUP BY doc_id ORDER BY doc_id
    """


@query("stream_minhash_lsh_dedup", oracle=_stream_lsh_oracle())
def stream_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE near-duplicate detection — the reference's two themes
    (streaming micro-batches + sketch state) composed into the LLM-era
    operation: documents stream in doc_id order, each micro-batch computes
    map-only portable MinHash band buckets, and a stateful first-seen
    index (applyInPandasWithState keyed by (band, bucket), one int64 per
    occupied bucket) flags every document that lands in a bucket an
    earlier document owns. Per-doc output: how many bands hit and the
    earliest owner.

    Scale shape: signature is per-row (no shuffle before the state op);
    state is O(distinct buckets) regardless of stream length; each batch
    shuffles only its own (band, bucket) rows — ingest-time dedup without
    re-running a corpus pair-join per batch (the batch analogue is
    dedup_incremental_minhash). Deterministic because the replay source
    mtime-orders batches and first_seen_flags sorts within batch."""
    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup

    buckets = src.filter(
        F.size(dedup.tokens_col(F.col("text"))) > 0
    ).select(
        F.col("doc_id").alias("doc"),
        F.explode(
            dedup.portable_minhash_band_buckets(
                F.col("text"), num_perms=_LSH_PERMS, bands=_LSH_BANDS
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    flags = stateful.first_seen_flags(buckets)
    out = run_available_now(flags, "append")
    return (
        out.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bands_hit"),
            F.min("owner").cast("long").alias("first_owner"),
        )
        .select(F.col("doc").alias("doc_id"), "n_bands_hit", "first_owner")
        .orderBy("doc_id")
    )


@query(
    "stream_windowed_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window over the stream (C4) with a watermark
    (C7). Complete output mode -> equals the batch time_bucket aggregation."""
    src = events_stream_source(spark, sf_dir)
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_available_now(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


@query(
    "stream_sliding_counts",
    oracle="""
    WITH slid AS (
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', ts) - INTERVAL (s.off) MINUTE AS window_start,
             ts
      FROM events, (SELECT unnest([0, 5]) AS off) s
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM slid
    WHERE ts >= window_start AND ts < window_start + INTERVAL 10 MINUTE
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (C5): 10-minute windows every 5 minutes — each event
    lands in 2 windows. Oracle materializes both candidate windows per event."""
    src = events_stream_source(spark, sf_dir)
    agg = src.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = run_available_now(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      -- >= : Spark's session_window end (last_ts + gap) is EXCLUSIVE, so an
      -- event at exactly gap distance starts a new session
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, session_id
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (C6): 30-minute inactivity gap per user. Oracle is
    the classic gaps-and-islands rewrite (session start = first event;
    sessions merge while consecutive gaps <= 30 min)."""
    src = events_stream_source(spark, sf_dir)
    agg = src.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = run_available_now(agg, "complete")
    return out.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        "n_events",
    )


@query(
    "stream_dedup_counts",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (C9): dropDuplicates on event_id across batches
    (state-store backed), then per-type counts."""
    src = events_stream_source(spark, sf_dir)
    deduped = src.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    out = run_available_now(agg, "complete")
    return out


@query(
    "stream_static_join_counts",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (C10): enrich the stream with the customer dim
    (broadcastable), aggregate per segment."""
    src = events_stream_source(spark, sf_dir)
    cust = F.broadcast(load(spark, sf_dir, "customer"))
    joined = src.join(cust, src.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_events"))
    return run_available_now(agg, "complete")


@query(
    "stream_stream_join_pairs",
    oracle="""
    SELECT s.event_id AS signup_event, p.event_id AS purchase_event
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 DAY
    """,
)
def stream_stream_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join (C11): watermarked interval join between two
    derived streams (signups x purchases within 1 day, same user)."""
    src1 = events_stream_source(spark, sf_dir)
    src2 = events_stream_source(spark, sf_dir)
    # watermark wider than the fixture's 30-day span: the join machinery
    # (state buffering, range pruning) is fully exercised but no event is
    # ever late-dropped or evicted, so stream output == batch join at any
    # scale factor. Tighter watermarks trade completeness for state size —
    # that trade-off is covered by tests/test_streaming.py's late-drop test.
    s = (
        src1.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "40 days")
        .select(F.col("event_id").alias("signup_event"), F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
    )
    p = (
        src2.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "40 days")
        .select(F.col("event_id").alias("purchase_event"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    joined = s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 DAY")),
    ).select("signup_event", "purchase_event")
    return run_available_now(joined, "append")


@query(
    "stream_stateful_running_counts",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS final_total
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (C8): applyInPandasWithState running
    per-user counters across micro-batches (the updateStateByKey analogue).
    The max running_total per key equals the batch count — the oracle."""
    src = events_stream_source(spark, sf_dir)
    running = stateful.running_counts(src, "user_id")
    out = run_available_now(running, "append")
    return out.groupBy("key").agg(F.max("running_total").alias("final_total"))


@query(
    "stream_generational_bloom_dedup",
    oracle="""
    -- exact twin of the generational-Bloom stream dedup: an event is a
    -- duplicate iff an earlier event (smaller event_id; ts is strictly
    -- event_id-monotone in the fixtures) carries the same
    -- (user_id, event_type) pair in the SAME or PREVIOUS 6-hour bucket.
    -- Integer bucket math in microseconds -> engine-exact; fpp 1e-9 and
    -- no Bloom false negatives -> the flagged sets are equal.
    SELECT e.event_id
    FROM events e
    WHERE EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = e.user_id AND p.event_type = e.event_type
        AND p.event_id < e.event_id
        AND CAST(FLOOR(epoch_us(p.ts) / 21600000000) AS BIGINT)
            >= CAST(FLOOR(epoch_us(e.ts) / 21600000000) AS BIGINT) - 1
    )
    ORDER BY event_id
    """,
)
def stream_generational_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-bounded streaming dedup in O(bits) state — the unbounded-
    stream duplicate-detection problem (Deng & Rafiei 2006) solved with
    TWO rotating Bloom generations per shard instead of stable random
    decrement, which keeps it deterministic and hence oracle-checkable.
    State never grows with keys or stream length: at 100 TB/day this is
    the dedup tier that runs forever, where exact per-key state (even
    watermark-evicted) tracks live-key cardinality. Keys route to shards
    by user_id, so each (user_id, event_type) pair owns one shard's
    filter pair; flags = seen in my or the previous 6-hour generation."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.xxhash64(F.concat_ws("|", "user_id", "event_type")).alias("h"),
    )
    flags = stateful.generational_bloom_dedup(keyed, window_us=6 * 3600 * 1_000_000)
    out = run_available_now(flags, "append")
    return out.select("event_id").orderBy("event_id")


@query(
    "stream_range_count_enrichment",
    oracle="""
    SELECT s.event_id, COUNT(p.event_id) AS purchases_7d
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = s.user_id
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
    GROUP BY s.event_id
    """,
)
def stream_range_count_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The B9 interval join maintained ONLINE (the range counterpart of
    stream_asof_enrichment): signups open 7-day windows in state,
    purchase arrivals increment the open windows they land in, closed
    windows evict after their final emission. Shares the batch range
    join's oracle, so the stream state provably reproduces the batch
    interval semantics; final count per signup = max across append-mode
    emissions (counts only grow)."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        F.col("event_type").alias("kind"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    out = run_available_now(
        stateful.streaming_range_counts(keyed, horizon_us=7 * 86400 * 1_000_000),
        "append",
    )
    return out.groupBy("event_id").agg(F.max("purchases_7d").alias("purchases_7d"))


@query(
    "stream_asof_enrichment",
    oracle="""
    SELECT e.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def stream_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join maintained ONLINE (C8 meets B10): one int64 of
    state per user (last click timestamp) enriches every error event at
    arrival with its nearest earlier click — same oracle as the batch
    asof_join_last_click_before_error, so stream state provably
    reproduces the batch window semantics including the inclusive
    same-microsecond tie rule."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("event_type").isin("click", "error")).select(
        "user_id",
        F.col("event_type").alias("kind"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    out = run_available_now(stateful.streaming_asof_last(keyed), "append")
    return out.select(
        "event_id",
        F.date_format(
            F.timestamp_micros("last_click_us"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("last_click_ts"),
    )


@query(
    "stream_topk_sketch_complete",
    oracle="""
    -- exact twin of the streaming top-k sketch: 5 distinct event types
    -- <= k, so the sketch state is exact and the final complete-mode
    -- emission equals the batch top-k (total tie-break re-rank applied
    -- on both sides).
    SELECT event_type AS item, COUNT(*) AS est_count,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS BIGINT) AS rnk
    FROM events GROUP BY event_type ORDER BY rnk
    """,
)
def stream_topk_sketch_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's heavy-hitter report maintained ONLINE: the
    approx_top_k sketch lives in streaming aggregation state and is
    re-emitted per micro-batch in complete mode; the final emission
    equals the batch sketch (sketch state is mergeable, so micro-batch
    partials combine exactly like batch partials). Output re-ranks with
    a total tie-break over the estimate's engine-internal order."""
    src = events_stream_source(spark, sf_dir)
    agg = src.groupBy().agg(F.expr("approx_top_k(event_type, 10)").alias("top"))
    out = run_available_now(agg, "complete")
    w = Window.orderBy(F.desc("est_count"), F.asc("item"))
    return (
        out.select(F.explode("top").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .orderBy("rnk")
    )


@query(
    "stream_generational_kmv_distinct",
    oracle="""
    -- exact twin of the sliding-window distinct from generational hash
    -- sets: distinct users whose events fall in the stream's LAST or
    -- SECOND-TO-LAST 6-hour bucket. k=65536 far exceeds fixture distinct
    -- users, so the KMV truncation never fires and the count is exact.
    WITH mb AS (
      SELECT MAX(CAST(FLOOR(epoch_us(ts) / 21600000000) AS BIGINT)) AS g
      FROM events
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_in_window
    FROM events CROSS JOIN mb
    WHERE CAST(FLOOR(epoch_us(ts) / 21600000000) AS BIGINT) >= mb.g - 1
    """,
)
def stream_generational_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window COUNT(DISTINCT) over an unbounded stream in O(k)
    state per shard: two KMV-style hash sets rotate with the 6h bucket
    (the distinct-count companion of stream_generational_bloom_dedup).
    The read side must align per-shard clocks — a shard only advances
    when its keys arrive, so with G = max cur_gen across shards a shard
    contributes |cur ∪ prev| at cur_gen == G, |cur| at G-1 (its prev has
    left the global window), else 0. Shards partition the key space by
    user_id, so per-shard distincts ADD."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.xxhash64(F.col("user_id")).alias("h"),
    )
    ests = stateful.generational_kmv_distinct(keyed, window_us=6 * 3600 * 1_000_000)
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("cur_gen", "n_window", "n_cur"), "seq").alias("s")
    )
    g_max = last.agg(F.max("s.cur_gen").alias("g")).select("g")
    return (
        last.crossJoin(F.broadcast(g_max))
        .select(
            F.when(F.col("s.cur_gen") == F.col("g"), F.col("s.n_window"))
            .when(F.col("s.cur_gen") == F.col("g") - 1, F.col("s.n_cur"))
            .otherwise(F.lit(0))
            .alias("n")
        )
        .agg(F.sum("n").cast("long").alias("distinct_in_window"))
    )


@query(
    "stream_bloom_prefilter_join",
    oracle="""
    -- the reference's namesake COMPOSITION, online: a Bloom filter built
    -- from the static side (users with >= 3 purchases) gates the event
    -- STREAM before any stateful work. fpp 1e-9 over ~hundreds of keys
    -- -> zero expected false positives at every fixture SF, and Bloom
    -- guarantees no false negatives, so the gated streaming counts equal
    -- the exact semi-join.
    WITH vip AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 3
    )
    SELECT e.event_type, COUNT(*) AS n_gated
    FROM events e JOIN vip USING (user_id)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def stream_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom pre-gate (the namesake operator composed with C10,
    online): the static side (frequent purchasers) compiles to ONE
    kilobyte-scale Bloom filter that ships to every executor and drops
    non-matching stream rows BEFORE the windowed/stateful stages — at
    100 TB this is the difference between shuffling the whole stream into
    a join and shuffling only the ~matching fraction. No false negatives
    (never lose a row), fpp pinned so low the gate equals the exact
    semi-join at fixture scale — which is the hash-checked oracle."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    ev = load(spark, sf_dir, "events")
    vip = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("user_id")
    )
    n_keys = vip.count()  # bounded scalar: sizes the filter to distinct keys
    bf = bloom_build(vip, "user_id", expected_items=max(n_keys, 16), fpp=1e-9)
    src = events_stream_source(spark, sf_dir)
    gated = bloom_might_contain(src, "user_id", bf).filter(F.col("might_contain"))
    counts = gated.groupBy("event_type").count()
    out = run_available_now(counts, "complete")
    return out.select(
        "event_type", F.col("count").alias("n_gated")
    ).orderBy("event_type")


@query(
    "stream_bottomk_sample",
    oracle="""
    -- exact twin of the ONLINE hash-min sample: the final streaming
    -- bottom-32 equals the batch bottom-32 by the md5-derived priority
    -- (new data can only displace larger hashes — the min-wise identity)
    SELECT event_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT,
                      event_id) AS BIGINT) AS rnk
    FROM events
    QUALIFY rnk <= 32 ORDER BY rnk
    """,
)
def stream_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE uniform sampling (the streaming form of
    sample_sketch_table_merge): each shard maintains its k smallest
    md5-priority rows in O(k) state, the global sample re-truncates the
    shard partials — a deterministic, engine-reproducible reservoir that
    never revisits history. Hash-checked end-to-end against the batch
    bottom-k."""
    k = 32
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    )
    out = run_available_now(stateful.bottomk_sample_state(keyed, k=k), "append")
    w_shard = Window.partitionBy("shard")
    latest = out.withColumn("max_seq", F.max("seq").over(w_shard)).filter(
        F.col("seq") == F.col("max_seq")
    )
    w_all = Window.orderBy("h", "event_id")
    return (
        latest.select("h", "event_id")
        .withColumn("rnk", F.row_number().over(w_all).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("event_id", "rnk")
        .orderBy("rnk")
    )


@query(
    "stream_misra_gries_topk",
    oracle="""
    -- streaming Misra-Gries in the exact regime: k=8 counters per shard
    -- exceed the 5 distinct event types, so no reduction ever fires, the
    -- per-shard summaries ARE exact substream counts, and their merged
    -- sum equals the global exact counts.
    SELECT event_type AS item, COUNT(*) AS mg_count,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS BIGINT) AS rnk
    FROM events GROUP BY event_type ORDER BY rnk
    """,
)
def stream_misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE Misra-Gries heavy hitters (the streaming twin of the batch
    misra_gries_table_merge, D133): each shard maintains a k-counter MG
    summary in the state store — O(k) state forever — and the read side
    merges shard summaries by addition + the same reduction. k=8 > 5
    distinct types keeps this run in the exact regime so the DuckDB
    oracle is the exact counts; the reducing regime's algebra is
    hash-checked by the batch twin and N/k-bounded by construction."""
    k = 8
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"), F.col("event_type").alias("item")
    )
    out = run_available_now(stateful.misra_gries_state(keyed, k=k), "append")
    # latest summary per shard via a window (a memory-sink self-join would
    # resolve both sides' `shard` to one attribute — see CLAUDE.md)
    w_shard = Window.partitionBy("shard")
    latest = out.withColumn("max_seq", F.max("seq").over(w_shard)).filter(
        F.col("seq") == F.col("max_seq")
    )
    merged = latest.groupBy("item").agg(F.sum("mg_value").cast("long").alias("mv"))
    # merge-side reduction (no-op here: 5 items <= k), same algebra as D133
    wm = Window.orderBy(F.desc("mv"), "item")
    rm = merged.withColumn("rnk", F.row_number().over(wm))
    om = rm.agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == k + 1, F.col("mv"))), F.lit(0)
        ).alias("o")
    )
    return (
        rm.crossJoin(F.broadcast(om))
        .filter((F.col("rnk") <= k) & (F.col("mv") - F.col("o") > 0))
        .select(
            "item",
            (F.col("mv") - F.col("o")).cast("long").alias("mg_count"),
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


@query("stream_dgim_window_count", witness="stream_dgim_saturated_exact")
def stream_dgim_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DGIM sliding-window bit counting (Datar-Gionis-Indyk-Motwani,
    SICOMP 2002) — the canonical O(log² W)-state sliding-window sketch,
    completing the classic streaming-sketch family next to Bloom/CMS/KMV:
    how many 'click' events fell in the trailing 10 days of an unbounded
    stream, answered from power-of-two buckets (≤ 2 per size) instead of
    raw history. Rows-only (bucket cascades aren't SQL); the ≤50% error
    bound and the exact comparison are emitted IN the result, and
    tests/test_state_sketches.py pins the core's invariants. Shards
    partition the key space, so per-shard estimates and their error
    bounds ADD."""
    window_us = 10 * 24 * 3600 * 1_000_000
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "click").cast("long").alias("bit"),
    )
    ests = stateful.dgim_window_count(keyed, window_us=window_us)
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("n_buckets", "est_window_ones"), "seq").alias("s")
    )
    agg = last.agg(
        F.sum("s.est_window_ones").cast("long").alias("est_clicks"),
        F.sum("s.n_buckets").cast("long").alias("n_buckets_total"),
    )
    ev = load(spark, sf_dir, "events")
    exact = (
        ev.crossJoin(
            F.broadcast(ev.agg(F.max(F.unix_micros("ts")).alias("now")))
        )
        .filter(
            (F.col("event_type") == "click")
            & (F.unix_micros("ts") > F.col("now") - window_us)
        )
        .agg(F.count(F.lit(1)).alias("exact_clicks"))
    )
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            "est_clicks",
            "exact_clicks",
            "n_buckets_total",
            (
                F.abs(F.col("est_clicks") - F.col("exact_clicks"))
                <= F.col("exact_clicks") / 2
            ).alias("within_dgim_bound"),
        )
    )


@query(
    "stream_counting_bloom_retraction",
    oracle="""
    -- Streaming counting-Bloom with RETRACTION: orders replay as
    -- micro-batches; every row inserts its o_custkey into the sharded
    -- counter state, 'F'-status rows also emit delete-deltas. Counters
    -- form an abelian group, so the final state equals the batch build
    -- regardless of delta order/batching; params (20k items, fpp 1e-6,
    -- seed 42) are the batch query's, verified FP-free at sf0.01/sf0.1,
    -- so the exact IN is a valid oracle.
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F')
    ORDER BY key
    """,
)
def stream_counting_bloom_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's streaming+sketch identity extended to DELETABLE
    membership: a counting Bloom filter maintained ONLINE in the state
    store. Map-only mapInPandas turns each micro-batch into signed sparse
    (pos, d) deltas (inserts for every order, retractions for 'F'-status
    ones), sharded by position range; ``sharded_counter_state`` holds one
    8 KB int64 block per shard and applies the deltas batch-by-batch.
    At 100 TB: deltas shuffle to their shard, total state is O(n_counters)
    bytes forever, and the sketch reads out as O(shards) rows — raw keys
    are never retained, yet membership supports retraction."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        CountingBloom,
        counting_bloom_might_contain,
    )

    shard_bits = 10
    width = 1 << shard_bits
    proto = CountingBloom.from_params(20_000, 1e-6, seed=42)
    n_counters, hash_a = proto.n_counters, proto.hash_a

    def batch_deltas(batches):
        hasher = CountingBloom(n_counters, hash_a, np.zeros(0, dtype=np.int64))
        for pdf in batches:
            keys = pdf["o_custkey"].to_numpy(dtype=np.int64)
            status = pdf["o_orderstatus"].to_numpy()
            parts = []
            ins, cnt = np.unique(hasher._positions(keys).ravel(), return_counts=True)  # noqa: SLF001
            parts.append(pd.DataFrame({"pos": ins, "d": cnt.astype(np.int64)}))
            mask = status == "F"
            if mask.any():
                dele, dcnt = np.unique(
                    hasher._positions(keys[mask]).ravel(), return_counts=True  # noqa: SLF001
                )
                parts.append(pd.DataFrame({"pos": dele, "d": -dcnt.astype(np.int64)}))
            yield pd.concat(parts, ignore_index=True)

    src = table_stream_source(spark, sf_dir, "orders", "o_orderkey")
    deltas = (
        src.select("o_custkey", "o_orderstatus")
        .mapInPandas(batch_deltas, "pos long, d long")
        .withColumn("shard", F.shiftright("pos", shard_bits).cast("long"))
    )
    blocks = stateful.sharded_counter_state(deltas, shard_bits=shard_bits)
    out = run_available_now(blocks, "append")
    # O(shards) bounded collect (~562 blocks x 8 KB): assemble the final
    # counter array from each shard's last emission, then probe.
    final = (
        out.groupBy("shard").agg(F.max_by("counters", "seq").alias("counters")).collect()
    )
    counters = np.zeros(n_counters, dtype=np.int64)
    for r in final:
        base = int(r["shard"]) * width
        block = np.frombuffer(bytes(r["counters"]), dtype=np.int64)
        end = min(base + width, n_counters)
        counters[base:end] = block[: end - base]
    sketch = CountingBloom(n_counters, hash_a, counters)
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    return (
        counting_bloom_might_contain(probe, "key", sketch)
        .filter("might_contain")
        .select("key")
    )


@query(
    "stream_rocksdb_stateful_counts",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS final_total
    FROM events GROUP BY user_id
    """,
)
def stream_rocksdb_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 made testable: the SAME stateful per-key counter as
    stream_stateful_running_counts, executed on the RocksDB state-store
    provider (the 100 TB provider — state spills to local disk with
    incremental checkpointing instead of living in executor heap). The
    oracle is identical to the HDFS-provider twin, so provider choice
    provably does not change results; tests/test_streaming.py also
    asserts row-level equality between the two providers directly."""
    src = events_stream_source(spark, sf_dir)
    running = stateful.running_counts(src, "user_id")
    out = run_available_now(running, "append", state_provider="rocksdb")
    return out.groupBy("key").agg(F.max("running_total").alias("final_total"))


@query(
    "stream_4batch_replay_trajectory",
    oracle="""
    WITH b AS (
      SELECT event_type, NTILE(4) OVER (ORDER BY event_id) AS batch
      FROM events
    ), c AS (
      SELECT event_type, batch, COUNT(*) AS n FROM b GROUP BY 1, 2
    )
    SELECT CAST(event_type AS VARCHAR) AS key,
           CAST(batch AS BIGINT) AS seq,
           CAST(n AS BIGINT) AS batch_events,
           CAST(SUM(n) OVER (
             PARTITION BY event_type ORDER BY batch
           ) AS BIGINT) AS running_total
    FROM c
    """,
)
def stream_4batch_replay_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch replay canary (r11 verdict #6): with the default replay
    at 2 micro-batches, the driver's hash gate sees one cross-batch fold —
    this query keeps FOUR-batch state folding under the gate permanently
    (pinned in the registry prefix). It hash-checks the per-batch state
    TRAJECTORY, not the final state: the source is an exact NTILE(4) split
    over event_id (SQL-expressible batch boundaries, unlike the sampled
    repartitionByRange split), each row carries its batch id, and the
    stateful fold emits (key, seq=batch, batch_events, running_total)
    per key per micro-batch in append mode. Any batch mis-ordering,
    dropped batch, or state reset changes some intermediate running_total
    and fails the hash. The fold asserts one batch id per micro-batch, so
    a broken split raises instead of silently hashing wrong."""
    src = ntile_stream_source(spark, sf_dir, "events", "event_id", n_files=4)
    traj = stateful.running_counts_with_batch(src, "event_type", "batch")
    return run_available_now(traj, "append").select(
        "key", "seq", "batch_events", "running_total"
    )


@query(
    "stream_stateful_cms_per_key",
    oracle="""
    WITH probes AS (SELECT unnest([0,1,2,3,4,5,6,7]) AS probe_id),
         types  AS (SELECT DISTINCT event_type FROM events),
         counts AS (
           SELECT event_type, user_id, COUNT(*) AS c
           FROM events WHERE user_id BETWEEN 0 AND 7
           GROUP BY 1, 2
         )
    SELECT t.event_type AS key, p.probe_id,
           COALESCE(c.c, 0) AS final_est
    FROM types t CROSS JOIN probes p
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.user_id = p.probe_id
    """,
)
def stream_stateful_cms_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's architectural heart, end to end: per-key (event_type)
    Count-Min Sketch living in the STATE STORE across micro-batches
    (updateStateByKey analogue), merged batch-by-batch, point-queried for a
    probe set of user_ids. Final (max) estimate per probe equals the exact
    count — the oracle — because eps is collision-free at fixture
    cardinality; state stays O(keys x sketch_size) regardless of stream
    length."""
    src = events_stream_source(spark, sf_dir)
    probes = list(range(8))
    est = stateful.running_cms_estimates(
        src, "event_type", "user_id", probes, eps=0.0001, confidence=0.999, seed=42
    )
    out = run_available_now(est, "append")
    return out.groupBy("key", "probe_id").agg(F.max("cms_est").alias("final_est"))


@query(
    "stream_update_mode_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events WHERE user_id < 40 GROUP BY user_id
    """,
)
def stream_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode (C12): each micro-batch emits only the keys whose
    aggregate changed; the memory sink therefore holds one row per (key,
    batch-it-changed-in) and the per-key MAX is the final count — equal to
    the batch aggregate."""
    src = events_stream_source(spark, sf_dir)
    agg = (
        src.filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_available_now(agg, "update")
    return out.groupBy("user_id").agg(F.max("n").alias("n_events"))


@query(
    "stream_stateful_bloom_distinct",
    oracle="""
    SELECT event_type AS key, COUNT(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type
    """,
)
def stream_stateful_bloom_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running BLOOM FILTER in the state store: counts never-seen
    user_ids per event_type across micro-batches (the reference's
    membership query as a streaming stateful operator). fpp=1e-9 -> zero
    false positives at fixture scale, so the final running_distinct equals
    exact COUNT(DISTINCT) — the oracle. No false negatives by construction,
    so nothing is double-counted."""
    src = events_stream_source(spark, sf_dir)
    run = stateful.running_bloom_distinct(
        src, "event_type", "user_id", expected_items=100_000, fpp=1e-9, seed=42
    )
    out = run_available_now(run, "append")
    return out.groupBy("key").agg(F.max("running_distinct").alias("distinct_users"))


@query(
    "salted_heavy_key_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    """,
)
def salted_heavy_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: two-phase salted count over the (low-
    cardinality, hence maximally skewed) event_type key. Result identical
    to the plain aggregate; only the shuffle distribution changes."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.skew import (
        salted_count,
    )

    ev = load(spark, sf_dir, "events")
    return salted_count(ev, "event_type", out="cnt", salt_buckets=16)


@query(
    "stream_cms_running_freq",
    oracle="""
    SELECT event_type, COUNT(*) AS exact_cnt, COUNT(*) AS cms_est
    FROM events GROUP BY event_type
    """,
)
def stream_cms_running_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core loop, Structured-Streaming-first (C13 + A3/A5):
    per micro-batch build a partial Count-Min Sketch (distributed
    count_min_sketch aggregate inside foreachBatch), merge into the running
    sketch (CMS is a commutative monoid), report estimates at stream end.
    eps=1e-4 -> collision-free at fixture cardinality, so estimates equal
    exact counts."""
    src = events_stream_source(spark, sf_dir)
    merged: dict[str, CountMinSketchTable | None] = {"cms": None}

    def update(batch_df: DataFrame, batch_id: int) -> None:
        row = batch_df.agg(
            cms_agg(batch_df, "event_type", eps=0.0001, confidence=0.999, seed=42).alias("sk")
        ).head()
        if row["sk"] is None:
            return
        t = CountMinSketchTable.from_bytes(bytes(row["sk"]))
        merged["cms"] = t if merged["cms"] is None else merged["cms"].merge(t)

    run_foreach_batch(src, update)
    sketch = merged["cms"]

    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    probe = cms_estimate_from_table(exact, "event_type", sketch)
    return probe.select("event_type", "exact_cnt", "cms_est")


@query(
    "stream_windowed_cms_freq",
    oracle="""
    -- eps=1e-3 (width 2000) is collision-free at fixture key cardinality,
    -- so each window's CMS answers exactly -> the batch COUNT is the oracle
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type, COUNT(*) AS exact_cnt, COUNT(*) AS cms_est
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The namesake composition (A3 x C4): a Count-Min Sketch PER tumbling
    event-time window, aggregated inside Structured Streaming.

    The stream maintains one sketch per window (the count_min_sketch
    Catalyst aggregate merges partials across micro-batches); at stream end
    each window's sketch is point-queried for every observed key and
    compared against the exact batch counts. State per window is the
    sketch's fixed byte size — frequency tracking whose memory is O(windows
    x sketch), independent of events per window: the property that lets a
    100 TB/day stream keep per-window frequencies without per-key state.
    """
    src = events_stream_source(spark, sf_dir)
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"))
        .agg(cms_agg(src, "event_type", eps=0.001, confidence=0.99, seed=42).alias("sketch"))
    )
    out = run_available_now(agg, "complete")
    # One row per window (bounded by time range, not data volume).
    sketch_rows = out.select(F.col("window.start").alias("window_start"), "sketch").collect()

    # Normalize probe keys exactly as the build did (JVM xxhash64).
    ev = load(spark, sf_dir, "events")
    key_rows = (
        ev.select("event_type").distinct().select("event_type", F.xxhash64("event_type").alias("k"))
    ).collect()
    keys = np.array([r["k"] for r in key_rows], dtype=np.int64)
    names = [r["event_type"] for r in key_rows]

    est_rows = []
    for r in sketch_rows:
        table = CountMinSketchTable.from_bytes(bytes(r["sketch"]))
        for name, est in zip(names, table.estimate_longs(keys)):
            est_rows.append((r["window_start"], name, int(est)))
    est_df = spark.createDataFrame(
        est_rows, "window_start timestamp, event_type string, cms_est long"
    )

    exact = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "exact_cnt")
    )
    return exact.join(est_df, ["window_start", "event_type"]).select(
        "window_start", "event_type", "exact_cnt", "cms_est"
    )


@query(
    "stream_windowed_hll_distinct",
    oracle="""
    -- DataSketches HLL stays in exact (sparse) mode below ~2^(lgK-2)
    -- distinct keys; per-window user cardinality at the gate's sf0.01 is
    -- <= 150 << 2^10, so the exact COUNT(DISTINCT) is a valid oracle. The
    -- dense approximate regime is property-tested (tests/test_sketches.py).
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def stream_windowed_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per tumbling window via HLL sketches (A8 x C4): the
    stream maintains one DataSketches HLL per 6-hour window (partials
    merged across micro-batches by the Catalyst aggregate), estimated at
    stream end. State per window is the sketch's fixed ~KB footprint —
    cardinality tracking that never stores user ids, the same
    O(windows x sketch_bytes) scaling story as the windowed CMS."""
    src = events_stream_source(spark, sf_dir)
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
    )
    out = run_available_now(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.hll_sketch_estimate("sketch").cast("long").alias("n_users"),
    )


@query(
    "stream_chained_windows",
    oracle="""
    -- Batch twin of the chained 5-min -> 1-hour streaming rollup. Append
    -- mode only emits hour windows finalized by the watermark (max_ts -
    -- 1h), i.e. windows whose end sits at least 1h before the stream's
    -- max event time: window_start + 2h <= max(ts).
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events, mx
    WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 2 HOUR <= m
    GROUP BY 1, 2
    """,
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful aggregations (Spark 3.4+ multiple-stateful-operator
    support): 5-minute tumbling counts re-aggregated into hourly totals in
    ONE streaming query — the standard rollup cascade that pre-aggregates
    at fine grain and compacts upward without re-reading the source.
    Append mode end-to-end; the second agg groups on window_time() of the
    first window, so watermark propagation finalizes hour windows exactly
    when their last 5-minute member is final. State is O(open windows),
    independent of stream length."""
    src = events_stream_source(spark, sf_dir)
    five = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hourly = (
        five.groupBy(F.window(F.window_time("window"), "1 hour"), "event_type")
        .agg(F.sum("c").cast("long").alias("n_events"))
    )
    out = run_available_now(hourly, "append")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


@query(
    "stream_stream_left_outer_join",
    oracle="""
    -- Append-mode watermarked LEFT OUTER stream-stream join: matched pairs
    -- emit as found; unmatched signups emit (with NULL) only once the
    -- watermark proves no purchase can still arrive, i.e. signups whose
    -- match window closed before the final watermark min(max_s, max_p)-1h.
    WITH s AS (
      SELECT event_id AS signup_event, user_id, ts FROM events
      WHERE event_type = 'signup'
    ), p AS (
      SELECT event_id AS purchase_event, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), wm AS (
      SELECT least((SELECT max(ts) FROM s), (SELECT max(ts) FROM p))
             - INTERVAL 1 HOUR AS w
    ), matched AS (
      SELECT s.signup_event, p.purchase_event
      FROM s JOIN p
        ON p.user_id = s.user_id
       AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR
    )
    SELECT signup_event, purchase_event FROM matched
    UNION ALL
    SELECT s.signup_event, CAST(NULL AS BIGINT) AS purchase_event
    FROM s, wm
    WHERE s.ts + INTERVAL 2 HOUR < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = s.user_id
          AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR)
    """,
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join (C11 outer variant): signups that got
    no purchase within 2 hours, discovered ON the stream. Unlike the inner
    join, outer emission REQUIRES eviction: a null row may only surface
    once the watermark proves the match window is closed, so this runs
    with a real (1-hour) watermark. That is safe here because the replay
    is strictly event-time-monotone (the split is range-partitioned on
    event_id, which is ts-ordered in the fixture, and the source stamps
    file mtimes in part order) — no input row is ever late-dropped, and
    eviction order is deterministic. State per key is the open 2-hour
    window, O(active users), independent of stream length."""
    src1 = events_stream_source(spark, sf_dir)
    src2 = events_stream_source(spark, sf_dir)
    s = (
        src1.filter(F.col("event_type") == "signup")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("signup_event"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
    )
    p = (
        src2.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_event"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 2 HOUR")),
        "leftOuter",
    ).select("signup_event", "purchase_event")
    return run_available_now(joined, "append")


@query(
    "statestore_reader_window_counts",
    oracle="""
    -- The state-store data source reads the aggregation state straight out
    -- of the checkpoint; a complete-mode windowed count never evicts, so
    -- final state == the batch aggregation.
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def statestore_reader_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational state inspection (Spark 4 state data source): run a
    windowed streaming aggregation, then read its state store back from
    the checkpoint with ``spark.read.format("statestore")`` — the surface
    an operator uses to debug a live 100 TB stream (skew across state
    partitions, key explosion, stuck windows) without touching the query.
    The read is a plain batch scan over the checkpoint's state files, so
    it parallelizes like any other source."""
    import tempfile

    src = events_stream_source(spark, sf_dir)
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = _ephemeral_ckpt()
    name = f"ssread_{abs(hash(ckpt)) % 10**8}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n_events"),
    )


@query(
    "stream_quantile_sketch",
    oracle="""
    -- streaming member of the quantile sketch family: the stream maintains
    -- one 512-bin histogram (complete mode, O(bins) state); quantiles are
    -- read off the final counts exactly like the batch sketch table.
    WITH merged AS (
      SELECT CAST(FLOOR(value / 2) AS BIGINT) AS bin, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ), cum AS (
      SELECT bin,
             CAST(SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cnt,
             (SELECT CAST(SUM(cnt) AS BIGINT) FROM merged) AS n_total
      FROM merged
    )
    SELECT p, MIN((bin + 1) * 2.0) AS est_q
    FROM cum CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS p)
    WHERE cum_cnt >= CEIL(p * n_total)
    GROUP BY p
    """,
)
def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running quantiles over the stream with O(bins) state (A9 x C3 —
    completing the streaming sketch trilogy next to the windowed CMS and
    HLL): the streaming agg maintains 512 bin counters across
    micro-batches; quantiles are answered from the final histogram with
    the same integer math as the batch sketch table. State never grows
    with stream length, and the answer path reads 512 rows."""
    src = events_stream_source(spark, sf_dir)
    agg = (
        src.select(F.floor(F.col("value") / 2).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = run_available_now(agg, "complete")
    from pyspark.sql import Window as W

    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "bin",
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        F.sum("cnt")
        .over(W.orderBy(F.lit(1)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("long")
        .alias("n_total"),
    )
    ps = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "p DOUBLE")
    return (
        cum.crossJoin(F.broadcast(ps))
        .filter(F.col("cum_cnt") >= F.ceil(F.col("p") * F.col("n_total")))
        .groupBy("p")
        .agg(F.min((F.col("bin") + 1) * 2.0).alias("est_q"))
    )


@query(
    "stream_incremental_quality",
    oracle="""
    -- final state of the incrementally-maintained audit == the batch audit
    -- (every metric is a mergeable counter, so batching cannot change it)
    SELECT 'row_count' AS "constraint",
           CAST(COUNT(*) AS DOUBLE) AS metric_value, COUNT(*) > 0 AS passed
    FROM events
    UNION ALL
    SELECT 'completeness_user_id',
           ROUND(COUNT(user_id) * 1.0 / COUNT(*), 6),
           ROUND(COUNT(user_id) * 1.0 / COUNT(*), 6) = 1.0
    FROM events
    UNION ALL
    SELECT 'domain_event_type',
           ROUND(SUM(CASE WHEN event_type IN
                  ('click','error','purchase','signup','view')
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(event_type), 6),
           ROUND(SUM(CASE WHEN event_type IN
                  ('click','error','purchase','signup','view')
                 THEN 1 ELSE 0 END) * 1.0 / COUNT(event_type), 6) = 1.0
    FROM events
    UNION ALL
    SELECT 'value_observed_min', MIN(value), MIN(value) >= 0.0 FROM events
    UNION ALL
    SELECT 'value_observed_max', MAX(value), MAX(value) <= 1000.0 FROM events
    """,
)
def stream_incremental_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality gate (the Deequ incremental-metrics design):
    every constraint metric is kept as a MERGEABLE counter (counts, null
    counts, domain-miss counts, min/max), one tiny counter row computed per
    micro-batch inside foreachBatch and folded into the running state —
    audits of an unbounded stream without ever re-reading it, and the final
    audit is provably batching-independent (all counters are commutative
    monoids), which is exactly what the oracle checks. Driver state is five
    numbers; at scale the same counters live in an output sink keyed by
    batch."""
    src = events_stream_source(spark, sf_dir)
    acc = {"n": 0, "n_user": 0, "n_type": 0, "n_domain_ok": 0, "mn": None, "mx": None}
    allowed = ["click", "error", "purchase", "signup", "view"]

    def update(batch_df: DataFrame, batch_id: int) -> None:
        row = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("user_id").alias("n_user"),
            F.count("event_type").alias("n_type"),
            F.sum(F.col("event_type").isin(allowed).cast("long")).alias("ok"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        ).head()
        if not row["n"]:
            return
        acc["n"] += row["n"]
        acc["n_user"] += row["n_user"]
        acc["n_type"] += row["n_type"]
        acc["n_domain_ok"] += int(row["ok"] or 0)
        acc["mn"] = row["mn"] if acc["mn"] is None else min(acc["mn"], row["mn"])
        acc["mx"] = row["mx"] if acc["mx"] is None else max(acc["mx"], row["mx"])

    run_foreach_batch(src, update)
    compl = round(acc["n_user"] / acc["n"], 6)
    dom = round(acc["n_domain_ok"] / acc["n_type"], 6)
    rows = [
        ("row_count", float(acc["n"]), acc["n"] > 0),
        ("completeness_user_id", compl, compl == 1.0),
        ("domain_event_type", dom, dom == 1.0),
        ("value_observed_min", float(acc["mn"]), acc["mn"] >= 0.0),
        ("value_observed_max", float(acc["mx"]), acc["mx"] <= 1000.0),
    ]
    return spark.createDataFrame(
        rows, "constraint string, metric_value double, passed boolean"
    )


@query(
    "stream_foreachbatch_upsert",
    oracle="""
    -- the upsert-merged keyed table must equal the batch aggregate over
    -- the whole stream; DECIMAL partials make the merge addition exact and
    -- associative, so batching cannot change the result
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style keyed upsert sink without Delta (C13): each micro-batch
    aggregates its rows per key inside foreachBatch, FULL OUTER merges them
    into a versioned parquet state table (read v, merge, write v+1 — the
    copy-on-write MERGE INTO pattern), and the final table is compared to
    the one-shot batch aggregate. Partials are DECIMAL so the merge is
    exact and associative — the result is provably batching-independent.

    Scale shape: state is O(|keys|) and the merge is a key-partitioned
    full-outer join; versioned directories give atomic swap semantics
    (what table formats do with a manifest). The merge reads state by
    BATCH ID (versioned_merge_upsert), so a retried micro-batch rebuilds
    its version from the untouched predecessor instead of double-applying
    — the idempotence contract a foreachBatch sink must supply itself
    (tests/test_streaming.py::test_versioned_upsert_retry_idempotent)."""
    import tempfile

    from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
        versioned_merge_upsert,
    )

    src = events_stream_source(spark, sf_dir)
    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        tmp_snapshot_dir as _snapdir,
    )

    root = _snapdir("upsert_state_")
    latest: dict[str, str | None] = {"path": None}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        inc = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).alias(
                "total_value"
            ),
        )
        latest["path"] = versioned_merge_upsert(inc, root, batch_id)

    run_foreach_batch(src, upsert)
    final = spark.read.parquet(latest["path"])
    return final.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    ).orderBy("event_type")


@query(
    "stream_kmv_distinct",
    oracle="""
    -- the streaming KMV merge must equal the batch KMV over the whole
    -- stream (bottom-k union-truncate is associative + commutative), and
    -- KMV's md5 hashing makes the ESTIMATE itself engine-portable — this
    -- is the one streaming distinct-count whose approximate value is
    -- hash-checked outright (the HLL twin can only be oracle'd exactly).
    WITH elems AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '-'
             || CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
      FROM events
    ), fr AS (
      SELECT elem,
             (('0x' || substr(md5(elem), 1, 12))::BIGINT + 1) / 281474976710656.0 AS frac
      FROM elems
    ), k AS (
      SELECT frac FROM (
        SELECT frac, row_number() OVER (ORDER BY frac, elem) AS rn FROM fr
      ) WHERE rn = 64
    )
    SELECT (SELECT COUNT(*) FROM elems) AS exact_distinct,
           ROUND(63.0 / k.frac, 4) AS kmv_est
    FROM k
    """,
)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count via a KMV sketch folded over micro-batches:
    each batch computes its own bottom-64 (a TakeOrderedAndProject over
    only that batch's rows), the driver keeps the running bottom-64 (a
    64-entry sorted merge — the same O(k) state as the CMS/Bloom streaming
    twins). Union-truncate is associative, so the result is batching-
    independent, and md5 portability means the oracle checks the ESTIMATE,
    not just an exact twin."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import sketches

    k = 64
    src = events_stream_source(spark, sf_dir)
    state: dict[str, list] = {"bk": []}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        batch_bk = (
            batch_df.select(
                F.concat_ws(
                    "-", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
                ).alias("elem")
            )
            .distinct()
            .withColumn("frac", sketches.kmv_fraction(F.col("elem")))
            .orderBy("frac", "elem")
            .limit(k)
            .collect()
        )
        merged = {(r["frac"], r["elem"]) for r in state["bk"]} | {
            (r["frac"], r["elem"]) for r in batch_bk
        }
        state["bk"] = [
            {"frac": f, "elem": e} for f, e in sorted(merged)[:k]
        ]

    run_foreach_batch(src, fold)
    sketch = state["bk"]
    assert len(sketch) == k
    kth = sketch[-1]["frac"]
    exact = (
        load(spark, sf_dir, "events")
        .select(
            F.concat_ws(
                "-", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
            ).alias("elem")
        )
        .distinct()
        .count()
    )
    # ROUND in Spark, not python: python's round() is half-even, the
    # oracle's ROUND is half-away — same rule on both sides by construction
    return spark.createDataFrame(
        [(exact, (k - 1) / kth)], "exact_distinct bigint, kmv_est double"
    ).select("exact_distinct", F.round("kmv_est", 4).alias("kmv_est"))


@query(
    "stream_rate_source_agg",
    oracle="""
    -- rate-micro-batch is the DETERMINISTIC built-in stream source (value
    -- = 0..N-1 split evenly across batches), so the whole run has a
    -- closed form the oracle regenerates from generate_series
    SELECT CAST(id % 8 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(id) AS BIGINT) AS value_sum
    FROM generate_series(0, 4999) t(id)
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_rate_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rate-micro-batch source (C1 breadth): Spark's deterministic
    load-generator stream — rowsPerBatch values per micro-batch with
    reproducible contents, the source you smoke-test streaming topologies
    with before pointing them at Kafka (which is env-blocked here, same
    replay contract). Five 1000-row batches aggregate to the closed-form
    table the oracle computes from generate_series."""
    import tempfile
    import time
    import uuid

    from pyspark.sql.streaming import StreamingQueryException

    rows_per_batch, n_batches = 1000, 5
    total = rows_per_batch * n_batches
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 4)
        .load()
    )
    bounded = src.filter(F.col("value") < total)
    agg = bounded.groupBy((F.col("value") % 8).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("long").alias("value_sum"),
    )
    name = f"rate_stream_{uuid.uuid4().hex[:8]}"
    # size the per-batch shuffle like run_available_now does — at the
    # session's 32 partitions every 1000-row micro-batch pays 32 state
    # commits and the poll loop's own jobs compound it
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    q = None
    try:
        # start() inside the try: if it throws (checkpoint dir failure,
        # sink name clash) the finally still restores shuffle.partitions
        # for the rest of the shared session
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(processingTime="50 milliseconds")
            .option("checkpointLocation", _ephemeral_ckpt())
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            done = spark.sql(
                f"SELECT COALESCE(SUM(n), 0) AS s FROM {name}"
            ).collect()[0]["s"]
            if done >= total:
                break
            time.sleep(0.1)
    finally:
        try:
            if q is not None:
                q.stop()
                q.awaitTermination(30)
        except StreamingQueryException as exc:
            # stop() can surface the query's own terminal exception; the
            # results were already drained above, but don't hide it
            import sys

            print(f"# stream stop(): {exc}", file=sys.stderr)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    return (
        spark.table(name)
        .select("bucket", "n", "value_sum")
        .orderBy("bucket")
    )


@query(
    "stream_cusum_changepoint",
    oracle="""
    -- batch twin of the online per-type CUSUM: integer-rescaled walk
    -- S'_d = D * cumsum(c) - d * N over each type's daily series, argmax
    -- |S'| with (abs desc, day asc) tie-break — identical to the global
    -- cusum_changepoint_daily statistic, per key.
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d_days,
             CAST(SUM(c) AS BIGINT) AS n_total
      FROM daily GROUP BY event_type
    ),
    walk AS (
      SELECT event_type, day,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS d_idx
      FROM daily
    ),
    scored AS (
      SELECT w.event_type AS key, w.day AS changepoint_day,
             CAST(t.d_days * w.cum - w.d_idx * t.n_total AS BIGINT)
               AS cusum_scaled,
             t.d_days, t.n_total,
             ROW_NUMBER() OVER (PARTITION BY w.event_type
               ORDER BY ABS(t.d_days * w.cum - w.d_idx * t.n_total) DESC, w.day)
               AS rn
      FROM walk w JOIN t ON t.event_type = w.event_type
    )
    SELECT key, changepoint_day, cusum_scaled, d_days, n_total
    FROM scored WHERE rn = 1
    """,
)
def stream_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint detection maintained ONLINE across
    micro-batches — the streaming member of the changepoint family
    (cusum_changepoint_daily is the batch scan; this keeps the day->count
    histogram in the state store in O(days) longs per key and re-emits the
    argmax-|S'| day every batch). The last emission per key equals the
    batch walk, which is the oracle. See
    streaming/stateful.py:streaming_cusum_daily."""
    src = events_stream_source(spark, sf_dir).withColumn(
        "day", F.to_date("ts").cast("string")
    )
    out = run_available_now(
        stateful.streaming_cusum_daily(src, "event_type", "day"), "append"
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "changepoint_day", "cusum_scaled", "d_days", "n_total")
    )


# Same SPRT design point as the batch sprt_ab_early_stop (quality_queries):
# constants re-derived here (identical floats by construction) rather than
# imported, so module registration order stays untouched.
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_C1 = __import__("math").log(_SPRT_P1 / _SPRT_P0)
_SPRT_C0 = __import__("math").log((1 - _SPRT_P1) / (1 - _SPRT_P0))
_SPRT_A = __import__("math").log(0.95 / 0.05)
_SPRT_B = -_SPRT_A


@query(
    "stream_sprt_early_stop",
    oracle=f"""
    -- batch twin of the ONLINE SPRT: identical walk, boundaries, and
    -- tie handling as sprt_ab_early_stop (see quality_queries) — the
    -- streaming operator must land on the same stopping time no matter
    -- where micro-batch boundaries fall.
    WITH ordered AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS k
      FROM events
    ),
    walk AS (
      SELECT n, k, k * {_SPRT_C1!r} + (n - k) * {_SPRT_C0!r} AS llr
      FROM ordered
    ),
    crossed AS (
      SELECT 1 AS pri, n, k, llr FROM walk
      WHERE llr >= {_SPRT_A!r} OR llr <= {_SPRT_B!r}
      ORDER BY n LIMIT 1
    ),
    last AS (
      SELECT 2 AS pri, n, k, llr FROM walk ORDER BY n DESC LIMIT 1
    ),
    pick AS (
      SELECT * FROM (SELECT * FROM crossed UNION ALL SELECT * FROM last)
      ORDER BY pri LIMIT 1
    )
    SELECT CASE WHEN llr >= {_SPRT_A!r} THEN 'accept_h1'
                WHEN llr <= {_SPRT_B!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           n AS n_decided, k AS k_decided, ROUND(llr, 6) AS llr
    FROM pick
    """,
)
def stream_sprt_early_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT maintained ONLINE across micro-batches — the streaming
    member of the sequential-testing family (sprt_ab_early_stop is the
    batch scan). State is O(1): running (n, k) plus the frozen decision;
    each batch walks its rows in event order with the CLOSED-FORM LLR on
    running totals, so the stopping time is invariant to micro-batch
    boundaries and hash-equal to the batch query. The experiment-platform
    shape: the monitor that watches a live A/B stream and stops it the
    moment the evidence bound is crossed. See
    streaming/stateful.py:streaming_sprt."""
    src = events_stream_source(spark, sf_dir).select(
        "event_id", (F.col("event_type") == "purchase").cast("long").alias("x")
    )
    out = run_available_now(
        stateful.streaming_sprt(
            src, "event_id", "x", _SPRT_C1, _SPRT_C0, _SPRT_A, _SPRT_B
        ),
        "append",
    )
    w = Window.orderBy(F.col("seq").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "decision",
            "n_decided",
            "k_decided",
            F.round(F.col("llr").cast("double"), 6).alias("llr"),
        )
    )


@query(
    "stream_iblt_replication_audit",
    oracle="""
    -- semantic spec of the streamed replication audit: the orders the
    -- warehouse copy silently lost (the % 97 slice) — the Spark side must
    -- LIST them exactly by subtracting the warehouse's IBLT from the
    -- online one and peeling the kilobyte residual.
    SELECT o_orderkey, CAST(1 AS BIGINT) AS side
    FROM orders WHERE o_orderkey % 97 = 0
    ORDER BY o_orderkey
    """,
)
def stream_iblt_replication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-integrity auditing with a STREAMED IBLT: the source
    stream maintains its reconciliation sketch ONLINE (cell slices in the
    state store, O(m/shards) longs per shard forever — the abelian-group
    state family of the sharded counting-Bloom), while the warehouse copy
    — which silently lost the o_orderkey % 97 slice — summarizes at rest
    with the same cell math. Cell-wise subtraction cancels every common
    key algebraically and the residual peels on the driver into the EXACT
    list of missing orders. At 100 TB neither side ever ships keys: the
    stream carries its kilobyte table forward, and the audit exchanges
    O(m) cells no matter how many rows replicated correctly. See
    streaming/stateful.py:iblt_cells_state; functions/iblt.py."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import iblt

    # Size the table to the EXPECTED DIFFERENCE (the audit's SLA bound,
    # here the %97 slice = n/97 keys), not the set size: 4x headroom over
    # the k=3 peel threshold (~m/1.3), next power of two, floor 1024. One
    # metadata-cheap count; deterministic per fixture.
    n_orders = load(spark, sf_dir, "orders").count()
    need = max(1024, (n_orders // 97 + 1) * 4)
    m, k, shards = 1 << (need - 1).bit_length(), 3, 16
    src = table_stream_source(spark, sf_dir, "orders", "o_orderkey").select(
        "o_orderkey"
    )
    kc = F.col("o_orderkey")
    cells = src.select(
        kc.alias("key"),
        iblt._checksum_expr(kc).alias("g"),
        F.explode(
            F.array(*[iblt._cell_expr(kc, j, m) for j in range(k)])
        ).alias("cell"),
    ).withColumn("shard", F.pmod(F.col("cell"), F.lit(shards)).cast("long"))
    out = run_available_now(stateful.iblt_cells_state(cells), "append")
    w = Window.partitionBy("shard").orderBy(F.col("seq").desc())
    last = out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    import pickle

    streamed: dict[int, list[int]] = {}
    for r in last.select("blob").collect():  # bounded: shards rows, m cells
        streamed.update(pickle.loads(bytes(r["blob"])))

    warehouse = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 != 0)
        .select("o_orderkey")
    )
    residual = []
    for r in iblt.iblt_table(warehouse, "o_orderkey", m=m, k=k).collect():
        a = streamed.pop(int(r["cell"]), [0, 0, 0])
        residual.append(
            {
                "cell": int(r["cell"]),
                "dcnt": a[0] - int(r["cnt"]),
                "key_x": a[1] ^ int(r["key_x"]),
                "sum_x": a[2] ^ int(r["sum_x"]),
            }
        )
    for cell, a in streamed.items():  # cells only the stream touched
        residual.append({"cell": cell, "dcnt": a[0], "key_x": a[1], "sum_x": a[2]})
    recovered = iblt.iblt_peel(residual, m=m, k=k)
    return spark.createDataFrame(
        [(int(key), int(side)) for key, side in recovered],
        "o_orderkey BIGINT, side BIGINT",
    ).orderBy("o_orderkey")


@query(
    "stream_token_bucket_quota",
    oracle="""
    -- exact semantic spec of the per-user token bucket (cap 3 tokens,
    -- refill 1 token / 6 h, cost 1 token, all in int64 microseconds):
    -- the recurrence b_i = min(cap, b_{i-1} + dt_i) unrolled by a
    -- recursive CTE over each user's ordered events. The idx=0 seed uses
    -- t=0, so the first real event clamps to a FULL bucket — identical
    -- to the operator's fresh-key init.
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS idx
      FROM events
    ),
    rec AS (
      SELECT user_id, CAST(0 AS BIGINT) AS idx,
             CAST(64800000000 AS BIGINT) AS bal,
             CAST(0 AS BIGINT) AS t, FALSE AS admitted
      FROM (SELECT DISTINCT user_id FROM ev)
      UNION ALL
      SELECT e.user_id, e.idx,
             LEAST(CAST(64800000000 AS BIGINT), rec.bal + (e.t - rec.t))
               - CASE WHEN LEAST(CAST(64800000000 AS BIGINT),
                                 rec.bal + (e.t - rec.t))
                           >= CAST(21600000000 AS BIGINT)
                      THEN CAST(21600000000 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS bal,
             e.t,
             LEAST(CAST(64800000000 AS BIGINT), rec.bal + (e.t - rec.t))
               >= CAST(21600000000 AS BIGINT) AS admitted
      FROM rec JOIN ev e
        ON e.user_id = rec.user_id AND e.idx = rec.idx + 1
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           CAST(SUM(CASE WHEN admitted THEN 0 ELSE 1 END) AS BIGINT)
             AS n_rejected
    FROM rec WHERE idx > 0
    GROUP BY user_id
    """,
)
def stream_token_bucket_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user token-bucket quota enforcement maintained ONLINE — the
    admission-control operator an ingestion edge runs (cap 3 tokens,
    refill 1 per 6 hours, burst-rejecting): four longs of state per key,
    event-time refill computed lazily from timestamp gaps (silent keys
    cost nothing — no timers), the whole recurrence in int64 microseconds
    so every admit/reject decision is exact. The final per-user
    admitted/rejected counts hash-equal a recursive-CTE unroll of the
    same recurrence — a sequential stateful semantics the declarative
    engine can still verify. See
    streaming/stateful.py:token_bucket_admission."""
    cost_us = 21_600_000_000  # 6 h in microseconds = 1 token
    cap_us = 3 * cost_us
    src = events_stream_source(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("t_us"), "event_id"
    )
    out = run_available_now(
        stateful.token_bucket_admission(
            src, "user_id", "t_us", "event_id", cost_us, cap_us
        ),
        "append",
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("key").cast("long").alias("user_id"),
            "n_admitted",
            "n_rejected",
        )
    )


@query(
    "stream_inverse_reduce_window",
    oracle="""
    -- closed-form twin of the incrementally-maintained trailing window:
    -- 6-hour buckets, window = the newest 3 buckets per key; the online
    -- operator must land on the same counts by add/evict maintenance.
    WITH b AS (
      SELECT event_type,
             CAST(FLOOR(epoch_us(ts) / 21600000000) AS BIGINT) AS bk
      FROM events
    ),
    m AS (SELECT event_type, MAX(bk) AS mb FROM b GROUP BY event_type)
    SELECT b.event_type AS key,
           CAST(COUNT(*) AS BIGINT) AS window_count,
           CAST(COUNT(DISTINCT b.bk) AS BIGINT) AS live_buckets
    FROM b JOIN m USING (event_type)
    WHERE b.bk >= m.mb - 2
    GROUP BY b.event_type
    """,
)
def stream_inverse_reduce_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DStream-era ``reduceByKeyAndWindow(func, invFunc)`` — the
    reference repo's signature windowing API — reborn as a custom stateful
    operator: a trailing 18-hour (3 x 6 h bucket) count per event type
    maintained by ADDING each batch's bucket deltas and SUBTRACTING
    buckets that slide past the horizon, never recomputing the window.
    O(window) state per key; the slide-out is the inverse reduce that
    made the original API efficient, generalized to any abelian
    aggregate. Final emission hash-equals the closed-form batch window.
    See streaming/stateful.py:inverse_windowed_counts."""
    src = events_stream_source(spark, sf_dir).select(
        "event_type",
        F.floor(F.unix_micros("ts") / F.lit(21_600_000_000)).cast("long").alias("bk"),
    )
    out = run_available_now(
        stateful.inverse_windowed_counts(src, "event_type", "bk", 3), "append"
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "window_count", "live_buckets")
    )


@query(
    "stream_ewma_control_chart",
    oracle="""
    -- identical statistic to the batch ewma_control_chart_daily (see
    -- quality_queries): lambda = 1/2 dyadic-exact smoothing + variance-
    -- inflated limits; the online operator must reproduce the whole
    -- series bit-for-bit from its day-histogram state.
    WITH daily AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS d,
             day, c
      FROM (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
      )
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM daily
    ),
    ewma AS (
      SELECT a.d, a.day,
             CAST(SUM(b.c * CASE WHEN b.d = 1 THEN power(2.0, -(a.d - 1))
                                 ELSE power(2.0, -(a.d - b.d + 1)) END)
               AS DOUBLE) AS e
      FROM daily a JOIN daily b ON b.d <= a.d
      GROUP BY a.d, a.day
    ),
    scored AS (
      SELECT e.d, e.day, e.e,
             (e.e - s.s * 1.0 / s.n)
               / sqrt(((s.ss - s.s * s.s * 1.0 / s.n) / s.n)
                      * (1.0 / 3.0) * (1 - power(0.25, e.d))) AS z
      FROM ewma e CROSS JOIN stats s
    )
    SELECT day, ROUND(e, 6) AS ewma, ROUND(z, 6) AS z,
           abs(z) > 2.7 AS out_of_control
    FROM scored
    """,
)
def stream_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA drift monitor maintained ONLINE — closes the loop on the
    changepoint family's streaming twins (CUSUM localizes, EWMA smooths):
    day-histogram state, full smoothed series re-emitted per batch, and
    because every lambda = 1/2 weight is a power of two the sequential
    per-batch recursion lands on the BIT-IDENTICAL series the batch
    closed form computes — the whole chart, limits included, passes the
    value-hash gate. See streaming/stateful.py:streaming_ewma_chart."""
    src = events_stream_source(spark, sf_dir).select(
        F.to_date("ts").cast("string").alias("day")
    )
    out = run_available_now(stateful.streaming_ewma_chart(src, "day"), "append")
    w = Window.partitionBy("day").orderBy(F.col("seq").desc())
    last = out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    z = F.col("z_raw").cast("double")
    return last.select(
        "day",
        F.round(F.col("ewma_raw").cast("double"), 6).alias("ewma"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2.7).alias("out_of_control"),
    )


@query(
    "stream_spacesaving_topk",
    oracle="""
    -- streaming SpaceSaving in the exact regime: k=8 counters per shard
    -- exceed the 5 distinct event types, so no eviction ever fires —
    -- counts are exact substream counts with zero error, and the merged
    -- summary equals the global exact counts (guaranteed_min == est).
    SELECT event_type AS item,
           COUNT(*) AS est_count,
           CAST(0 AS BIGINT) AS err_bound,
           COUNT(*) AS guaranteed_min,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS BIGINT) AS rnk
    FROM events GROUP BY event_type ORDER BY rnk
    """,
)
def stream_spacesaving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE SpaceSaving heavy hitters (Metwally et al. 2005) — the
    OVERestimate companion of stream_misra_gries_topk: where MG reports
    lower bounds, SpaceSaving reports est >= true >= est - err and
    conserves the stream length (sum of counts == N). k=8 > 5 distinct
    types keeps this run in the exact regime (err == 0, counts exact) so
    the oracle is the exact counts; the evicting regime's guarantees
    (conservation, overestimate, N/k error, heavy-item survival) are
    property-tested in tests/test_state_sketches.py on the same core."""
    k = 8
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("item"),
    )
    out = run_available_now(stateful.space_saving_state(keyed, k=k), "append")
    w_shard = Window.partitionBy("shard")
    latest = out.withColumn("max_seq", F.max("seq").over(w_shard)).filter(
        F.col("seq") == F.col("max_seq")
    )
    merged = latest.groupBy("item").agg(
        F.sum("ss_count").cast("long").alias("est_count"),
        F.sum("ss_err").cast("long").alias("err_bound"),
    )
    w = Window.orderBy(F.desc("est_count"), "item")
    return (
        merged.select(
            "item",
            "est_count",
            "err_bound",
            (F.col("est_count") - F.col("err_bound")).cast("long").alias(
                "guaranteed_min"
            ),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


@query(
    "stream_ols_trend",
    oracle="""
    -- the streamed fit == the batch fit: per-type OLS of event value on
    -- day index, from the SAME five exact integer sufficient statistics
    -- (y carried as its exact 6-decimal scaled integer), closed form as
    -- one double chain. Integer addition is a commutative monoid, so the
    -- online fold provably can't differ.
    WITH r AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(CAST(ROUND(value, 6) AS DECIMAL(28,6)) * 1000000 AS BIGINT)
               AS y6
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y6) AS BIGINT) AS sy6,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y6) AS BIGINT) AS sxy6
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * (sxy6 / 1000000.0) - sx * (sy6 / 1000000.0))
                 / (n * sxx - sx * sx * 1.0), 8) AS slope_per_day,
           ROUND(((sy6 / 1000000.0)
                  - (n * (sxy6 / 1000000.0) - sx * (sy6 / 1000000.0))
                    / (n * sxx - sx * sx * 1.0) * sx) / n, 6) AS intercept
    FROM s ORDER BY event_type
    """,
)
def stream_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online least-squares trend per event type: the state store carries
    five exact integers per key (n, sum x, scaled sum y, sum x^2, scaled
    sum xy) and the final coefficients HASH-EQUAL the batch OLS — model
    fitting as a mergeable-monoid aggregate, the shape that lets a
    1000-executor stream maintain thousands of per-key regressions
    without ever re-reading history. y rides as its exact 6-decimal
    scaled integer so no float ever enters the state."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        F.col("event_type").alias("key"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        (F.round("value", 6).cast("decimal(28,6)") * 1000000)
        .cast("long")
        .alias("y6"),
    )
    out = run_available_now(stateful.ols_sufficient_stats(keyed), "append")
    w_key = Window.partitionBy("key")
    latest = out.withColumn("max_seq", F.max("seq").over(w_key)).filter(
        F.col("seq") == F.col("max_seq")
    )
    n, sx = F.col("n"), F.col("sx")
    sy = F.col("sy6") / 1000000.0
    sxy = F.col("sxy6") / 1000000.0
    slope = (n * sxy - sx * sy) / (n * F.col("sxx") - sx * sx * 1.0)
    return latest.select(
        F.col("key").alias("event_type"),
        "n",
        F.round(slope, 8).alias("slope_per_day"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("event_type")


@query("stream_eh_window_sum", witness="stream_eh_saturated_exact")
def stream_eh_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-histogram sliding-window SUM (Datar et al. SICOMP 2002
    §5) — DGIM generalized from bits to bounded positive integers: the
    trailing 10-day total of purchase value units, answered from
    O(k·log(W·R)) power-of-two buckets per shard instead of raw history
    (values insert as their binary decomposition; >k buckets of a size
    merge oldest-first). Rows-only (bucket cascades aren't SQL); the
    construction bound |est-true| <= oldest_bucket/2 is emitted IN the
    result and the core's invariants are property-tested. Shard estimates
    and their error bounds ADD."""
    window_us = 10 * 24 * 3600 * 1_000_000
    k = 4
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", F.round("value").cast("long"))
        .otherwise(F.lit(0))
        .alias("val"),
    )
    ests = stateful.eh_window_sum(keyed, window_us=window_us, k=k)
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(
            F.struct("n_buckets", "oldest_size", "est_window_sum"), "seq"
        ).alias("s")
    )
    agg = last.agg(
        F.sum("s.est_window_sum").cast("long").alias("est_sum"),
        F.sum("s.oldest_size").cast("long").alias("err_bound_x2"),
        F.sum("s.n_buckets").cast("long").alias("n_buckets_total"),
    )
    ev = load(spark, sf_dir, "events")
    exact = (
        ev.crossJoin(F.broadcast(ev.agg(F.max(F.unix_micros("ts")).alias("now"))))
        .filter(
            (F.col("event_type") == "purchase")
            & (F.unix_micros("ts") > F.col("now") - window_us)
        )
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("exact_sum"))
    )
    return agg.crossJoin(F.broadcast(exact)).select(
        "est_sum",
        "exact_sum",
        "n_buckets_total",
        (
            F.abs(F.col("est_sum") - F.col("exact_sum"))
            <= F.col("err_bound_x2") / 2
        ).alias("within_eh_bound"),
    )


@query(
    "stream_eh_saturated_exact",
    oracle="""
    -- Exponential-histogram exactness witness (the histogram_numeric /
    -- LSH / IVF full-coverage trick applied to the EH): with unit values
    -- and k >= the stream's total insert count, no bucket merge can ever
    -- fire, so every bucket stays size 1 — the estimator's oldest-bucket
    -- straddle term is floor(1/2) = 0 and eviction is per-exact-timestamp,
    -- making the EH estimate EQUAL the exact trailing-window count. Each
    -- shard's 'now' is the max event time that shard has seen (the
    -- operator tracks it from ALL rows, purchases or not).
    WITH e AS (
      SELECT user_id % 8 AS shard, epoch_us(ts) AS ts_us, event_type
      FROM events WHERE user_id < 100
    ),
    m AS (SELECT shard, MAX(ts_us) AS now FROM e GROUP BY shard)
    SELECT m.shard,
           CAST(SUM(CASE WHEN e.event_type = 'purchase'
                          AND e.ts_us > m.now - 864000000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS purchases_10d
    FROM e JOIN m ON e.shard = m.shard
    GROUP BY m.shard
    """,
)
def stream_eh_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EH/DGIM exactness witness: the same eh_window_sum state machinery
    as stream_eh_window_sum, run in the SATURATED regime — unit values
    (count semantics) and k sized to the slice's total purchase count (a
    one-scalar pre-pass, so saturation holds BY CONSTRUCTION at any SF,
    the histogram_numeric_saturated_exact discipline). No merge ever
    fires, every bucket is size 1, the oldest-bucket straddle term is 0,
    and eviction uses exact timestamps, so the streaming estimate must
    hash-equal the exact SQL trailing-10-day count per shard. The
    approximate regime of the SAME code path stays covered by
    stream_eh_window_sum / stream_dgim_window_count's in-result bound
    checks and the property tests."""
    window_us = 10 * 24 * 3600 * 1_000_000
    ev = load(spark, sf_dir, "events")
    n_purch = int(
        ev.filter((F.col("user_id") < 100) & (F.col("event_type") == "purchase"))
        .count()
    )
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("user_id") < 100).select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "purchase").cast("long").alias("val"),
    )
    ests = stateful.eh_window_sum(keyed, window_us=window_us, k=max(n_purch, 1))
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(F.col("est_window_sum"), "seq").cast("long").alias("purchases_10d")
    )
    return last.select("shard", "purchases_10d")


@query(
    "stream_dgim_saturated_exact",
    oracle="""
    -- DGIM exactness witness (the stream_eh_saturated_exact discipline
    -- applied to the OTHER sliding-window sketch): with the paper's
    -- accuracy knob opened to max_per_size >= the slice's total click
    -- count (Datar-Gionis-Indyk-Motwani §5 — ceil(1/r)+1 buckets per
    -- size trades state for error r/2), no power-of-two merge can ever
    -- fire, every bucket stays size 1, the oldest-bucket straddle term
    -- is floor(1/2) = 0, and eviction drops exact timestamps — so the
    -- DGIM estimate EQUALS the exact trailing-10-day click count per
    -- shard. Each shard's 'now' is the max event time that shard saw
    -- (the operator tracks it from ALL rows, clicks or not).
    WITH e AS (
      SELECT user_id % 8 AS shard, epoch_us(ts) AS ts_us, event_type
      FROM events WHERE user_id < 100
    ),
    m AS (SELECT shard, MAX(ts_us) AS now FROM e GROUP BY shard)
    SELECT m.shard,
           CAST(SUM(CASE WHEN e.event_type = 'click'
                          AND e.ts_us > m.now - 864000000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS clicks_10d
    FROM e JOIN m ON e.shard = m.shard
    GROUP BY m.shard
    ORDER BY m.shard
    """,
)
def stream_dgim_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DGIM exactness witness: the same dgim_window_count state machinery
    as stream_dgim_window_count, run in the SATURATED regime — the bucket
    capacity (the paper's ceil(1/r)+1 knob, default 2) is derived from a
    one-scalar pre-pass as the slice's total click count, so no merge can
    fire at ANY scale factor (the histogram_numeric_saturated_exact
    discipline). All buckets stay size 1, the straddle term is 0, and
    eviction is per-exact-timestamp, so the streaming estimate must
    hash-equal the exact SQL trailing-window count per shard. The regime
    is asserted in-result (n_buckets == estimate holds iff every bucket
    is size 1); the merging regime of the SAME code path stays covered by
    stream_dgim_window_count's in-result <=50% bound check and
    tests/test_state_sketches.py."""
    window_us = 10 * 24 * 3600 * 1_000_000
    ev = load(spark, sf_dir, "events")
    n_clicks = int(
        ev.filter((F.col("user_id") < 100) & (F.col("event_type") == "click"))
        .count()
    )
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("user_id") < 100).select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "click").cast("long").alias("bit"),
    )
    ests = stateful.dgim_window_count(
        keyed, window_us=window_us, max_per_size=max(n_clicks, 2)
    )
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("n_buckets", "est_window_ones"), "seq").alias("s")
    )
    rows = last.select("shard", "s.n_buckets", "s.est_window_ones").collect()
    assert all(r["n_buckets"] == r["est_window_ones"] for r in rows), (
        "witness regime broken: a DGIM merge fired (bucket size > 1) — "
        "max_per_size must cover the slice's total click count"
    )
    return spark.createDataFrame(
        sorted((int(r["shard"]), int(r["est_window_ones"])) for r in rows),
        "shard long, clicks_10d long",
    ).orderBy("shard")


@query(
    "stream_sbf_decayless_exact",
    oracle="""
    -- Stable-Bloom exactness witness: with the decay rate p_dec = 0 the
    -- SBF degenerates to a classical Bloom filter (cells are set to
    -- cell_max and never decremented), so false NEGATIVES are impossible
    -- by construction; false positives are ruled out by an in-query
    -- pre-pass that checks every distinct key owns at least one cell no
    -- other key touches (m = 65536 per shard keeps the fill fraction
    -- ~0.6% on the slice). Flagged duplicates are then EXACTLY the
    -- repeated (user, event_type) arrivals per shard.
    WITH e AS (
      SELECT user_id % 8 AS shard, user_id, event_type
      FROM events WHERE user_id < 200
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_seen,
           CAST(COUNT(*) - COUNT(DISTINCT user_id || '|' || event_type)
                AS BIGINT) AS dups_flagged
    FROM e GROUP BY shard ORDER BY shard
    """,
)
def stream_sbf_decayless_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-Bloom exactness witness: the same stable_bloom_dedup state
    machinery as stream_stable_bloom_dedup with the decay turned OFF
    (p_dec=0) — the regime where Deng-Rafiei's controlled-false-negative
    trade collapses to a plain Bloom filter, so the only error source
    left is hash collisions, and those are excluded by an asserted
    pre-pass: every distinct key in the slice owns at least one private
    cell (no other key hashes to it), so a first arrival can never find
    all its cells set. With both error sources provably off, the flagged
    duplicate count per shard must hash-equal the exact repeated-pair
    count. The decaying regime of the SAME code path stays rows-only in
    stream_stable_bloom_dedup with its zero-fraction stability readout
    and tests/test_state_sketches.py."""
    m_cells, kh = 65536, 3
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    chk = ev.agg(
        F.countDistinct(F.struct("user_id", "event_type")).alias("pairs"),
        F.countDistinct(F.xxhash64("user_id", "event_type")).alias("keys"),
    ).first()
    assert chk["pairs"] == chk["keys"], (
        "witness regime broken: xxhash64 collided two distinct "
        "(user, event_type) pairs"
    )
    shard_keys = (
        ev.select(
            (F.col("user_id") % 8).alias("shard"),
            F.xxhash64("user_id", "event_type").alias("key"),
        )
        .distinct()
        .collect()
    )
    by_shard: dict[int, list[int]] = {}
    for r in shard_keys:
        by_shard.setdefault(int(r["shard"]), []).append(int(r["key"]))
    for keys in by_shard.values():
        pos = [np.unique(stateful._sbf_positions(x, kh, m_cells)) for x in keys]  # noqa: SLF001
        usage = np.zeros(m_cells, dtype=np.int64)
        for p in pos:
            usage[p] += 1
        assert all((usage[p] == 1).any() for p in pos), (
            "witness regime broken: a key owns no private cell — enlarge m"
        )
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("user_id") < 200).select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.xxhash64("user_id", "event_type").alias("key"),
    )
    out = run_available_now(
        stateful.stable_bloom_dedup(keyed, m=m_cells, kh=kh, p_dec=0), "append"
    )
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("n_seen", "n_dups_flagged"), "seq").alias("s")
    )
    return last.select(
        "shard",
        F.col("s.n_seen").cast("long").alias("n_seen"),
        F.col("s.n_dups_flagged").cast("long").alias("dups_flagged"),
    ).orderBy("shard")


@query("stream_stable_bloom_dedup", witness="stream_sbf_decayless_exact")
def stream_stable_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-Bloom-filter duplicate detection (Deng & Rafiei, SIGMOD
    2006): flags repeated (user, event_type) pairs over an unbounded
    stream in EXACTLY m 2-bit-ish counters per shard forever — the
    clock-free alternative to the generational Bloom (which rotates on
    event time): every arrival decays p random cells, so the zero
    fraction converges to a stationary value and memory never grows.
    Rows-only (the SBF trades a controlled false-negative rate for
    boundedness, so no exact twin exists); the result carries the flagged
    vs exact duplicate counts and the per-shard zero-fraction spread, and
    tests/test_state_sketches.py pins the core's properties."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.xxhash64("user_id", "event_type").alias("key"),
    )
    out = run_available_now(stateful.stable_bloom_dedup(keyed), "append")
    last = out.groupBy("shard").agg(
        F.max_by(
            F.struct("n_dups_flagged", "n_seen", "zero_frac_x1e6"), "seq"
        ).alias("s")
    )
    agg = last.agg(
        F.sum("s.n_dups_flagged").cast("long").alias("dups_flagged"),
        F.sum("s.n_seen").cast("long").alias("n_seen"),
        F.min("s.zero_frac_x1e6").cast("long").alias("zero_frac_min_x1e6"),
        F.max("s.zero_frac_x1e6").cast("long").alias("zero_frac_max_x1e6"),
    )
    ev = load(spark, sf_dir, "events")
    exact = ev.groupBy("user_id", "event_type").agg(
        (F.count(F.lit(1)) - 1).alias("d")
    ).agg(F.sum("d").cast("long").alias("exact_dups"))
    return agg.crossJoin(F.broadcast(exact)).select(
        "n_seen",
        "dups_flagged",
        "exact_dups",
        "zero_frac_min_x1e6",
        "zero_frac_max_x1e6",
    )


@query(
    "stream_dedup_within_watermark",
    oracle="""
    -- exact twin: with the dedup horizon covering the whole fixture span,
    -- dropDuplicatesWithinWatermark keeps exactly one row per
    -- (user_id, event_type) pair — the distinct pair count per type.
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_unique_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state via
    ``dropDuplicatesWithinWatermark`` — the Spark 3.5+ API whose whole
    point is that dedup state EXPIRES with the watermark instead of
    growing forever (plain dropDuplicates keys state on everything ever
    seen). Here the 40-day delay exceeds the fixture span so semantics
    are exact and the oracle is the distinct pair count; in production
    the delay is the dedup horizon and state is O(keys within horizon) —
    the watermark-native sibling of the generational/stable Bloom
    operators, exact where they are approximate."""
    src = events_stream_source(spark, sf_dir)
    deduped = (
        src.withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_users")
    )
    out = run_available_now(counts, "complete")
    return out.orderBy("event_type")


@query(
    "stream_kll_saturated_exact",
    oracle="""
    -- streaming twin of kll_quantiles_exact_witness: capacity exceeds the
    -- stream (no compactor fires through sf0.1), so the sharded state
    -- sketches hold every value, the merge is lossless, and the rank
    -- convention answers EXACT order statistics — the full streaming path
    -- (per-shard applyInPandasWithState, serialization, shard merge)
    -- under the value hash.
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    v AS (SELECT value, COUNT(*) AS c FROM events GROUP BY value),
    w AS (
      SELECT value,
             CAST(SUM(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM v
    ),
    qs AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS q)
    SELECT qs.q,
           ROUND((SELECT MIN(w.value) FROM w CROSS JOIN n
                  WHERE w.cum >= CEIL(qs.q * n.n)), 6) AS quantile_value
    FROM qs ORDER BY qs.q
    """,
)
def stream_kll_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming KLL exactness witness: the same sharded
    kll_quantile_state path as stream_kll_quantiles with k=262144 (>
    stream size through sf0.1, so no compaction ever fires) — state
    sketches hold every observed value, the shard merge is lossless, and
    the merged quantiles must hash-equal exact SQL order statistics. The
    compacting regime stays rows-only in stream_kll_quantiles with its
    in-result realized-rank audit."""
    from decimal import ROUND_HALF_UP, Decimal

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.kll import (
        KLLSketch,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.sketch_queries import (
        _KLL_QS,
    )

    src = events_stream_source(spark, sf_dir)
    keyed = src.select((F.col("user_id") % 8).alias("shard"), "event_id", "value")
    out = run_available_now(stateful.kll_quantile_state(keyed, k=262144), "append")
    last = out.groupBy("shard").agg(F.max_by("sketch", "seq").alias("sketch"))
    merged = KLLSketch(k=262144, seed=99)
    for r in sorted(last.collect(), key=lambda r: r["shard"]):  # 8 blobs
        merged.merge(KLLSketch.from_bytes(bytes(r["sketch"])))
    rows = []
    for q in _KLL_QS:
        est = merged.quantile(q)
        rows.append(
            (
                q,
                float(
                    Decimal(repr(est)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                ),
            )
        )
    return spark.createDataFrame(rows, "q double, quantile_value double").orderBy("q")


@query("stream_kll_quantiles", witness="stream_kll_saturated_exact")
def stream_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE KLL quantiles (the streaming twin of
    kll_quantile_sketch_table): each shard maintains an O(k log n)-float
    comparison-based sketch in the state store; the read side merges the
    8 shard summaries (mergeable-summary algebra — sketches travel,
    values never re-shuffle) and audits every estimate against the exact
    in-plan quantile with its realized rank error. Rows-only (seeded
    compaction isn't SQL); core guarantees in tests/test_kll.py."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.kll import (
        KLLSketch,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.sketch_queries import (
        _KLL_QS,
    )

    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"), "event_id", "value"
    )
    out = run_available_now(stateful.kll_quantile_state(keyed, k=200), "append")
    last = out.groupBy("shard").agg(F.max_by("sketch", "seq").alias("sketch"))
    merged = KLLSketch(k=200, seed=99)
    for r in sorted(last.collect(), key=lambda r: r["shard"]):  # 8 blobs
        merged.merge(KLLSketch.from_bytes(bytes(r["sketch"])))
    ests = spark.createDataFrame(
        [(q, merged.quantile(q)) for q in _KLL_QS], "q double, est double"
    )
    ev = load(spark, sf_dir, "events")
    n_df = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w = v.select("value", F.sum("c").over(w_cum).cast("long").alias("cum"))
    ranked = (
        ests.crossJoin(F.broadcast(n_df))
        .join(
            w.withColumnRenamed("value", "v2").withColumnRenamed("cum", "cum2"),
            F.col("v2") <= F.col("est"),
        )
        .groupBy("q", "est", "n")
        .agg(F.max("cum2").alias("rank_est"))
    )
    return ranked.select(
        "q",
        F.round("est", 6).alias("kll_estimate"),
        F.round(
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n"),
            6,
        ).alias("rank_err_frac"),
        (
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n")
            <= 0.02
        ).alias("within_bound"),
    ).orderBy("q")


def _triest_edge_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation trade-edge stream: lineitem replays as micro-batches and
    STREAM-STATIC joins against orders/customer/supplier derive the same
    (src, dst) edges as the batch triangle query — the composition a
    production edge stream would use (facts stream, dims are static)."""
    li = table_stream_source(spark, sf_dir, "lineitem", "l_orderkey")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    d = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(supp.s_nationkey != cust.c_nationkey)
        .select(
            li.l_orderkey.alias("ord"),
            supp.s_nationkey.alias("src"),
            cust.c_nationkey.alias("dst"),
        )
    )
    raw = d.select(
        F.lit(0).cast("long").alias("shard"),
        "ord",
        (
            F.least("src", "dst") * 25 + F.greatest("src", "dst")
        ).cast("long").alias("code"),
    )

    # Stateless per-partition dedupe BEFORE the shuffle to the graph-global
    # state: the raw pair stream is fact-table-sized, but the code domain
    # is <= 625, so map-side reduction caps what reaches the single state
    # partition at O(codes x partitions) per batch instead of O(lineitem)
    # — without it the stateful task ingests every joined row and the 10x
    # stress ratio was 5.9x (measured); with it the stage is flat.
    # min(ord) per code keeps the fold order deterministic (the state op
    # sorts by (ord, code) and first-seen-dedupes).
    def _partition_dedupe(batches):
        for pdf in batches:
            if len(pdf):
                yield pdf.groupby("code", as_index=False).agg(
                    shard=("shard", "first"), ord=("ord", "min")
                )[["shard", "ord", "code"]]

    return raw.mapInPandas(_partition_dedupe, "shard long, ord long, code long")


@query("stream_triest_saturated_exact", oracle=__import__(
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.graph_queries",
    fromlist=["_TRI_ORACLE"],
)._TRI_ORACLE)
def stream_triest_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIEST exactness witness (streaming graph analytics under the
    value hash): the same triest_triangle_state path as
    stream_triest_triangles with the reservoir capacity far above the
    nation graph's maximum possible edge count (25*24/2 = 300, an
    SF-independent domain bound) — no eviction coin is ever flipped
    (asserted: sample_size == t_seen), the sampled edge set IS the exact
    edge set, and the incremental common-neighbor counters reproduce
    per-nation triangle participation exactly, so the final table must
    hash-equal the BATCH triangle query's own oracle. The estimating
    regime of the SAME core stays rows-only in stream_triest_triangles
    with its in-result exact comparison and the seed-swept unbiasedness
    property test."""
    edges = _triest_edge_stream(spark, sf_dir)
    out = run_available_now(
        stateful.triest_triangle_state(edges, m_cap=2000, n_nodes=25),
        "append",
        state_partitions=1,
    )
    last = out.groupBy("node").agg(
        F.max_by(F.struct("t_seen", "sample_size", "tri_count"), "seq").alias("s")
    )
    rows = last.select(
        "node",
        F.col("s.t_seen").alias("t"),
        F.col("s.sample_size").alias("m"),
        F.col("s.tri_count").alias("c"),
    ).collect()
    assert rows and all(r["t"] == r["m"] for r in rows), (
        "witness regime broken: TRIEST evicted an edge — the nation "
        "domain bound (300 edges) exceeded m_cap"
    )
    nation = load(spark, sf_dir, "nation")
    counts = spark.createDataFrame(
        [(int(r["node"]), int(r["c"])) for r in rows], "node long, n_triangles long"
    )
    return (
        counts.join(nation, counts.node == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "n_triangles")
        .orderBy("nation")
    )


@query("stream_triest_triangles", witness="stream_triest_saturated_exact")
def stream_triest_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE triangle counting with bounded memory (TRIEST-base, De
    Stefani et al. KDD 2016): a 64-edge reservoir over the unbounded
    trade-edge stream — the streaming-graph-analytics member of the
    state family. The read side applies the paper's unbiased scale
    factor t(t-1)(t-2)/(M(M-1)(M-2)) and the result carries the exact
    batch count for the realized-error readout (the reference's
    exact-vs-approx identity). Rows-only (reservoir coins aren't SQL);
    unbiasedness over 30 seeds and the saturated-exact regime are
    pinned in tests/test_state_sketches.py."""
    m_cap = 64
    edges = _triest_edge_stream(spark, sf_dir)
    out = run_available_now(
        stateful.triest_triangle_state(edges, m_cap=m_cap, n_nodes=25),
        "append",
        state_partitions=1,
    )
    last = out.groupBy("node").agg(
        F.max_by(F.struct("t_seen", "sample_size", "tri_count"), "seq").alias("s")
    )
    agg = last.agg(
        F.max("s.t_seen").alias("t"),
        F.max("s.sample_size").alias("m"),
        (F.sum("s.tri_count") / 3).alias("sampled_tris"),
    ).first()
    t, m = int(agg["t"]), int(agg["m"])
    scale = max(
        1.0, (t * (t - 1) * (t - 2)) / (m_cap * (m_cap - 1) * (m_cap - 2))
    ) if t > 2 else 1.0
    est = float(agg["sampled_tris"]) * scale
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.graph_queries import (
        triangle_count_trade,
    )

    exact = (
        triangle_count_trade(spark, sf_dir)
        .agg((F.sum("n_triangles") / 3).cast("long").alias("g"))
        .first()["g"]
    )
    return spark.createDataFrame(
        [
            (
                t,
                m,
                round(est, 1),
                int(exact),
                round(abs(est - exact) / max(exact, 1), 4),
            )
        ],
        "t_arrivals long, sample_size long, triest_estimate double, "
        "exact_triangles long, rel_err double",
    )


@query("stream_adwin_drift", witness="stream_adwin_stationary_exact")
def stream_adwin_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADWIN adaptive-window drift detection (Bifet-Gavalda, SDM 2007) on
    the per-shard purchase-rate signal: the canonical "window size
    chooses itself" detector completing the drift family (Page-Hinkley /
    CUSUM / SPRT all need a tuned horizon; ADWIN keeps the longest
    window whose halves are statistically indistinguishable, in
    O(M log W) state). Rows-only (the Hoeffding cut cascade isn't SQL);
    the result carries each shard's final window length vs its total
    arrivals (equal iff no cut fired — the fixture's purchase flow is
    stationary, so detections are expected to be 0, which IS the
    false-alarm contract delta bounds), and the core's detection /
    no-false-alarm / exact-totals properties are pinned in
    tests/test_state_sketches.py."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("event_type") == "purchase").cast("double").alias("bit"),
    )
    out = run_available_now(stateful.adwin_drift_state(keyed), "append")
    last = out.groupBy("shard").agg(
        F.max_by(
            F.struct("window_n", "window_sum_x1e6", "n_detections"), "seq"
        ).alias("s")
    )
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy((F.col("user_id") % 8).alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("total_n")
    )
    return (
        last.join(totals, "shard")
        .select(
            "shard",
            F.col("s.window_n").alias("window_n"),
            "total_n",
            F.round(
                F.col("s.window_sum_x1e6") / 1_000_000 / F.col("s.window_n"), 6
            ).alias("window_purchase_rate"),
            F.col("s.n_detections").alias("n_detections"),
            (F.col("s.window_n") == F.col("total_n")).alias("window_covers_all"),
        )
        .orderBy("shard")
    )


@query(
    "stream_adwin_stationary_exact",
    oracle="""
    -- ADWIN exactness witness: on a CONSTANT signal every split of the
    -- window has identical half-means, so the Hoeffding cut |mu0 - mu1|
    -- > eps can never fire (asserted: 0 detections) — and because the
    -- DGIM-style bucket merges preserve count and sum EXACTLY, the final
    -- window length per shard must equal the shard's total arrival
    -- count. Pins the no-false-alarm contract AND the exact-totals
    -- bucket algebra through the full streaming path.
    SELECT user_id % 8 AS shard, CAST(COUNT(*) AS BIGINT) AS window_n
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY shard
    """,
)
def stream_adwin_stationary_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADWIN exactness witness: the same adwin_drift_state path as
    stream_adwin_drift fed the degenerate constant signal (bit = 1.0 on
    the purchase substream) — the regime where no cut can fire by
    construction, so the adaptive window must cover every arrival and
    its exactly-merged (count, sum) totals are SQL-checkable. Asserts 0
    detections and sum == n in-query; the detecting regime of the SAME
    core is pinned by the shift/stationary/chunking property tests."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(1.0).alias("bit"),
    )
    out = run_available_now(stateful.adwin_drift_state(keyed), "append")
    last = out.groupBy("shard").agg(
        F.max_by(
            F.struct("window_n", "window_sum_x1e6", "n_detections"), "seq"
        ).alias("s")
    )
    rows = last.select(
        "shard",
        F.col("s.window_n").alias("window_n"),
        F.col("s.window_sum_x1e6").alias("ws"),
        F.col("s.n_detections").alias("nd"),
    ).collect()
    assert all(r["nd"] == 0 for r in rows), (
        "witness regime broken: ADWIN cut fired on a constant signal"
    )
    assert all(r["ws"] == r["window_n"] * 1_000_000 for r in rows), (
        "witness regime broken: bucket merges lost count/sum exactness"
    )
    return spark.createDataFrame(
        sorted((int(r["shard"]), int(r["window_n"])) for r in rows),
        "shard long, window_n long",
    ).orderBy("shard")


@query(
    "stream_tdigest_saturated_exact",
    oracle="""
    -- streaming twin of tdigest_saturated_exact: delta = 4n (count
    -- pre-pass on the slice) keeps every k1 bin under 2/n, so neither the
    -- per-batch state folds nor the shard merge ever combines two points
    -- — the merged digest holds every value as a singleton (asserted) and
    -- midpoint interpolation equals exact order-statistic interpolation.
    -- frac is written tgt - (0.5 + i) in both engines (shared rounding).
    WITH v AS (
      SELECT CAST(value AS DOUBLE) AS value FROM events WHERE user_id < 40
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
    s AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1 AS i FROM v),
    qs AS (SELECT unnest([0.05, 0.25, 0.5, 0.75, 0.95]) AS q),
    sel AS (
      SELECT qs.q, qs.q * n.n AS tgt,
             CAST(FLOOR(qs.q * n.n - 0.5) AS BIGINT) AS i
      FROM qs CROSS JOIN n
    )
    SELECT sel.q,
           ROUND(CASE
             WHEN sel.tgt <= 0.5 THEN (SELECT value FROM s WHERE i = 0)
             WHEN sel.tgt >= n.n - 0.5
               THEN (SELECT value FROM s ORDER BY i DESC LIMIT 1)
             ELSE a.value + (sel.tgt - (0.5 + CAST(sel.i AS DOUBLE)))
                  * (b.value - a.value)
           END, 6) AS quantile_value
    FROM sel CROSS JOIN n
    LEFT JOIN s a ON a.i = sel.i
    LEFT JOIN s b ON b.i = sel.i + 1
    ORDER BY sel.q
    """,
)
def stream_tdigest_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming t-digest exactness witness: the same sharded
    tdigest_quantile_state path as stream_tdigest_quantiles in the
    SATURATED regime — delta = 4n from a one-scalar pre-pass means no
    merging pass (per-batch fold OR shard merge) ever combines points;
    the all-singletons state is asserted, and the merged quantiles must
    hash-equal SQL order-statistic interpolation. The full streaming
    machinery (applyInPandasWithState, serde, shard merge) sits under
    the value hash; the compressing regime stays rows-only in
    stream_tdigest_quantiles with its realized-rank audit."""
    from decimal import ROUND_HALF_UP, Decimal

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.tdigest import (
        TDigest,
    )

    ev = load(spark, sf_dir, "events")
    n = int(ev.filter(F.col("user_id") < 40).count())
    assert n >= 2, "witness regime broken: slice too small"
    delta = 4 * n
    src = events_stream_source(spark, sf_dir)
    keyed = src.filter(F.col("user_id") < 40).select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    out = run_available_now(
        stateful.tdigest_quantile_state(keyed, compression=delta), "append"
    )
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("means", "weights"), "seq").alias("s")
    )
    merged = TDigest(delta)
    for r in sorted(last.collect(), key=lambda r: r["shard"]):
        merged.merge(
            TDigest.from_bytes(delta, bytes(r["s"]["means"]), bytes(r["s"]["weights"]))
        )
    assert merged.total == n and merged.is_saturated(), (
        "witness regime broken: a t-digest merge combined points — "
        "delta must stay >= ~pi*n"
    )
    rows = [
        (
            q,
            float(
                Decimal(repr(merged.quantile(q))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for q in (0.05, 0.25, 0.5, 0.75, 0.95)
    ]
    return spark.createDataFrame(rows, "q double, quantile_value double").orderBy(
        "q"
    )


@query("stream_tdigest_quantiles", witness="stream_tdigest_saturated_exact")
def stream_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE t-digest quantiles (the streaming twin of
    tdigest_quantile_sketch_table, symmetric with stream_kll_quantiles):
    each shard maintains an O(compression)-centroid digest in the state
    store; the read side merges the 8 shard summaries and audits every
    estimate against the exact in-plan rank. Rows-only (centroid arrays
    aren't SQL); core guarantees in tests/test_tdigest.py. The k1 scale
    function makes the p99 row the one to watch — that's where this
    sketch beats same-memory KLL."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.tdigest import (
        TDigest,
    )

    delta = 100
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    out = run_available_now(
        stateful.tdigest_quantile_state(keyed, compression=delta), "append"
    )
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("means", "weights"), "seq").alias("s")
    )
    merged = TDigest(delta)
    for r in sorted(last.collect(), key=lambda r: r["shard"]):
        merged.merge(
            TDigest.from_bytes(delta, bytes(r["s"]["means"]), bytes(r["s"]["weights"]))
        )
    ests = spark.createDataFrame(
        [(q, merged.quantile(q)) for q in (0.5, 0.9, 0.99)], "q double, est double"
    )
    ev = load(spark, sf_dir, "events")
    n_df = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w = v.select("value", F.sum("c").over(w_cum).cast("long").alias("cum"))
    ranked = (
        ests.crossJoin(F.broadcast(n_df))
        .join(
            w.withColumnRenamed("value", "v2").withColumnRenamed("cum", "cum2"),
            F.col("v2") <= F.col("est"),
        )
        .groupBy("q", "est", "n")
        .agg(F.max("cum2").alias("rank_est"))
    )
    return ranked.select(
        "q",
        F.round("est", 6).alias("tdigest_estimate"),
        F.round(
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n"),
            6,
        ).alias("rank_err_frac"),
        (
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n")
            <= 0.02
        ).alias("within_bound"),
    ).orderBy("q")


@query(
    "stream_hierarchical_heavy_hitters",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.sketch_queries",
        fromlist=["_HHH_ORACLE"],
    )._HHH_ORACLE,
)
def stream_hierarchical_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical heavy hitters maintained ONLINE: each micro-batch folds
    its (day, hour) counts into sharded state-store histograms (shard =
    content hash of the leaf, so every leaf lives in exactly one shard and
    the state is calendar-bounded — 365*24 longs/shard/year regardless of
    volume); after the stream drains, the merged last-emission histograms
    feed the SAME discounted-HHH lattice as the batch query, so the online
    answer hash-equals the batch scan and shares its oracle. This is the
    streaming twin of hierarchical_heavy_hitters — the drill-down alarm
    running continuously without ever re-reading history."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.sketch_queries import (
        hhh_lattice,
    )

    src = (
        events_stream_source(spark, sf_dir)
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("hr", F.hour("ts").cast("long"))
        .withColumn(
            "shard", F.pmod(F.xxhash64("day", "hr"), F.lit(8)).cast("long")
        )
    )
    out = run_available_now(
        stateful.streaming_leaf_histogram(src, "day", "hr"), "append"
    )
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select("day", "hr", "c")
    )
    return hhh_lattice(last)


_MONITORING_ORACLE = """
    -- Online model-monitoring funnel, batch twin: the four monitors a
    -- deployed purchase-propensity score publishes continuously.
    -- (1) exact tie-averaged rank ROC AUC over round(value,1) scores
    --     (stream_roc_auc's integer rank machinery);
    -- (2) PSI of the score distribution between the fixed reference
    --     period (before 2024-01-16 UTC) and the live period, over 10
    --     fixed score bins with +0.5 Laplace smoothing so empty bins
    --     stay finite and engine-exact (term-ROUND@10 -> DECIMAL sum
    --     absorbs last-bit ln() differences, the psi_feature_drift
    --     pattern);
    -- (3) the positive-rate drift pair (ref vs live);
    -- (4) the Page-Hinkley daily drift monitor's alarm count and max
    --     statistic (the stream_page_hinkley cascade, aggregated).
    WITH v AS (
      SELECT ROUND(value, 1) AS score, COUNT(*) AS c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT c, c1,
             COALESCE(CAST(SUM(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS s
      FROM v
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n0
      FROM v
    ),
    agg AS (
      SELECT CAST(SUM(c1 * (2 * s + c + 1)) AS BIGINT) AS two_r1 FROM w
    ),
    hist AS (
      SELECT CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END AS h,
             LEAST(CAST(FLOOR(CAST(ROUND(value * 10) AS BIGINT) / 500)
               AS BIGINT), 9) AS bin,
             COUNT(*) AS c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1
      FROM events GROUP BY 1, 2
    ),
    binagg AS (
      SELECT bin,
             CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN h = 1 THEN c ELSE 0 END) AS BIGINT) AS cl
      FROM hist GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS t0, CAST(SUM(cl) AS BIGINT) AS t1
      FROM binagg
    ),
    psi AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
             ROUND(CAST(SUM(CAST(ROUND(
               ((c0 + 0.5) / (t0 + 5.0) - (cl + 0.5) / (t1 + 5.0))
               * ln(((c0 + 0.5) / (t0 + 5.0)) / ((cl + 0.5) / (t1 + 5.0))),
               10) AS DECIMAL(28,10))) AS DOUBLE), 6) AS psi
      FROM binagg CROSS JOIN tot
    ),
    rates AS (
      SELECT h, CAST(SUM(c) AS BIGINT) AS n_h,
             ROUND(SUM(c1) * 1.0 / SUM(c), 6) AS rate
      FROM hist GROUP BY h
    ),
    ph AS ({ph_oracle}),
    phagg AS (
      SELECT CAST(SUM(CASE WHEN first_alarm_day IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_alarm,
             ROUND(MAX(max_ph), 6) AS mx
      FROM ph
    )
    SELECT 'roc_auc' AS metric, n.n1 AS n,
           ROUND((agg.two_r1 - n.n1 * (n.n1 + 1)) / (2.0 * n.n1 * n.n0), 6)
             AS value
    FROM agg CROSS JOIN n
    UNION ALL SELECT 'psi_score_halves', n_bins, psi FROM psi
    UNION ALL SELECT 'purchase_rate_ref', n_h, rate FROM rates WHERE h = 0
    UNION ALL SELECT 'purchase_rate_live', n_h, rate FROM rates WHERE h = 1
    UNION ALL SELECT 'ph_drift_alarms', n_alarm, mx FROM phagg
    ORDER BY metric
"""


@query(
    "stream_model_monitoring_funnel",
    oracle=_MONITORING_ORACLE.format(
        ph_oracle=__import__(
            "bloom_filters_count_min_sketch_spark_streaming_spark.plans.quality_queries",
            fromlist=["PH_ORACLE"],
        ).PH_ORACLE
    ),
)
def stream_model_monitoring_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE MODEL MONITORING as one composite — the at-rest/mergeable-
    state architecture of stream_corpus_release_funnel generalized from
    corpus hygiene to model observability. One pass over the event stream
    maintains TWO mergeable state layers and the post-drain report
    publishes four monitors:

    - streaming_score_histogram keyed by an INTEGER-ENCODED (period,
      score) key — h*100000 + round(value*10), exact in int64 and in the
      state's float keys — so ONE histogram state powers (1) the exact
      tie-averaged ROC AUC over the full stream (stream_roc_auc's rank
      arithmetic), (2) the PSI between the fixed reference period
      (< 2024-01-16 UTC) and live traffic over 10 fixed score bins
      (+0.5 smoothing keeps empty bins finite), and (3) the positive-
      rate drift pair. The integer encoding follows first_seen_flags'
      exactness contract: composite keys pack into one int64, never a
      hashed string.
    - the Page-Hinkley day histograms contribute (4) the daily-mean
      drift walk, aggregated to its alarm count and max statistic.

    Both layers ride ONE streaming query via monitoring_mux_state (r11):
    group key (mux, gkey) dispatches each group to its layer's exact
    standalone fold, so the composite pays a single micro-batch floor.

    Every monitor is a pure function of mergeable per-shard sufficient
    statistics (plain sums / O(days) day histograms), so state stays
    O(distinct scores + days) forever and the report is recomputable at
    any point of an unbounded stream — continuous evaluation without
    storing one raw event. Hash-checked against the composed batch
    cascade (AUC + smoothed PSI + rates + the PH oracle)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.quality_queries import (
        PH_LAMBDA,
    )

    cut_us = 1705363200000000  # 2024-01-16 00:00 UTC

    # ONE pass, ONE streaming query (r11: the two state layers ride a
    # keyspace-multiplexed stateful operator — see monitoring_mux_state):
    # 'h' rows feed the (period, score) histogram shards, 'p' rows feed
    # the per-type Page-Hinkley day histograms. Folds are bit-identical
    # to the standalone operators, so the oracle is untouched.
    src = events_stream_source(spark, sf_dir)
    enc = (
        F.when(F.unix_micros("ts") >= cut_us, 100000).otherwise(0)
        + F.round(F.col("value") * 10).cast("long")
    ).cast("double")
    h_rows = src.select(
        F.lit("h").alias("mux"),
        F.pmod(F.xxhash64(enc), F.lit(8)).cast("string").alias("gkey"),
        enc.alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
        F.lit(None).cast("string").alias("day"),
    )
    p_rows = src.select(
        F.lit("p").alias("mux"),
        F.col("event_type").alias("gkey"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("long").alias("y"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    muxed = run_available_now(
        stateful.monitoring_mux_state(h_rows.unionByName(p_rows), PH_LAMBDA),
        "append",
    )
    out = muxed.filter(F.col("mux") == "h").select(
        F.col("gkey").cast("long").alias("shard"), "seq", "score", "c", "c1"
    )
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select(
            F.floor(F.col("score") / 100000).cast("long").alias("h"),
            (F.col("score") % 100000).cast("long").alias("si"),
            "c",
            "c1",
        )
    )

    # (1) ROC AUC over the full stream (si ordering == score ordering)
    full = last.groupBy("si").agg(
        F.sum("c").cast("long").alias("c"), F.sum("c1").cast("long").alias("c1")
    )
    w_prev = Window.orderBy("si").rowsBetween(Window.unboundedPreceding, -1)
    wdf = full.select(
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w_prev).cast("long"), F.lit(0)).alias("s"),
    )
    nn = full.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"),
    )
    two_r1 = wdf.agg(
        F.sum(F.col("c1") * (2 * F.col("s") + F.col("c") + 1))
        .cast("long")
        .alias("two_r1")
    )
    auc_row = two_r1.crossJoin(F.broadcast(nn)).select(
        F.lit("roc_auc").alias("metric"),
        F.col("n1").alias("n"),
        F.round(
            (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
            / (2.0 * F.col("n1") * F.col("n0")),
            6,
        ).alias("value"),
    )

    # (2) smoothed PSI between the reference and live periods
    binagg = last.groupBy(
        F.least(F.floor(F.col("si") / 500), F.lit(9)).cast("long").alias("bin")
    ).agg(
        F.sum(F.when(F.col("h") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("h") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("cl"),
    )
    tot = binagg.agg(
        F.sum("c0").cast("long").alias("t0"), F.sum("cl").cast("long").alias("t1")
    )
    p = (F.col("c0") + 0.5) / (F.col("t0") + 5.0)
    q = (F.col("cl") + 0.5) / (F.col("t1") + 5.0)
    psi_row = (
        binagg.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(
                    F.round((p - q) * F.log(p / q), 10).cast("decimal(28,10)")
                ).cast("double"),
                6,
            ).alias("value"),
        )
        .select(F.lit("psi_score_halves").alias("metric"), "n", "value")
    )

    # (3) positive-rate drift, reference vs live
    rates = last.groupBy("h").agg(
        F.sum("c").cast("long").alias("n"),
        F.round(F.sum("c1") * 1.0 / F.sum("c"), 6).alias("value"),
    )
    rate_rows = rates.select(
        F.when(F.col("h") == 0, "purchase_rate_ref")
        .otherwise("purchase_rate_live")
        .alias("metric"),
        "n",
        "value",
    )

    # (4): the Page-Hinkley daily drift monitor — same muxed run
    out2 = muxed.filter(F.col("mux") == "p").select(
        F.col("gkey").alias("key"), "seq", "n_days", "max_ph", "first_alarm_day"
    )
    wk = Window.partitionBy("key").orderBy(F.col("seq").desc())
    ph_last = (
        out2.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("max_ph", "first_alarm_day")
    )
    ph_row = ph_last.agg(
        F.sum(F.col("first_alarm_day").isNotNull().cast("long"))
        .cast("long")
        .alias("n"),
        F.round(F.max("max_ph"), 6).alias("value"),
    ).select(F.lit("ph_drift_alarms").alias("metric"), "n", "value")

    return (
        auc_row.unionByName(psi_row)
        .unionByName(rate_rows)
        .unionByName(ph_row)
        .orderBy("metric")
    )


@query(
    "stream_page_hinkley",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.quality_queries",
        fromlist=["PH_ORACLE"],
    ).PH_ORACLE,
)
def stream_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Page-Hinkley drift monitor maintained ONLINE — the
    streaming member of the drift family between the EWMA chart and the
    CUSUM changepoint: O(days) histogram state per key, the PH walk
    re-derived each batch with the exact Decimal arithmetic of the batch
    query's ROUND@8 -> DECIMAL window sums. The last emission per key
    hash-equals page_hinkley_drift, which is the oracle."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.quality_queries import (
        PH_LAMBDA,
    )

    src = events_stream_source(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = run_available_now(
        stateful.streaming_page_hinkley(src, "event_type", "day", PH_LAMBDA),
        "append",
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "n_days", "max_ph", "first_alarm_day")
        .orderBy("key")
    )


@query(
    "stream_roc_auc",
    oracle="""
    -- batch twin of the ONLINE AUC: exact tie-averaged rank AUC of
    -- "is this event a purchase?" scored by the rounded event value —
    -- the same integer rank machinery as roc_auc_doc_length, over the
    -- support the streaming histogram maintains.
    WITH v AS (
      SELECT ROUND(value, 1) AS score, COUNT(*) AS c,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS c1
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT c, c1,
             COALESCE(CAST(SUM(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS s
      FROM v
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c - c1) AS BIGINT) AS n0
      FROM v
    ),
    agg AS (
      SELECT CAST(SUM(c1 * (2 * s + c + 1)) AS BIGINT) AS two_r1 FROM w
    )
    SELECT n.n1 AS n_pos, n.n0 AS n_neg,
           ROUND((agg.two_r1 - n.n1 * (n.n1 + 1)) / (2.0 * n.n1 * n.n0), 6)
             AS auc
    FROM agg CROSS JOIN n
    """,
)
def stream_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC maintained ONLINE: the per-distinct-score (count, positives)
    histogram is a mergeable sufficient statistic for rank AUC, so each
    shard keeps O(distinct scores) longs in the state store and the exact
    tie-averaged AUC is recomputed from merged last emissions after the
    stream drains — continuous model evaluation without storing a single
    raw score, hash-equal to the batch rank computation (the oracle).
    Scores are rounded to 0.1 so the support (and the state) is bounded."""
    src = (
        events_stream_source(spark, sf_dir)
        .withColumn("score", F.round("value", 1))
        .withColumn("y", (F.col("event_type") == "purchase").cast("long"))
        .withColumn(
            "shard", F.pmod(F.xxhash64("score"), F.lit(8)).cast("long")
        )
    )
    out = run_available_now(
        stateful.streaming_score_histogram(src, "score", "y"), "append"
    )
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select("score", "c", "c1")
    )
    w_prev = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w = last.select(
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w_prev).cast("long"), F.lit(0)).alias("s"),
    )
    n = last.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"),
    )
    agg = w.agg(
        F.sum(F.col("c1") * (2 * F.col("s") + F.col("c") + 1))
        .cast("long")
        .alias("two_r1")
    )
    u1_x2 = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    return agg.crossJoin(F.broadcast(n)).select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(u1_x2 / (2.0 * F.col("n1") * F.col("n0")), 6).alias("auc"),
    )


@query(
    "stream_python_datasource_sink",
    oracle="""
    -- batch twin of the custom Python STREAMING sink: per-micro-batch
    -- (type, day) count rows written through bfcms_jsondir across the
    -- whole stream must sum back to the direct per-type totals.
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """writeStream through a CUSTOM Python DataSourceStreamWriter (the
    Spark 4 streaming-write contract: per-partition committed JSON-lines
    files plus a per-batch success marker): each micro-batch appends its
    (type, day) counts in update mode; reading the committed files back
    and summing must reproduce the batch per-type totals regardless of
    how many micro-batches the file replay produced. Completes the
    custom-connector matrix — batch read, streaming read, batch write,
    streaming write — all four through the Python DataSource API."""
    import os
    import tempfile

    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.pysource import (
        JsonDirSinkDataSource,
    )

    spark.dataSource.register(JsonDirSinkDataSource)
    src = events_stream_source(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    counts = src.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        tmp_snapshot_dir as _snapdir,
    )

    out = _snapdir("bfcms_pystream_sink_")
    ckpt = _snapdir("bfcms_pystream_ckpt_")
    # at the session's 32 shuffle partitions every micro-batch spins up 32
    # Python writer commits for a ~40-row aggregate; 4 keeps the
    # per-partition writer contract exercised at a sane fan-out
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            counts.writeStream.format("bfcms_jsondir")
            .outputMode("complete")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    # complete mode rewrites the whole aggregate each batch: keep only the
    # files of the LAST committed batch
    batches = sorted(
        int(f.split("_")[2])
        for f in os.listdir(out)
        if f.startswith("_BATCH_") and f.endswith("_SUCCESS")
    )
    assert batches, "no committed micro-batch"
    back = spark.read.schema("event_type STRING, day STRING, c BIGINT").json(
        os.path.join(out, "stream-*.json")
    )
    # complete-mode emissions accumulate one snapshot per batch; the final
    # snapshot per (type, day) is the max c (counts only grow)
    final = back.groupBy("event_type", "day").agg(F.max("c").alias("c"))
    return (
        final.groupBy("event_type")
        .agg(F.sum("c").cast("long").alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "stream_lossy_counting_topk",
    oracle="""
    -- streaming Lossy Counting in the exact regime: eps=1e-6 makes the
    -- bucket width larger than any shard's substream, so no boundary
    -- prune ever fires and the merged per-shard summaries are the exact
    -- global counts.
    SELECT event_type AS item, COUNT(*) AS lc_count,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS BIGINT) AS rnk
    FROM events GROUP BY event_type ORDER BY rnk
    """,
)
def stream_lossy_counting_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE Lossy Counting heavy hitters — the third classic counter
    summary beside the Misra-Gries and SpaceSaving twins (subtract /
    overwrite / PRUNE-at-bucket-boundary deletion policies; together they
    cover the deterministic heavy-hitter design space the reference's CMS
    approximates probabilistically). eps=1e-6 keeps this run in the exact
    regime (oracle = exact counts); the pruning regime's f >= f_true -
    eps*N guarantee is pinned by tests/test_state_sketches-style property
    tests on the pure core."""
    src = events_stream_source(spark, sf_dir)
    keyed = src.select(
        (F.col("user_id") % 8).alias("shard"), F.col("event_type").alias("item")
    )
    out = run_available_now(
        stateful.lossy_counting_state(keyed, eps=1e-6), "append"
    )
    w_shard = Window.partitionBy("shard")
    latest = out.withColumn("max_seq", F.max("seq").over(w_shard)).filter(
        F.col("seq") == F.col("max_seq")
    )
    merged = latest.groupBy("item").agg(
        F.sum("lc_value").cast("long").alias("lc_count")
    )
    wm = Window.orderBy(F.desc("lc_count"), "item")
    return (
        merged.withColumn("rnk", F.row_number().over(wm).cast("long"))
        .select("item", "lc_count", "rnk")
        .orderBy("rnk")
    )


@query(
    "stream_vocab_coverage",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.text_queries",
        fromlist=["GT_ORACLE"],
    ).GT_ORACLE,
)
def stream_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing/Chao1 vocabulary coverage maintained ONLINE — the
    "is the crawl still finding new words" monitor running continuously:
    documents stream in doc_id order, each micro-batch's tokens fold into
    sharded (source, term) count dictionaries in the state store (shard =
    content hash, so every vocabulary entry has exactly one owner and the
    per-source frequency-of-frequency partials are additive across
    shards); the merged last emissions feed the SAME estimator fold as
    the batch query, so the online answer hash-equals
    good_turing_vocab_coverage and shares its oracle.

    Scale shape: token counting partial-aggregates map-side inside each
    batch before hitting the 8-shard state exchange; state grows with
    DISTINCT vocabulary (Heaps-sublinear), never token volume — the
    reference's 'sketch state over micro-batches' discipline applied to
    the coverage estimator."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import (
        text as T,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.text_queries import (
        gt_estimates,
    )

    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    toks = src.select(
        "source", F.explode(T.word_tokens(F.col("text"))).alias("term")
    ).withColumn(
        "shard", F.pmod(F.xxhash64("source", "term"), F.lit(8)).cast("long")
    )
    out = run_available_now(stateful.streaming_vocab_coverage(toks), "append")
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select("source", "n_tokens", "v_observed", "n1", "n2")
    )
    return gt_estimates(last)


# --- streaming CMS join-size estimation ---------------------------------------

_JS_EPS, _JS_CONF, _JS_SEED = 0.001, 0.99, 42
_JS_SHARD_BITS = 10


def stream_numpy_cms_sketches(
    spark: SparkSession,
    sf_dir: str,
    specs: list[tuple[str, str, str]],
    eps: float = _JS_EPS,
    confidence: float = _JS_CONF,
    seed: int = _JS_SEED,
):
    """Maintain one NumpyCMS per (table, key_col, order_col) spec ONLINE —
    all in a SINGLE streaming query — and return the assembled sketches.

    Rows map to (counter position, +1) deltas in an Arrow batch
    (pre-aggregated with bincount, so the state exchange carries at most
    DISTINCT-touched-counter rows per batch — the CLAUDE.md
    O(distinct x depth) delta rule); each spec's positions are OFFSET into
    a disjoint shard range of one global counter array, so the union of
    the per-table delta streams folds through one sharded_counter_state
    run (8 KB dense blocks, abelian deltas) instead of one streaming query
    per table — N tables cost max(batches) micro-batch floors, not
    sum(batches) (the r10 verdict's write-fusion discipline applied to
    sketch maintenance). The last block per shard reassembles EXACTLY the
    arrays a batch build produces — counters are an abelian monoid, so the
    result is batch-split AND union-interleave invariant (asserted
    bit-for-bit in tests/test_streaming.py)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        NumpyCMS,
    )

    proto = NumpyCMS.from_params(eps, confidence, seed)
    depth, width = proto.depth, proto.width
    n_pos = depth * width
    block = 1 << _JS_SHARD_BITS
    shards_per = (n_pos + block - 1) // block
    span = shards_per << _JS_SHARD_BITS  # shard-aligned per-spec offset
    row_off = (np.arange(depth, dtype=np.int64) * width)[:, None]

    src = None
    for i, (table, key_col, order_col) in enumerate(specs):
        part = (
            table_stream_source(spark, sf_dir, table, order_col)
            .select(F.col(key_col).cast("long").alias("k"))
            .filter(F.col("k").isNotNull())
            .withColumn("off", F.lit(i * span).cast("long"))
        )
        src = part if src is None else src.unionByName(part)

    def to_deltas(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = pdf["k"].to_numpy(dtype=np.int64)
            off = pdf["off"].to_numpy(dtype=np.int64)
            pos = ((row_off + proto._buckets(v)) + off[None, :]).ravel()
            agg = np.bincount(pos, minlength=0)
            touched = np.nonzero(agg)[0]
            yield pd.DataFrame(
                {
                    "pos": touched.astype(np.int64),
                    "d": agg[touched].astype(np.int64),
                }
            )

    deltas = src.mapInPandas(to_deltas, "pos long, d long").withColumn(
        "shard", F.shiftright("pos", _JS_SHARD_BITS).cast("long")
    )
    out = run_available_now(
        stateful.sharded_counter_state(deltas, shard_bits=_JS_SHARD_BITS), "append"
    )
    last = out.groupBy("shard").agg(
        F.max_by("counters", "seq").alias("counters")
    ).collect()  # bounded: O(specs x n_counters/8KB) shard blocks
    flat = np.zeros(len(specs) * span, dtype=np.int64)
    for r in last:
        base = int(r["shard"]) << _JS_SHARD_BITS
        arr = np.frombuffer(bytes(r["counters"]), dtype=np.int64)
        end = min(base + block, len(flat))
        flat[base:end] = arr[: end - base]
    sketches = []
    for i in range(len(specs)):
        sk = NumpyCMS.from_params(eps, confidence, seed)
        sk.table = flat[i * span : i * span + n_pos].reshape(depth, width)
        sk.total = int(sk.table[0].sum())
        sketches.append(sk)
    return sketches


def stream_numpy_cms(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key_col: str,
    order_col: str,
    eps: float = _JS_EPS,
    confidence: float = _JS_CONF,
    seed: int = _JS_SEED,
):
    """Single-table convenience wrapper over stream_numpy_cms_sketches."""
    return stream_numpy_cms_sketches(
        spark, sf_dir, [(table, key_col, order_col)], eps, confidence, seed
    )[0]


@query(
    "stream_cms_join_size",
    oracle="""
    -- the Spark side maintains BOTH key sketches online (sharded counter
    -- state), computes the CM-2005 inner-product join-size estimate from
    -- the drained state, and asserts the guarantees as data: the estimate
    -- NEVER underestimates (algebraic: every per-row dot >= the true
    -- inner product) and stays within exact + eps*|A|*|B| (probabilistic
    -- at confidence 0.99; verified on the deterministic fixtures at
    -- sf0.001/0.01/0.1).
    SELECT (SELECT CAST(COUNT(*) AS BIGINT)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey) AS exact_size,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS lineitem_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS orders_rows,
           TRUE AS overestimates,
           TRUE AS within_bound
    """,
)
def stream_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two CMS sketches maintained ONLINE
    — the reference's sketch-over-micro-batches discipline applied to the
    planner-statistics primitive: lineitem and orders keys stream in as
    micro-batches, each folds into a sharded global counter array in the
    state store (8 KB dense blocks, bincount-preaggregated deltas), and
    when the streams drain, est(|A join B|) = min_i dot(rowA_i, rowB_i)
    (Cormode & Muthukrishnan 2005 §4.2) comes straight off the final
    state — sizing a fact-fact join WITHOUT running it, continuously.

    The streamed counter arrays are bit-identical to a batch build
    (abelian merge; asserted in tests/test_streaming.py), so the batch
    twin cms_join_size_estimate and this query agree by construction.
    Output pins the exact size plus both guarantee assertions."""
    sk_a, sk_b = stream_numpy_cms_sketches(
        spark,
        sf_dir,
        [("lineitem", "l_orderkey", "l_orderkey"), ("orders", "o_orderkey", "o_orderkey")],
    )
    per_row = (sk_a.table.astype(object) * sk_b.table.astype(object)).sum(axis=1)
    est = int(per_row.min())

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    exact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    n_a, n_b = li.count(), orders.count()
    bound = exact + _JS_EPS * n_a * n_b
    return spark.createDataFrame(
        [(exact, n_a, n_b, bool(est >= exact), bool(est <= bound))],
        "exact_size bigint, lineitem_rows bigint, orders_rows bigint, "
        "overestimates boolean, within_bound boolean",
    )


@query(
    "stream_winnowing_contamination",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.dedup_queries",
        fromlist=["WINNOW_FIRST_SEEN_ORACLE"],
    ).WINNOW_FIRST_SEEN_ORACLE,
)
def stream_winnowing_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint contamination gate running ONLINE — the
    deterministic (seedless) sibling of stream_minhash_lsh_dedup with a
    STRONGER check: because winnowing is a pure md5 construction, the
    streaming first-seen output is fully SQL-expressible and hash-checked
    (the LSH variant's xxhash signatures are rows-only). Documents stream
    in doc_id order; each batch computes its fingerprints per row
    (mapInPandas — the per-doc window-min needs no cross-row state) and a
    stateful first-seen index (one int64 per occupied fingerprint) flags
    every doc presenting a fingerprint an earlier doc owns. Guarantee
    carried over from winnowing: any shared run >= w+k-1 words WILL
    collide — ingest-time plagiarism/contamination detection that can't
    be fooled by re-positioning.

    Scale shape: fingerprinting is 100% map-only JVM array expressions
    (winnow_doc_fingerprints — the SAME construction the batch overlap
    query runs): gram hash, w-wide sliding min via ``least`` over shifted
    key-array slices, per-doc distinct — nothing crosses an Arrow
    boundary and no Python runs at all; only the selected fingerprints
    (density 2/(w+1) of gram volume) are exploded into the stateful
    stage. State is O(distinct fingerprints) int64s forever; each batch
    shuffles only its own (fingerprint) rows."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.dedup_queries import (
        winnow_doc_fingerprints,
    )

    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    fp = winnow_doc_fingerprints(src, id_col="doc_id").withColumn(
        "band", F.lit(0).cast("long")
    )
    flags = stateful.first_seen_flags(fp)
    out = run_available_now(flags, "append")
    return (
        out.groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("owner").cast("long").alias("first_owner"),
        )
        .select(F.col("doc").alias("doc_id"), "n_hits", "first_owner")
        .orderBy("doc_id")
    )


@query(
    "stream_decision_stump",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.eval_queries",
        fromlist=["_stump_oracle"],
    )._stump_oracle(),
)
def stream_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training maintained ONLINE (the Hoeffding-tree/VFDT
    state discipline applied to the batch trainer): documents stream in,
    each micro-batch folds its (n_chars, quality label) rows into sharded
    value-histograms in the state store — the split-finding sufficient
    statistic, value-support bounded like every histogram-based GBDT —
    and the drained state feeds the SAME Gini fold as the batch query, so
    the online split hash-equals decision_stump_quality and shares its
    oracle. The streaming trainer never revisits history: the model
    statistic is O(distinct feature values) no matter the stream length."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.eval_queries import (
        stump_labeled_features,
        stump_split_from_counts,
    )

    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    d = stump_labeled_features(src).withColumn(
        "shard", F.pmod(F.xxhash64("x"), F.lit(8)).cast("long")
    )
    out = run_available_now(stateful.streaming_xy_histogram(d), "append")
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select("x", "c", "p")
    )
    return stump_split_from_counts(last)


@query(
    "stream_priority_sample",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ROUND(n_chars::DOUBLE * 4294967296.0
                   / (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1),
                   4) AS priority
      FROM documents
    )
    SELECT doc_id, n_chars, priority
    FROM s ORDER BY priority DESC, doc_id LIMIT 50
    """,
)
def stream_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup) maintained ONLINE — the
    ingest-time weighted sample: every arriving document computes its
    hash-derived priority w/u map-side, sharded state keeps each shard's
    running top-50 (top-k is a mergeable monoid, so k rows of state per
    shard, volume-independent), and the merged last emissions reproduce
    the batch TakeOrdered sample EXACTLY — same oracle as
    priority_sample_docs. The sample of an unbounded stream is always
    available, never recomputed."""
    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    u_int = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    pri = F.round(
        F.col("n_chars").cast("double") * F.lit(4294967296.0) / u_int.cast("double"),
        4,
    )
    d = src.select(
        "doc_id", "n_chars", pri.alias("priority")
    ).withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("long"))
    out = run_available_now(stateful.streaming_topk_priority(d, k=50), "append")
    last = (
        out.withColumn("mseq", F.max("seq").over(Window.partitionBy("shard")))
        .filter(F.col("seq") == F.col("mseq"))
        .select("doc_id", "n_chars", "priority")
    )
    return last.orderBy(F.desc("priority"), "doc_id").limit(50)


# --- streaming corpus-release funnel (incremental at-rest release pipeline) ---


@query(
    "stream_corpus_release_funnel",
    oracle=__import__(
        "bloom_filters_count_min_sketch_spark_streaming_spark.plans.pipeline_queries",
        fromlist=["RELEASE_FUNNEL_ORACLE"],
    ).RELEASE_FUNNEL_ORACLE,
)
def stream_corpus_release_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM release cascade running as an INGEST PIPELINE — the
    streaming twin of llm_corpus_release_e2e, sharing its oracle: the
    funnel a batch release audit produces must be reproducible by a
    stream that saw the corpus one micro-batch at a time. Documents
    replay in doc_id order; each micro-batch runs the stage gates
    incrementally against AT-REST state tables (the foreachBatch +
    incremental-index architecture — Structured Streaming's blessed
    pattern for multi-stage stateful pipelines that one chained plan
    can't express):

    - S1 contamination: per-batch anti-join against the STATIC eval
      8-gram set (benchmarks are static artifacts; broadcast once).
    - S2 exact dedup: batch-local first-per-content-hash (row_number
      window, one job fused with S1), after an anti-join against the
      at-rest seen-hash table. Doc-ordered arrival makes first-seen ==
      global min, so decisions equal the batch cascade's.
    - S3 Jaccard >= 0.8: within-batch inverted-index pairs UNION pairs of
      (at-rest S2-survivor shingles x new docs) — every (a < b) pair is
      generated exactly once, so the drop set equals the batch one.
      The index stores ALL S2 survivors (a doc dropped in S3 can still
      drop later docs — the batch pair rule is over S2).
    - S4 SemDeDup: same split — within-batch pairs + at-rest S3-survivor
      embeddings, cluster-scoped, ROUND(cos, 6) >= 0.45; prior ids are
      always lower, matching the lower-id-wins keep rule.
    - S5 quality gates: per-row, stateless.
    - S6 temperature mixture runs POST-DRAIN over the accumulated live
      set: the mixture rate depends on final language counts, so it is a
      terminal cut of the release, not a per-batch gate (the batch twin
      computes it over full s5 for the same reason).

    The funnel accumulates per micro-batch (each stage carries an
    observe() audit node per batch, mirroring the batch composite's
    CollectMetrics checkpoints) and the output is the SAME 8-row funnel,
    hash-checked against the SAME DuckDB cascade oracle.

    Scale shape: every at-rest table is a VERSIONED parquet increment,
    and each stage snapshot doubles as its state table (4 writes per
    batch, each carrying its funnel tallies as Observations): the raw
    and decontaminated tallies ride S2's write (S1+S2 fused), S2's kept
    h column IS the seen-hash index, the shingle index rows carry
    per-doc set sizes, S3's snapshot carries survivor (label, embedding)
    and IS the SemDeDup index (pairs scored per label by blocked GEMM,
    not a pair-row join), and S4+S5 fuse into the live write. State sizes: hashes O(docs), shingles
    O(corpus shingles), embeddings O(docs x dim), live O(docs x 3 cols);
    per batch the work is (batch x index) equi-joins — the
    inverted-index/cluster bounds of the batch stages carry over, nothing
    rescans history, and no state lives on the driver beyond 12 funnel
    counters. Retry-safe by construction: at-rest reads exclude
    increments >= the current batch_id, pair joins guard doc_a < doc_b
    rather than assuming at-rest ids are lower, and funnel tallies are
    keyed per (stage, batch) so a redelivered micro-batch overwrites its
    failed attempt instead of double-counting. Divergence caveat: S3
    computes the exact (uncapped) Jaccard — identical to the oracle by
    construction and to the batch Spark twin wherever the hot-shingle df
    cap is inactive (everywhere at fixture scales)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import (
        similarity,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.similarity import (
        _as_double_array,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.pipeline_queries import (
        _RELEASE_SEQ_LEN,
    )

    import os as _osenv
    import sys as _sys
    import time as _time

    _profile = bool(_osenv.environ.get("BFCMS_FUNNEL_PROFILE"))
    _tq = _time.time()

    def _qmark(label: str) -> None:
        nonlocal _tq
        if _profile:
            with open("/tmp/funnel_prof.txt", "a") as _fh:
                _fh.write(f"{label}: {_time.time() - _tq:.2f}s\n")
        _tq = _time.time()

    emb_static = load(spark, sf_dir, "embeddings")
    docs_static = load(spark, sf_dir, "documents")
    eval8 = (
        docs_static.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(dedup.shingles_col(F.col("text"), 8)).alias("s"))
        .distinct()
        .persist()
    )
    eval8.count()  # materialize the static gate once, before the stream starts
    _qmark("eval8_build")

    # RAM-backed snapshot root when available: the cascade pays 5 snapshot
    # writes + re-reads per micro-batch by design (lineage truncation +
    # at-rest state), so page-cache-speed commits matter; production
    # points this root at durable storage — a config choice, same as
    # runner._ephemeral_ckpt
    _shm = "/dev/shm" if _os.path.isdir("/dev/shm") else None
    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        tmp_snapshot_dir as _snapdir,
    )

    root = _snapdir("bfcms_release_stream_", dir=_shm)

    # Manifest-style VERSIONED increments, not a shared append dir: a
    # parquet append to a path fires refreshByPath, which recursively
    # invalidates every cached plan reading that path — the current
    # batch's own gate results would then lazily re-evaluate against
    # state that already contains their own output (observed: every doc
    # from batch 1 on deduped against itself -> empty stages). Reads
    # enumerate the EXISTING inc_* dirs explicitly AND filter to
    # increment < current batch_id, so a retried micro-batch (foreachBatch
    # redelivery after a mid-batch failure, or a future checkpoint
    # restart) never sees its own failed attempt's increment as prior
    # state; its mode=overwrite write then rebuilds the increment — the
    # actual exactly-once contract (same as runner.versioned_merge_upsert).

    def _read(name: str, schema: str, before: int | None = None) -> DataFrame:
        base = _os.path.join(root, name)
        incs = []
        for p in _glob.glob(_os.path.join(base, "inc_*")):
            b = int(_os.path.basename(p).split("_", 1)[1])
            if before is None or b < before:
                incs.append((b, p))
        if not incs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*(p for _, p in sorted(incs)))

    def _append(df: DataFrame, name: str, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            _os.path.join(root, name, f"inc_{batch_id}")
        )

    # stages 0..5 tally per micro-batch: {(stage_i, batch_id): (docs, toks)}
    # — keyed ASSIGNMENT, not +=, so a redelivered batch_id overwrites its
    # failed attempt's tallies instead of double-counting them.
    tallies: dict = {}

    def _obs(name: str, batch_id: int):
        from pyspark.sql import Observation

        return Observation(f"release_stream_{name}_{batch_id}")

    def _settle(obs, stage_i: int, batch_id: int) -> None:
        row = obs.get
        tallies[(stage_i, batch_id)] = (int(row["d"]), int(row["t"]))

    _FUNNEL_METRICS = (
        F.count(F.lit(1)).cast("long").alias("d"),
        F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("t"),
    )

    def _snap(df: DataFrame, name: str, batch_id: int, stage_i: int,
              schema: str) -> DataFrame:
        """Materialize a per-batch stage once and re-plan downstream
        against the snapshot — the same deliberate lineage truncation as
        the batch twin: chained in-batch lineage plus the growing at-rest
        reads made Catalyst re-analyze the whole cascade tree on every
        action. The funnel tally rides the write job as an Observation
        (a CollectMetrics audit node in the executed plan), so each stage
        costs exactly ONE job. Snapshots land in versioned inc_{batch}
        dirs so a stage table can double as at-rest state (S2's h column
        IS the seen-hash index) and retries stay self-contained."""
        obs = _obs(name, batch_id)
        p = _os.path.join(root, name, f"inc_{batch_id}")
        df.observe(obs, *_FUNNEL_METRICS).write.mode("overwrite").parquet(p)
        _settle(obs, stage_i, batch_id)
        return spark.read.schema(schema).parquet(p)

    _DOC_SCHEMA = "doc_id long, lang string, source string, text string, n_tok long"

    def _stage_batch(batch_df: DataFrame, batch_id: int) -> None:
        # a micro-batch is one replay file -> one partition; repartition
        # before the per-row CPU stages (shingle, md5, ratio scans)
        _t0 = _time.time()

        def _mark(label: str) -> None:
            nonlocal _t0
            if _profile:
                with open("/tmp/funnel_prof.txt", "a") as _fh:
                    _fh.write(
                        f"b{batch_id} {label}: {_time.time() - _t0:.2f}s\n"
                    )
            _t0 = _time.time()
        tok_cols = [
            F.col("doc_id"),
            F.col("lang"),
            F.col("source"),
            F.col("text"),
            F.size(dedup.tokens_col(F.col("text"))).cast("long").alias("n_tok"),
        ]
        dp = spark.sparkContext.defaultParallelism

        # S1+S2 FUSED into ONE write: the raw, decontaminated, and
        # exact-dedup tallies ride a single linear plan (three
        # CollectMetrics nodes, obs_raw below the eval filter, obs_s1
        # above the contamination anti-join, obs_s2 at the top via _snap)
        # — the old separate s1 snapshot existed only to feed S2, and
        # S2's batch-local min-id used a groupBy+self-join that
        # referenced the S1 subtree twice; a row_number window over the
        # content hash keeps exactly the same winner (doc_id is unique,
        # min == rn 1) with a single reference, so the whole chain stays
        # linear and costs one job instead of two.
        # The gram-explode side rebuilds its projection from batch_df
        # rather than sharing the observed subtree — a duplicated
        # CollectMetrics node would double-count the raw tally.
        obs0 = _obs("raw", batch_id)
        obs1 = _obs("decontaminated", batch_id)
        left = (
            batch_df.repartition(dp)
            .select(*tok_cols)
            .observe(obs0, *_FUNNEL_METRICS)
            .filter(F.col("doc_id") % 97 != 0)
        )
        cont = (
            batch_df.repartition(dp)
            .filter(F.col("doc_id") % 97 != 0)
            .select(
                "doc_id", F.explode(dedup.shingles_col(F.col("text"), 8)).alias("s")
            )
            .join(F.broadcast(eval8), "s")
            .select("doc_id")
            .distinct()
        )
        s1_chain = (
            left.join(cont, "doc_id", "left_anti")
            .observe(obs1, *_FUNNEL_METRICS)
        )

        # S2: content-hash first-seen (batch-local rn=1 per hash, then
        # at-rest index). The snapshot KEEPS the h column: since exactly
        # one winner per distinct fresh hash survives, the s2 snapshots'
        # h column IS the seen-hash index — no separate hashes table.
        seen = _read("s2", "h string", before=batch_id)
        fresh = s1_chain.withColumn("h", F.md5(F.lower("text"))).join(
            seen, "h", "left_anti"
        )
        w2 = Window.partitionBy("h").orderBy("doc_id")
        s2_b = _snap(
            fresh.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") == 1)
            .drop("_rn"),
            "s2", batch_id, 2,
            _DOC_SCHEMA + ", h string",
        ).drop("h")
        _settle(obs0, 0, batch_id)
        _settle(obs1, 1, batch_id)
        _mark("s1_s2")

        # S3: exact 3-gram Jaccard vs within-batch + at-rest S2 shingles.
        # Read handles to the OLD increments (before=batch_id) are taken
        # before this batch's increment is written; the batch's own
        # shingles are then written once and read back as the within-batch
        # side (snapshot role and index increment are the same bytes).
        # Each index row carries the doc's shingle-set size n, so set
        # sizes travel with the equi-join — no separate sizes table.
        idx = _read("shingle_idx", "doc long, sh string, n long", before=batch_id)
        w3 = Window.partitionBy("doc")
        _append(
            dedup.doc_shingle_sets(s2_b, "doc_id", "text", 3).withColumn(
                "n", F.count(F.lit(1)).over(w3).cast("long")
            ),
            "shingle_idx",
            batch_id,
        )
        sets_b = spark.read.schema("doc long, sh string, n long").parquet(
            _os.path.join(root, "shingle_idx", f"inc_{batch_id}")
        )
        _mark("s3_idx_write")
        a_w = sets_b.select(F.col("doc").alias("doc_a"), "sh", F.col("n").alias("na"))
        b_w = sets_b.select(F.col("doc").alias("doc_b"), "sh", F.col("n").alias("nb"))
        within = a_w.join(b_w, "sh").filter(F.col("doc_a") < F.col("doc_b"))
        # at-rest ids are strictly lower under doc-ordered replay, but the
        # a < b guard must not REST on that: a retried batch (or any
        # future out-of-order source) would otherwise pair docs with
        # themselves at Jaccard 1 and silently drop them
        cross = (
            idx.select(F.col("doc").alias("doc_a"), "sh", F.col("n").alias("na"))
            .join(b_w, "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
        )
        # EXACT size gate ahead of the pair aggregation: J >= 0.8 forces
        # c >= (4/9)(na+nb) and c <= min(na,nb), hence 4*max <= 5*min —
        # integer arithmetic, no float boundary. Prunes size-incompatible
        # candidate rows BEFORE they shuffle into the (doc_a, doc_b) agg
        # (the standard prefix-filtering size bound; at corpus scale most
        # inverted-index candidates fail it).
        common = (
            within.unionByName(cross)
            .filter(
                F.lit(4) * F.greatest("na", "nb") <= F.lit(5) * F.least("na", "nb")
            )
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).cast("long").alias("c"),
                F.max("na").alias("na"),
                F.max("nb").alias("nb"),
            )
        )
        jdrop = (
            common.filter(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.8)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        # The s3 snapshot carries each survivor's (label, embedding) as
        # extra columns — the embedding index rows ARE the S3 survivors,
        # so the stage snapshot doubles as the at-rest embedding index
        # (exactly like S2's h column and S3's shingle increments); docs
        # without an embedding ride with NULLs and simply can't pair.
        emb_lk = emb_static.select(
            "vec_id", "label", _as_double_array("embedding").alias("v")
        )
        s3_b = _snap(
            s2_b.join(jdrop, "doc_id", "left_anti")
            .join(emb_lk, F.col("doc_id") == F.col("vec_id"), "left")
            .drop("vec_id"),
            "s3",
            batch_id,
            3,
            _DOC_SCHEMA + ", label int, v array<double>",
        )
        _mark("s3_pairs_snap")

        # S4: SemDeDup vs within-batch + at-rest S3-survivor embeddings
        # (old-increment handles taken before this batch's s3 increment
        # was written; the increment itself is the within-batch side)
        _EMB_SCHEMA = "doc_id long, label int, v array<double>"
        prev_emb = _read("s3", _EMB_SCHEMA, before=batch_id)
        emb_b = spark.read.schema(_EMB_SCHEMA).parquet(
            _os.path.join(root, "s3", f"inc_{batch_id}")
        )
        # per-label blocked GEMM (grouped_cosine_candidates): the old
        # same-label pair join shuffled sum_label |prior ∪ batch| x |batch|
        # pair ROWS, each dragging two 64-dim arrays — the dominant
        # per-batch row volume of the whole cascade. Now the shuffle
        # carries the O(n) vectors once and only near-threshold pairs
        # come back; new_col keeps the incremental (prior ∪ batch) x batch
        # shape, and the id_a < id_b guard lives inside the operator, so a
        # retried batch still can't pair a doc with itself.
        drop4 = (
            similarity.grouped_cosine_candidates(
                prev_emb.withColumn("is_new", F.lit(False)).unionByName(
                    emb_b.withColumn("is_new", F.lit(True))
                ),
                "label",
                id_col="doc_id",
                vec_col="v",
                threshold=0.45,
                new_col="is_new",
            )
            .select("id_b", F.round(F.col("cos"), 6).alias("cos"))
            .filter(F.col("cos") >= 0.45)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        # S4+S5 fused into the live write: the s4 snapshot was consumed
        # ONLY by the stateless quality filter, so the SemDeDup anti-join
        # and the quality gates share one job — obs4 sits below the
        # filter, obs5 on top (a linear chain, so neither CollectMetrics
        # node is duplicated), and the live increment IS the stage
        # snapshot (doc_id, lang, n_tok is all S6 needs).
        obs4 = _obs("semdedup", batch_id)
        obs5 = _obs("quality_gate", batch_id)
        _append(
            s3_b.join(drop4, "doc_id", "left_anti")
            .observe(obs4, *_FUNNEL_METRICS)
            .filter(
                (T.stopword_ratio(F.col("text")) >= 0.05)
                & (T.punct_ratio(F.col("text")) <= 0.2)
            )
            .observe(obs5, *_FUNNEL_METRICS)
            .select("doc_id", "lang", "n_tok"),
            "live",
            batch_id,
        )
        _settle(obs4, 4, batch_id)
        _settle(obs5, 5, batch_id)
        _mark("s4_s5")

    src = table_stream_source(spark, sf_dir, "documents", "doc_id")
    _qmark("source_setup")
    # scope the shuffle width to the micro-batch size: every stage gate
    # shuffles a few-thousand-row batch, and at the session's 32
    # partitions the cascade's ~6 jobs per batch pay 32 task/commit
    # overheads each (the same floor the runner scopes for stateful
    # queries); results are partition-count invariant. At real scale
    # this is sized to batch volume / executor count, not a constant.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_foreach_batch(src, _stage_batch)
        _qmark("stream_total")

        # S6 post-drain: temperature mixture over the accumulated live set
        live = _read("live", "doc_id long, lang string, n_tok long")
        cnts = live.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
        mn = cnts.agg(F.min("cnt").alias("mn"))
        rates = F.broadcast(
            cnts.crossJoin(F.broadcast(mn)).select(
                "lang",
                F.sqrt(F.col("mn").cast("double") / F.col("cnt").cast("double")).alias(
                    "rate"
                ),
            )
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mx:"), F.col("doc_id").cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("long")
            % 10000
        ) / 10000.0
        r6 = (
            live.join(rates, "lang")
            .filter(u < F.col("rate"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("d"),
                F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("t"),
            )
            .head()
        )
        _qmark("s6_post_drain")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        eval8.unpersist()
        _shutil.rmtree(root, ignore_errors=True)

    names = [
        "raw",
        "decontaminated",
        "exact_dedup",
        "jaccard_dedup",
        "semdedup",
        "quality_gate",
    ]
    funnel = [
        (
            i,
            names[i],
            sum(d for (s, _b), (d, _t) in tallies.items() if s == i),
            sum(t for (s, _b), (_d, t) in tallies.items() if s == i),
        )
        for i in range(6)
    ]
    funnel.append((6, "temp_mixture", int(r6["d"]), int(r6["t"])))
    total = int(r6["t"])
    funnel.append((7, f"packed_seqs_{_RELEASE_SEQ_LEN}", -(-total // _RELEASE_SEQ_LEN), total))
    return spark.createDataFrame(
        funnel, "stage int, stage_name string, n_docs bigint, n_tokens bigint"
    ).orderBy("stage")
