"""Model-evaluation, survival-comparison, and forecast-accuracy queries.

Round-7 additions that close out the statistics family with the metrics a
data-curation team actually reports on its classifiers and forecasts:

- ROC AUC / Gini / Youden's J for a score-vs-label evaluation, computed by
  the tie-exact integer rank machinery the Mann-Whitney query introduced
  (AUC == U / (n1*n0), so all rank arithmetic stays in exact integers and
  only the final division is floating point).
- The log-rank test — the hypothesis-test companion of the Kaplan-Meier /
  Nelson-Aalen estimators already in relational_deep: are two groups'
  conversion curves the same? Risk tables are exact integer counts; the
  expected/variance sums follow the repo's ROUND-then-DECIMAL rule.
- Yule-Walker AR(2) fit of the daily event-count series: autocovariance
  numerators as EXACT integers (n*x - S centering, so no float mean enters
  the sums), then a closed-form phi1/phi2 double chain identical in both
  engines.
- Seasonal-naive forecast accuracy (MASE / sMAPE) — the standard yardstick
  any fancier forecaster (Holt-Winters, AR) must beat; numerators are
  exact integer sums of absolute count differences.

Scale shapes: every query aggregates events/documents down to a
date-range- or distinct-value-bounded table (days, score values, death
times) before any window or self-join, so the heavy scan is one map-side
partial aggregation; the closed forms run on kilobyte tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


@query(
    "roc_auc_doc_length",
    oracle="""
    -- ROC AUC of "is this document English?" predicted by raw length.
    -- AUC = U1/(n1*n0) with average-rank tie handling == the Mann-Whitney
    -- integer rank machinery: per distinct score, c (total) and c1
    -- (positives), s = strictly-smaller count; 2*R1 = sum c1*(2s+c+1).
    -- Youden's J maximizes TPR-FPR over observed thresholds with the
    -- comparison done on the INTEGER cross-multiplied form.
    WITH v AS (
      SELECT n_chars AS score, COUNT(*) AS c,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM documents GROUP BY n_chars
    ),
    w AS (
      SELECT score, c, c1,
             COALESCE(CAST(SUM(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS s,
             COALESCE(CAST(SUM(c1) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS s1
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
    best AS (
      -- predict positive when score >= threshold; J scaled by n1*n0 stays
      -- integer: (n1-s1)*n0 - ((n0+n1-s-s1... ) use s0 = s - s1
      SELECT w.score AS best_threshold,
             (n.n1 - w.s1) * n.n0 - (n.n0 - (w.s - w.s1)) * n.n1 AS j_num,
             n.n1, n.n0
      FROM w CROSS JOIN n
      ORDER BY j_num DESC, w.score ASC LIMIT 1
    )
    SELECT n.n1 AS n_pos, n.n0 AS n_neg,
           ROUND((agg.two_r1 - n.n1 * (n.n1 + 1)) / (2.0 * n.n1 * n.n0), 6)
             AS auc,
           ROUND((agg.two_r1 - n.n1 * (n.n1 + 1)) / (1.0 * n.n1 * n.n0) - 1.0,
                 6) AS gini,
           CAST(best.best_threshold AS BIGINT) AS best_threshold,
           ROUND(best.j_num / (1.0 * n.n1 * n.n0), 6) AS youden_j
    FROM agg CROSS JOIN n CROSS JOIN best
    """,
)
def roc_auc_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC (with tie-averaged ranks), Gini, and the Youden-optimal
    threshold for lang=='en' predicted by document length. One grouped pass
    builds the distinct-score table; ranks, U, and the J comparison all stay
    in exact integers (J is maximized on its n1*n0-scaled integer form), so
    the only floats are the final divisions — bit-identical cross-engine.

    Scale shape: groupBy(score) is the only full scan (map-side combine);
    the window and arg-max run over |distinct scores| rows.
    """
    docs = load(spark, sf_dir, "documents")
    v = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum((F.col("lang") == "en").cast("long")).cast("long").alias("c1"),
    )
    w_prev = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "score",
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w_prev).cast("long"), F.lit(0)).alias("s"),
        F.coalesce(F.sum("c1").over(w_prev).cast("long"), F.lit(0)).alias("s1"),
    )
    n = v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("long").alias("n0"),
    )
    agg = w.agg(
        F.sum(F.col("c1") * (2 * F.col("s") + F.col("c") + 1))
        .cast("long")
        .alias("two_r1")
    )
    best = (
        w.crossJoin(F.broadcast(n))
        .select(
            F.col("score").alias("best_threshold"),
            (
                (F.col("n1") - F.col("s1")) * F.col("n0")
                - (F.col("n0") - (F.col("s") - F.col("s1"))) * F.col("n1")
            ).alias("j_num"),
        )
        .orderBy(F.desc("j_num"), F.asc("best_threshold"))
        .limit(1)
    )
    u1_x2 = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    return (
        agg.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(best))
        .select(
            F.col("n1").alias("n_pos"),
            F.col("n0").alias("n_neg"),
            F.round(u1_x2 / (2.0 * F.col("n1") * F.col("n0")), 6).alias("auc"),
            F.round(u1_x2 / (1.0 * F.col("n1") * F.col("n0")) - 1.0, 6).alias(
                "gini"
            ),
            F.col("best_threshold").cast("long").alias("best_threshold"),
            F.round(
                F.col("j_num") / (1.0 * F.col("n1") * F.col("n0")), 6
            ).alias("youden_j"),
        )
    )


@query(
    "logrank_test_user_parity",
    oracle="""
    -- Log-rank test: do odd- and even-numbered users share one
    -- time-to-first-purchase curve? Same observation table as the
    -- Kaplan-Meier query (right-censored at last seen, hour buckets),
    -- split by user_id parity. At each pooled death time: O1 counts group-1
    -- deaths; E1 sums d*n1/n; V the hypergeometric variance — expected and
    -- variance terms ROUNDed then DECIMAL-summed (order independence).
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT e.user_id, MAX(e.ts) AS tl
      FROM events e JOIN s USING (user_id)
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT s.user_id % 2 AS g,
             CASE WHEN d.td IS NOT NULL THEN 1 ELSE 0 END AS died,
             CAST(FLOOR((epoch_us(COALESCE(d.td, l.tl)) - epoch_us(s.t0))
                        / 3600000000.0) AS BIGINT) AS dur_h
      FROM s
      LEFT JOIN death d USING (user_id)
      JOIN last_seen l USING (user_id)
    ),
    dt AS (
      SELECT dur_h AS t, COUNT(*) AS d,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
      FROM obs WHERE died = 1 GROUP BY dur_h
    ),
    risk AS (
      SELECT dt.t, dt.d, dt.d1,
             (SELECT COUNT(*) FROM obs WHERE obs.dur_h >= dt.t) AS n,
             (SELECT COUNT(*) FROM obs
              WHERE obs.dur_h >= dt.t AND obs.g = 1) AS n1
      FROM dt
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
             CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(CAST(ROUND(d * n1 * 1.0 / n, 10) AS DECIMAL(28,10)))
               AS DOUBLE) AS e1,
             CAST(SUM(CAST(ROUND(
               CASE WHEN n > 1
                 THEN d * (n1 * 1.0 / n) * ((n - n1) * 1.0 / n)
                      * ((n - d) * 1.0 / (n - 1))
                 ELSE 0.0 END, 10) AS DECIMAL(28,10))) AS DOUBLE) AS v
      FROM risk
    )
    SELECT n_times, o1, ROUND(e1, 6) AS e1, ROUND(v, 6) AS var_lr,
           ROUND((o1 - e1) * (o1 - e1) / v, 6) AS chi2
    FROM agg
    """,
)
def logrank_test_user_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the time-to-first-purchase
    curves of odd vs even user ids — the significance test the KM and
    Nelson-Aalen estimators report against. Risk-set counts (n, n1) and
    observed deaths are exact integers from one duration table; the
    expected-deaths and hypergeometric-variance sums use the per-term
    ROUND -> DECIMAL accumulation rule, so chi2 is engine-exact.

    Scale shape: identical to kaplan_meier_survival — events collapse to
    one row per signup user, then every table is bounded by |death times|.
    """
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    death = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    last_seen = (
        ev.join(s.select("user_id"), "user_id")
        .groupBy("user_id")
        .agg(F.max("ts").alias("tl"))
    )
    obs = (
        s.join(death, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            (F.col("user_id") % 2).alias("g"),
            F.when(F.col("td").isNotNull(), 1).otherwise(0).alias("died"),
            F.floor(
                (F.unix_micros(F.coalesce("td", "tl")) - F.unix_micros("t0"))
                / 3600000000.0
            )
            .cast("long")
            .alias("dur_h"),
        )
        .persist()
    )
    dt = (
        obs.filter(F.col("died") == 1)
        .groupBy(F.col("dur_h").alias("t"))
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum((F.col("g") == 1).cast("long")).cast("long").alias("d1"),
        )
    )
    at_risk = obs.select(F.col("dur_h").alias("r_dur"), F.col("g").alias("r_g"))
    risk = (
        dt.join(at_risk, F.col("r_dur") >= F.col("t"))
        .groupBy("t", "d", "d1")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("r_g") == 1).cast("long")).alias("n1"),
        )
    )
    e_term = F.round(F.col("d") * F.col("n1") * 1.0 / F.col("n"), 10)
    v_term = F.round(
        F.when(
            F.col("n") > 1,
            F.col("d")
            * (F.col("n1") * 1.0 / F.col("n"))
            * ((F.col("n") - F.col("n1")) * 1.0 / F.col("n"))
            * ((F.col("n") - F.col("d")) * 1.0 / (F.col("n") - 1)),
        ).otherwise(0.0),
        10,
    )
    agg = risk.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e_term.cast("decimal(28,10)")).cast("double").alias("e1"),
        F.sum(v_term.cast("decimal(28,10)")).cast("double").alias("v"),
    )
    return agg.select(
        "n_times",
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("v", 6).alias("var_lr"),
        F.round(
            (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1")) / F.col("v"),
            6,
        ).alias("chi2"),
    )


def _daily_series_sql() -> str:
    """Shared CTE prefix: the daily event-count series indexed 0..n-1 by
    rank of observed day (gap-agnostic — both engines agree on the index
    regardless of missing days)."""
    return """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t, x
      FROM daily
    ),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM idx
    )"""


@query(
    "yule_walker_ar2_daily",
    oracle=_daily_series_sql()
    + """,
    y AS (
      -- exact integer centering: y_t = n*x_t - S  (no float mean in sums)
      SELECT idx.t, idx.x, st.n * idx.x - st.sx AS y
      FROM idx CROSS JOIN st
    ),
    cov AS (
      SELECT
        CAST((SELECT SUM(a.y * a.y) FROM y a) AS BIGINT) AS c0,
        CAST((SELECT SUM(a.y * b.y) FROM y a JOIN y b ON b.t = a.t + 1)
          AS BIGINT) AS c1,
        CAST((SELECT SUM(a.y * b.y) FROM y a JOIN y b ON b.t = a.t + 2)
          AS BIGINT) AS c2
    ),
    fit AS (
      -- normalize to double ratios FIRST (c0*c0 would overflow int64),
      -- then the textbook closed form; a pure elementwise double chain
      SELECT st.n, cov.c0, cov.c1, cov.c2,
             (cov.c1 * 1.0 / cov.c0) AS r1,
             (cov.c2 * 1.0 / cov.c0) AS r2,
             st.sx * 1.0 / st.n AS xbar
      FROM cov CROSS JOIN st
    ),
    phi AS (
      SELECT n, c0, c1, c2, xbar,
             r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
      FROM fit
    ),
    tail AS (
      SELECT
        (SELECT x FROM idx CROSS JOIN st WHERE t = n - 1) AS x_last,
        (SELECT x FROM idx CROSS JOIN st WHERE t = n - 2) AS x_prev
    )
    SELECT phi.n AS n_days, phi.c0, phi.c1, phi.c2,
           ROUND(phi.phi1, 8) AS phi1, ROUND(phi.phi2, 8) AS phi2,
           ROUND(phi.xbar + phi.phi1 * (tail.x_last - phi.xbar)
                          + phi.phi2 * (tail.x_prev - phi.xbar), 4)
             AS forecast_next
    FROM phi CROSS JOIN tail
    """,
)
def yule_walker_ar2_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit of the daily event-count series by Yule-Walker: exact
    integer autocovariance numerators (centering via y_t = n*x_t - S keeps
    the float mean out of every sum; the common n^2/n scale cancels in the
    r1/r2 ratios), then the closed-form phi1/phi2 and one-step forecast as
    an elementwise double chain identical in both engines. Normalizing to
    ratios BEFORE any product keeps everything inside int64 (c0^2 would
    overflow at sf0.1).

    Scale shape: the only full scan is groupBy(day) with map-side combine;
    lag joins and the 2x2 solve run on the |days|-row series.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
        "x",
    )
    st = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    y = idx.crossJoin(F.broadcast(st)).select(
        "t", "x", (F.col("n") * F.col("x") - F.col("sx")).alias("y")
    )
    a = y.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = y.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    c0 = y.agg(F.sum(F.col("y") * F.col("y")).cast("long").alias("c0"))
    c1 = a.join(b, F.col("tb") == F.col("ta") + 1).agg(
        F.sum(F.col("ya") * F.col("yb")).cast("long").alias("c1")
    )
    c2 = a.join(b, F.col("tb") == F.col("ta") + 2).agg(
        F.sum(F.col("ya") * F.col("yb")).cast("long").alias("c2")
    )
    fit = (
        c0.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(st))
        .select(
            "n",
            "c0",
            "c1",
            "c2",
            (F.col("c1") * 1.0 / F.col("c0")).alias("r1"),
            (F.col("c2") * 1.0 / F.col("c0")).alias("r2"),
            (F.col("sx") * 1.0 / F.col("n")).alias("xbar"),
        )
    )
    phi = fit.select(
        "n",
        "c0",
        "c1",
        "c2",
        "xbar",
        (F.col("r1") * (1.0 - F.col("r2")) / (1.0 - F.col("r1") * F.col("r1"))).alias(
            "phi1"
        ),
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1.0 - F.col("r1") * F.col("r1"))
        ).alias("phi2"),
    )
    tail = (
        idx.crossJoin(F.broadcast(st))
        .select(
            F.when(F.col("t") == F.col("n") - 1, F.col("x")).alias("xl"),
            F.when(F.col("t") == F.col("n") - 2, F.col("x")).alias("xp"),
        )
        .agg(
            F.max("xl").cast("long").alias("x_last"),
            F.max("xp").cast("long").alias("x_prev"),
        )
    )
    return phi.crossJoin(F.broadcast(tail)).select(
        F.col("n").alias("n_days"),
        "c0",
        "c1",
        "c2",
        F.round("phi1", 8).alias("phi1"),
        F.round("phi2", 8).alias("phi2"),
        F.round(
            F.col("xbar")
            + F.col("phi1") * (F.col("x_last") - F.col("xbar"))
            + F.col("phi2") * (F.col("x_prev") - F.col("xbar")),
            4,
        ).alias("forecast_next"),
    )


@query(
    "seasonal_naive_mase",
    oracle=_daily_series_sql()
    + """,
    sn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt_s,
             CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS err_s,
             CAST(SUM(CAST(ROUND(2.0 * ABS(a.x - b.x) / (a.x + b.x), 10)
                           AS DECIMAL(28,10))) AS DOUBLE) AS smape_sum
      FROM idx a JOIN idx b ON a.t = b.t + 7
    ),
    nv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt_n,
             CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS err_n
      FROM idx a JOIN idx b ON a.t = b.t + 1
    )
    SELECT st.n AS n_days,
           ROUND(sn.err_s * 1.0 / sn.cnt_s, 6) AS mae_snaive,
           ROUND(nv.err_n * 1.0 / nv.cnt_n, 6) AS mae_naive,
           ROUND((sn.err_s * 1.0 / sn.cnt_s) / (nv.err_n * 1.0 / nv.cnt_n), 6)
             AS mase,
           ROUND(sn.smape_sum / sn.cnt_s, 6) AS smape
    FROM sn CROSS JOIN nv CROSS JOIN st
    """,
)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy yardstick for the daily event-count series: MAE of
    the weekly seasonal-naive forecast (x_t predicted by x_{t-7}), MASE
    (scaled by the one-step naive MAE — the standard skill score any model
    must push below 1), and sMAPE. Absolute-error numerators are exact
    integer sums; sMAPE terms are ROUNDed then DECIMAL-summed.

    Scale shape: one map-side day aggregation, then |days|-row lag joins.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
        "x",
    ).persist()
    st = idx.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = idx.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = idx.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    diff = F.abs(F.col("xa") - F.col("xb"))
    sn = a.join(b, F.col("ta") == F.col("tb") + 7).agg(
        F.count(F.lit(1)).cast("long").alias("cnt_s"),
        F.sum(diff).cast("long").alias("err_s"),
        F.sum(
            F.round(2.0 * diff / (F.col("xa") + F.col("xb")), 10).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("smape_sum"),
    )
    nv = a.join(b, F.col("ta") == F.col("tb") + 1).agg(
        F.count(F.lit(1)).cast("long").alias("cnt_n"),
        F.sum(diff).cast("long").alias("err_n"),
    )
    return (
        sn.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(st))
        .select(
            F.col("n").alias("n_days"),
            F.round(F.col("err_s") * 1.0 / F.col("cnt_s"), 6).alias("mae_snaive"),
            F.round(F.col("err_n") * 1.0 / F.col("cnt_n"), 6).alias("mae_naive"),
            F.round(
                (F.col("err_s") * 1.0 / F.col("cnt_s"))
                / (F.col("err_n") * 1.0 / F.col("cnt_n")),
                6,
            ).alias("mase"),
            F.round(F.col("smape_sum") / F.col("cnt_s"), 6).alias("smape"),
        )
    )


_ALS_ITERS = 2


def _als_oracle(iters: int = _ALS_ITERS) -> str:
    sql = """
    -- Rank-1 ALS on the user x event_type count matrix: each half-step is
    -- the CLOSED-FORM least-squares solve over observed entries
    -- (u_i = sum r_ij v_j / sum v_j^2, then symmetrically for v), so two
    -- unrolled iterations are pure aggregates — a factorization training
    -- loop that passes the value-hash gate. Every cross-term product is
    -- ROUNDed@12 into a DECIMAL(38,12) sum (order independence); the
    -- division num/den is one double op, identical in both engines.
    -- CTEs referenced more than once are MATERIALIZED (DuckDB inlining is
    -- exponential in the iteration count otherwise).
    WITH r AS MATERIALIZED (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    v0 AS MATERIALIZED (
      SELECT event_type, 1.0 AS v FROM (SELECT DISTINCT event_type FROM r)
    )"""
    for i in range(1, iters + 1):
        sql += f""",
    u{i} AS MATERIALIZED (
      SELECT r.user_id,
             CAST(SUM(CAST(ROUND(r.c * v.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(v.v * v.v, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS u
      FROM r JOIN v{i - 1} v USING (event_type)
      GROUP BY r.user_id
    ),
    v{i} AS MATERIALIZED (
      SELECT r.event_type,
             CAST(SUM(CAST(ROUND(r.c * u.u, 12) AS DECIMAL(38,12))) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(u.u * u.u, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS v
      FROM r JOIN u{i} u USING (user_id)
      GROUP BY r.event_type
    )"""
    sql += f""",
    sse AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CAST(ROUND((r.c - u.u * v.v) * (r.c - u.u * v.v), 10)
                           AS DECIMAL(38,10))) AS DOUBLE) AS sse
      FROM r
      JOIN u{iters} u USING (user_id)
      JOIN v{iters} v USING (event_type)
    )
    SELECT v.event_type, ROUND(v.v, 6) AS item_factor,
           sse.n_obs, ROUND(sqrt(sse.sse / sse.n_obs), 6) AS rmse
    FROM v{iters} v CROSS JOIN sse
    ORDER BY v.event_type
    """
    return sql


@query("als_rank1_factorization", oracle=_als_oracle())
def als_rank1_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 alternating least squares on the user x event_type count
    matrix (2 iterations, item factors initialized to 1): each half-step
    solves its per-row least squares in CLOSED FORM over observed entries,
    so the whole training loop is four hash aggregations and the oracle
    unrolls them exactly — the recommender-system member of the repo's
    hash-checked training-loop family (logreg GD, k-means coreset, IPF).
    Reports the final item factors and the rank-1 reconstruction RMSE.

    Scale shape: each half-step is one groupBy over the observed-entries
    table with a broadcastable 5-row factor side; the user-factor table
    shuffles on user_id exactly like any per-user aggregate. No driver
    state beyond the loop counter; lineage stays flat (2 iterations)."""
    ev = load(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    v = r.select("event_type").distinct().select(
        "event_type", F.lit(1.0).alias("v")
    )
    dec = lambda c, s=12: F.sum(F.round(c, s).cast("decimal(38,12)")).cast(  # noqa: E731
        "double"
    )
    for _ in range(_ALS_ITERS):
        u = (
            r.join(F.broadcast(v), "event_type")
            .groupBy("user_id")
            .agg(
                (
                    dec(F.col("c") * F.col("v")) / dec(F.col("v") * F.col("v"))
                ).alias("u")
            )
        )
        v = (
            r.join(u, "user_id")
            .groupBy("event_type")
            .agg(
                (
                    dec(F.col("c") * F.col("u")) / dec(F.col("u") * F.col("u"))
                ).alias("v")
            )
        )
        u = u.localCheckpoint(eager=True)
        v = v.localCheckpoint(eager=True)
    sse = (
        r.join(u, "user_id")
        .join(F.broadcast(v), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum(
                F.round(
                    (F.col("c") - F.col("u") * F.col("v"))
                    * (F.col("c") - F.col("u") * F.col("v")),
                    10,
                ).cast("decimal(38,10)")
            )
            .cast("double")
            .alias("sse"),
        )
    )
    return (
        v.crossJoin(F.broadcast(sse))
        .select(
            "event_type",
            F.round("v", 6).alias("item_factor"),
            "n_obs",
            F.round(F.sqrt(F.col("sse") / F.col("n_obs")), 6).alias("rmse"),
        )
        .orderBy("event_type")
    )


@query(
    "naive_bayes_langid",
    oracle="""
    -- Multinomial naive Bayes language ID, trained on even doc_ids and
    -- evaluated on odd ones: Laplace-smoothed word likelihoods over the
    -- training vocabulary, log-space scoring with per-term ROUND ->
    -- DECIMAL sums, argmax with a rounded-score + lang tie-break. The
    -- whole train/score/argmax pipeline is aggregates and joins — a
    -- hash-checked CLASSIFIER beyond the logistic family.
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lang, unnest(list_filter(
               string_split(lower(text), ' '), w -> w <> '')) AS w
      FROM documents
    ),
    train AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 2 = 0),
    vocab AS MATERIALIZED (SELECT DISTINCT w FROM train),
    vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_size FROM vocab),
    langs AS MATERIALIZED (SELECT DISTINCT lang FROM train),
    prior AS MATERIALIZED (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_l
      FROM train GROUP BY lang
    ),
    prior_tot AS (SELECT CAST(SUM(n_docs_l) AS BIGINT) AS n_train FROM prior),
    wl AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM train GROUP BY 1, 2
    ),
    tot AS MATERIALIZED (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot_l FROM train GROUP BY lang
    ),
    prob AS MATERIALIZED (
      -- Laplace table over the FULL vocab x lang grid (zero counts smoothed)
      SELECT l.lang, v.w,
             (COALESCE(wl.c, 0) + 1) * 1.0 / (tot.tot_l + vs.v_size) AS p
      FROM langs l
      CROSS JOIN vocab v
      CROSS JOIN vs
      JOIN tot ON tot.lang = l.lang
      LEFT JOIN wl ON wl.lang = l.lang AND wl.w = v.w
    ),
    test_wc AS MATERIALIZED (
      SELECT t.doc_id, t.lang AS labeled_lang, t.w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM toks t WHERE t.doc_id % 2 = 1
        AND t.w IN (SELECT w FROM vocab)
      GROUP BY 1, 2, 3
    ),
    term AS (
      SELECT tw.doc_id, p.lang,
             CAST(SUM(CAST(ROUND(tw.cw * ln(p.p), 10) AS DECIMAL(28,10)))
               AS DOUBLE) AS tsum
      FROM test_wc tw JOIN prob p ON p.w = tw.w
      GROUP BY 1, 2
    ),
    test_docs AS MATERIALIZED (
      SELECT DISTINCT doc_id, lang AS labeled_lang FROM documents
      WHERE doc_id % 2 = 1
    ),
    score AS (
      SELECT d.doc_id, d.labeled_lang, l.lang,
             ROUND(ln(pr.n_docs_l * 1.0 / pt.n_train), 10)
               + COALESCE(t.tsum, 0.0) AS s
      FROM test_docs d
      CROSS JOIN langs l
      JOIN prior pr ON pr.lang = l.lang
      CROSS JOIN prior_tot pt
      LEFT JOIN term t ON t.doc_id = d.doc_id AND t.lang = l.lang
    ),
    pred AS (
      SELECT doc_id, labeled_lang, lang AS predicted_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY ROUND(s, 8) DESC, lang) AS rn
      FROM score
    )
    SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier: train on even doc_ids
    (Laplace-smoothed P(word|lang) over the training vocabulary), score the
    odd half in log space, report the confusion matrix. Training is two
    wordcount-shaped aggregates; scoring is one join of test word counts
    against the broadcastable vocab x lang probability grid; per-term
    ROUND -> DECIMAL sums make every log-likelihood engine-exact, and the
    argmax tie-breaks on (rounded score, lang).

    Scale shape: the classifier state (prob grid) is |V| x |langs| rows
    independent of corpus size; scoring shuffles once on (doc, lang)."""
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
    toks = docs.select(
        "doc_id", "lang", F.explode(ws).alias("w")
    ).persist()
    train = toks.filter(F.col("doc_id") % 2 == 0).persist()
    vocab = train.select("w").distinct().persist()
    v_size = vocab.count()
    langs = train.select("lang").distinct()
    prior = train.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_l")
    )
    n_train = prior.agg(F.sum("n_docs_l").cast("long").alias("n_train"))
    wl = train.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = train.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("tot_l"))
    grid = (
        langs.crossJoin(vocab)
        .join(tot, "lang")
        .join(wl, ["lang", "w"], "left")
        .select(
            "lang",
            "w",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                * 1.0
                / (F.col("tot_l") + F.lit(v_size))
            ).alias("p"),
        )
    )
    test_wc = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(vocab), "w")
        .groupBy(
            "doc_id", F.col("lang").alias("labeled_lang"), "w"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cw"))
    )
    grid_p = grid.select(
        F.col("lang").alias("plang"), F.col("w"), F.col("p")
    )
    term = (
        test_wc.join(F.broadcast(grid_p), "w")
        .groupBy("doc_id", F.col("plang").alias("lang"))
        .agg(
            F.sum(
                F.round(F.col("cw") * F.log(F.col("p")), 10).cast(
                    "decimal(28,10)"
                )
            )
            .cast("double")
            .alias("tsum")
        )
    )
    test_docs = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", F.col("lang").alias("labeled_lang"))
        .distinct()
    )
    score = (
        test_docs.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(n_train))
        .join(term, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "labeled_lang",
            "lang",
            (
                F.round(
                    F.log(F.col("n_docs_l") * 1.0 / F.col("n_train")), 10
                )
                + F.coalesce(F.col("tsum"), F.lit(0.0))
            ).alias("s"),
        )
    )
    w_arg = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("s"), 8)), F.asc("lang")
    )
    pred = score.withColumn("rn", F.row_number().over(w_arg)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("labeled_lang", F.col("lang").alias("predicted_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


@query(
    "isotonic_calibration_pava",
    oracle="""
    -- Isotonic calibration of per-bin positive rates by the CLOSED-FORM
    -- pool-adjacent-violators solution: iso_i = max_{j<=i} min_{k>=i}
    -- weightedAvg(bins j..k). On B=20 integer bins the minimax runs as a
    -- bounded triple join (B^3 rows), fully declarative — no sequential
    -- PAVA loop, no driver state. Counts and cumulative sums are exact
    -- integers; each candidate average is one int/int double division, so
    -- the max-min lattice picks among identical doubles in both engines.
    WITH lab AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    ext AS (
      SELECT MIN(score) AS lo, MAX(score) AS hi FROM lab
    ),
    binned AS (
      SELECT CAST(FLOOR((score - lo) * 20 / (hi - lo + 1)) AS BIGINT) AS bin,
             y
      FROM lab CROSS JOIN ext
    ),
    b AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
      FROM binned GROUP BY bin
    ),
    idx AS (
      SELECT bin, n, pos,
             CAST(ROW_NUMBER() OVER (ORDER BY bin) AS BIGINT) AS i,
             CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cn,
             CAST(SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cp
      FROM b
    ),
    seg AS (
      -- weighted average of observed-bin segment [j..k]
      SELECT j.i AS j, k.i AS k,
             (k.cp - (j.cp - j.pos)) * 1.0 / (k.cn - (j.cn - j.n)) AS avgjk
      FROM idx j JOIN idx k ON j.i <= k.i
    ),
    mins AS (
      -- for each (i, j<=i): min over k>=i of avg(j,k)
      SELECT x.i, s.j, MIN(s.avgjk) AS mn
      FROM idx x JOIN seg s ON s.j <= x.i AND s.k >= x.i
      GROUP BY x.i, s.j
    ),
    iso AS (
      SELECT i, MAX(mn) AS iso_rate FROM mins GROUP BY i
    )
    SELECT idx.bin, idx.n, idx.pos,
           ROUND(idx.pos * 1.0 / idx.n, 6) AS raw_rate,
           ROUND(iso.iso_rate, 6) AS iso_rate
    FROM idx JOIN iso ON iso.i = idx.i
    ORDER BY idx.bin
    """,
)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of the binned P(lang='en' | doc length)
    curve, via the minimax closed form iso_i = max_{j<=i} min_{k>=i}
    avg(j..k) — the exact pool-adjacent-violators solution expressed as a
    bounded triple join over the 20-bin table instead of a sequential
    merge loop. Bin membership is pure integer arithmetic; cumulative
    pos/count prefixes are exact, so every candidate segment average is
    the same double in both engines and the calibrated curve hash-matches.

    Scale shape: one scan bins the corpus (map-side); everything after is
    O(B^3) on B=20 rows. The binning min/max travels as a broadcast 1-row
    cross join, not a driver collect."""
    docs = load(spark, sf_dir, "documents")
    lab = docs.select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    ext = lab.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    binned = lab.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("score") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("long")
        .alias("bin"),
        "y",
    )
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w_ord = Window.orderBy("bin")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    idx = b.select(
        "bin",
        "n",
        "pos",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("n").over(w_cum).cast("long").alias("cn"),
        F.sum("pos").over(w_cum).cast("long").alias("cp"),
    ).persist()
    j = idx.select(
        F.col("i").alias("j"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
        F.col("n").alias("jn"),
        F.col("pos").alias("jpos"),
    )
    k = idx.select(
        F.col("i").alias("k"),
        F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    seg = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("kcp") - (F.col("jcp") - F.col("jpos")))
            * 1.0
            / (F.col("kcn") - (F.col("jcn") - F.col("jn")))
        ).alias("avgjk"),
    )
    x = idx.select(F.col("i").alias("xi"))
    mins = (
        x.join(seg, (F.col("j") <= F.col("xi")) & (F.col("k") >= F.col("xi")))
        .groupBy("xi", "j")
        .agg(F.min("avgjk").alias("mn"))
    )
    iso = mins.groupBy("xi").agg(F.max("mn").alias("iso_rate"))
    return (
        idx.join(iso, F.col("xi") == F.col("i"))
        .select(
            "bin",
            "n",
            "pos",
            F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            F.round("iso_rate", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


@query(
    "eb_shrunk_conversion_rates",
    oracle="""
    -- Empirical-Bayes (beta-binomial) shrinkage of per-user purchase
    -- rates: method-of-moments prior from the raw rate distribution
    -- (alpha/beta from mean m and variance v), then every user's rate is
    -- shrunk toward it: (x + alpha) / (n + alpha + beta) — small-sample
    -- users move most, the fix for "top converter has 1 event". Moments
    -- accumulate as ROUNDed DECIMAL sums; the prior and shrunk estimates
    -- are elementwise double chains, identical cross-engine.
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CAST(ROUND(x * 1.0 / n, 10) AS DECIMAL(28,10)))
               AS DOUBLE) AS sp,
             CAST(SUM(CAST(ROUND((x * 1.0 / n) * (x * 1.0 / n), 10)
                           AS DECIMAL(28,10))) AS DOUBLE) AS sp2
      FROM u
    ),
    prior AS (
      SELECT n_users,
             (sp / n_users) * ((sp / n_users) * (1.0 - sp / n_users)
               / (sp2 / n_users - (sp / n_users) * (sp / n_users)) - 1.0)
               AS alpha,
             (1.0 - sp / n_users) * ((sp / n_users) * (1.0 - sp / n_users)
               / (sp2 / n_users - (sp / n_users) * (sp / n_users)) - 1.0)
               AS beta
      FROM mom
    ),
    shrunk AS (
      SELECT u.user_id, u.n, u.x,
             ROUND(u.x * 1.0 / u.n, 6) AS raw_rate,
             (u.x + p.alpha) / (u.n + p.alpha + p.beta) AS sh,
             p.alpha, p.beta
      FROM u CROSS JOIN prior p
    )
    SELECT user_id, n, x, raw_rate, ROUND(sh, 6) AS shrunk_rate,
           ROUND(alpha, 6) AS alpha, ROUND(beta, 6) AS beta,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(sh, 8) DESC, user_id)
             AS BIGINT) AS rnk
    FROM shrunk
    QUALIFY rnk <= 15
    ORDER BY rnk
    """,
)
def eb_shrunk_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase-share estimates: a
    beta-binomial prior fit by method of moments on the raw per-user
    rates, then (x + alpha)/(n + alpha + beta) per user — the
    James-Stein-flavored leaderboard that stops one-event users from
    topping the conversion ranking. Moment sums follow the ROUND ->
    DECIMAL rule; prior and posterior are pure double chains.

    Scale shape: one groupBy(user_id) scan; the prior is a broadcast
    1-row cross join; top-15 with a full tie-break."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("x"),
    )
    p = F.col("x") * 1.0 / F.col("n")
    mom = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.round(p, 10).cast("decimal(28,10)")).cast("double").alias("sp"),
        F.sum(F.round(p * p, 10).cast("decimal(28,10)"))
        .cast("double")
        .alias("sp2"),
    )
    m = F.col("sp") / F.col("n_users")
    v = F.col("sp2") / F.col("n_users") - m * m
    k = m * (1.0 - m) / v - 1.0
    prior = mom.select(
        (m * k).alias("alpha"), ((1.0 - m) * k).alias("beta")
    )
    shrunk = u.crossJoin(F.broadcast(prior)).select(
        "user_id",
        "n",
        "x",
        F.round(p, 6).alias("raw_rate"),
        ((F.col("x") + F.col("alpha")) / (F.col("n") + F.col("alpha") + F.col("beta"))).alias("sh"),
        "alpha",
        "beta",
    )
    w_rnk = Window.orderBy(F.desc(F.round(F.col("sh"), 8)), F.asc("user_id"))
    return (
        shrunk.withColumn("rnk", F.row_number().over(w_rnk).cast("long"))
        .filter(F.col("rnk") <= 15)
        .select(
            "user_id",
            "n",
            "x",
            "raw_rate",
            F.round("sh", 6).alias("shrunk_rate"),
            F.round("alpha", 6).alias("alpha"),
            F.round("beta", 6).alias("beta"),
            "rnk",
        )
        .orderBy("rnk")
    )


@query(
    "sequential_pattern_support",
    oracle="""
    -- Frequent 2-step SUBSEQUENCE patterns (PrefixSpan depth-1): user
    -- supports a -> b iff some a-event strictly precedes some b-event —
    -- equivalently MIN(ts of a) < MAX(ts of b), so the whole mining pass
    -- is one (user, type) aggregate and a self-join, never a scan of
    -- event pairs. Confidence and lift are exact integer ratios.
    -- Timestamps compare at MICROsecond precision on both engines (the
    -- parquet is nanos; Spark loads micros).
    WITH ua AS (
      SELECT user_id, event_type,
             MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      FROM events GROUP BY 1, 2
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ua),
    tu AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS users_t FROM ua
           GROUP BY event_type),
    sup AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM ua a JOIN ua b
        ON a.user_id = b.user_id AND a.mn < b.mx
      GROUP BY 1, 2
    )
    SELECT s.antecedent, s.consequent, s.support,
           ROUND(s.support * 1.0 / ta.users_t, 6) AS confidence,
           ROUND(s.support * 1.0 * nu.n_users / (ta.users_t * tb.users_t), 6)
             AS lift,
           CAST(ROW_NUMBER() OVER (
             ORDER BY s.support DESC, s.antecedent, s.consequent) AS BIGINT)
             AS rnk
    FROM sup s
    JOIN tu ta ON ta.event_type = s.antecedent
    JOIN tu tb ON tb.event_type = s.consequent
    CROSS JOIN nu
    QUALIFY rnk <= 20
    ORDER BY rnk
    """,
)
def sequential_pattern_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 sequential pattern mining (the PrefixSpan base case): for
    every ordered event-type pair a -> b, the number of users with an
    a-event strictly before a b-event, plus confidence and lift. The
    subsequence test collapses to MIN(ts_a) < MAX(ts_b) per user, so
    support mining is a (user,type) aggregate + equi-self-join — no
    pairwise event scan, the shape that survives 100 TB. Both engines
    compare timestamps at microseconds.

    event_path_trigrams covers ADJACENT transitions; this adds the
    gap-tolerant subsequence semantics association mining needs."""
    ev = load(spark, sf_dir, "events")
    ua = ev.groupBy("user_id", "event_type").agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).persist()
    nu = ua.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    tu = ua.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("users_t")
    )
    a = ua.select(
        F.col("user_id").alias("ua_uid"),
        F.col("event_type").alias("antecedent"),
        F.col("mn"),
    )
    b = ua.select(
        F.col("user_id").alias("ub_uid"),
        F.col("event_type").alias("consequent"),
        F.col("mx"),
    )
    sup = (
        a.join(b, (F.col("ua_uid") == F.col("ub_uid")) & (F.col("mn") < F.col("mx")))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    ta = tu.select(
        F.col("event_type").alias("antecedent"), F.col("users_t").alias("users_a")
    )
    tb = tu.select(
        F.col("event_type").alias("consequent"), F.col("users_t").alias("users_b")
    )
    out = (
        sup.join(F.broadcast(ta), "antecedent")
        .join(F.broadcast(tb), "consequent")
        .crossJoin(F.broadcast(nu))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(F.col("support") * 1.0 / F.col("users_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("support")
                * 1.0
                * F.col("n_users")
                / (F.col("users_a") * F.col("users_b")),
                6,
            ).alias("lift"),
        )
    )
    w_rnk = Window.orderBy(
        F.desc("support"), F.asc("antecedent"), F.asc("consequent")
    )
    return (
        out.withColumn("rnk", F.row_number().over(w_rnk).cast("long"))
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


@query(
    "rmst_by_user_parity",
    oracle="""
    -- Restricted mean survival time (area under the KM curve up to
    -- tau=168h) per user-parity group: the EFFECT-SIZE companion to the
    -- log-rank chi2 (how many conversion-free hours does each group keep
    -- within the first week). Survival steps use the KM exp-of-decimal-
    -- ln-sums discipline per group; interval areas ROUND@8 then DECIMAL-
    -- sum. The synthetic t=0, S=1 row closes the first interval; LEAD
    -- orders by (t, s DESC) so a real death at t=0 stays deterministic.
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT e.user_id, MAX(e.ts) AS tl
      FROM events e JOIN s USING (user_id)
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT s.user_id % 2 AS g,
             CASE WHEN d.td IS NOT NULL THEN 1 ELSE 0 END AS died,
             CAST(FLOOR((epoch_us(COALESCE(d.td, l.tl)) - epoch_us(s.t0))
                        / 3600000000.0) AS BIGINT) AS dur_h
      FROM s
      LEFT JOIN death d USING (user_id)
      JOIN last_seen l USING (user_id)
    ),
    dt AS (
      SELECT g, dur_h AS t, COUNT(*) AS d
      FROM obs WHERE died = 1 GROUP BY 1, 2
    ),
    risk AS (
      SELECT dt.g, dt.t, dt.d,
             (SELECT COUNT(*) FROM obs
              WHERE obs.g = dt.g AND obs.dur_h >= dt.t) AS n
      FROM dt
    ),
    curve AS (
      SELECT g, t,
             CASE WHEN MAX(CASE WHEN d >= n THEN 1 ELSE 0 END)
                    OVER (PARTITION BY g ORDER BY t
                          ROWS UNBOUNDED PRECEDING) = 1
                  THEN 0.0
                  ELSE ROUND(exp(CAST(SUM(CAST(ROUND(ln(1.0 - d * 1.0 / n), 10)
                                     AS DECIMAL(28,10)))
                              OVER (PARTITION BY g ORDER BY t
                                    ROWS UNBOUNDED PRECEDING)
                            AS DOUBLE)), 10) END AS sv
      FROM risk WHERE d < n
      UNION ALL
      SELECT g, t, 0.0 FROM risk WHERE d >= n
    ),
    aug AS (
      SELECT g, CAST(0 AS BIGINT) AS t, 1.0 AS sv
      FROM (SELECT DISTINCT g FROM obs)
      UNION ALL SELECT g, t, sv FROM curve
    ),
    step AS (
      SELECT g, t, sv,
             LEAD(t) OVER (PARTITION BY g ORDER BY t, sv DESC) AS nt
      FROM aug
    ),
    agg AS (
      SELECT g,
             CAST(SUM(CAST(ROUND(sv * (LEAST(COALESCE(nt, 168), 168) - t), 8)
                           AS DECIMAL(28,8))) AS DOUBLE) AS rmst
      FROM step WHERE t < 168 GROUP BY g
    )
    SELECT g AS user_parity, CAST(168 AS BIGINT) AS tau_hours,
           ROUND(rmst, 6) AS rmst_hours
    FROM agg ORDER BY user_parity
    """,
)
def rmst_by_user_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to tau=168h for each user-parity
    group — the clinically standard effect size to pair with the log-rank
    test: expected conversion-free hours within the first week. Per-group
    KM curves use the exp-of-decimal-ln-sums trick; the area adds one
    LEAD window and a decimal sum of ROUNDed rectangle areas.

    Scale shape: same bounded tables as kaplan_meier_survival, one extra
    |death times|-row window."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    death = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    last_seen = (
        ev.join(s.select("user_id"), "user_id")
        .groupBy("user_id")
        .agg(F.max("ts").alias("tl"))
    )
    obs = (
        s.join(death, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            (F.col("user_id") % 2).alias("g"),
            F.when(F.col("td").isNotNull(), 1).otherwise(0).alias("died"),
            F.floor(
                (F.unix_micros(F.coalesce("td", "tl")) - F.unix_micros("t0"))
                / 3600000000.0
            )
            .cast("long")
            .alias("dur_h"),
        )
        .persist()
    )
    dt = (
        obs.filter(F.col("died") == 1)
        .groupBy("g", F.col("dur_h").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    at_risk = obs.select(F.col("g").alias("rg"), F.col("dur_h").alias("r_dur"))
    risk = (
        dt.join(at_risk, (F.col("rg") == F.col("g")) & (F.col("r_dur") >= F.col("t")))
        .groupBy("g", "t", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = Window.partitionBy("g").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    alive = risk.filter(F.col("d") < F.col("n")).select(
        "g",
        "t",
        F.when(
            F.max(F.when(F.col("d") >= F.col("n"), 1).otherwise(0)).over(w_cum)
            == 1,
            F.lit(0.0),
        )
        .otherwise(
            F.round(
                F.exp(
                    F.sum(
                        F.round(
                            F.log(1.0 - F.col("d") * 1.0 / F.col("n")), 10
                        ).cast("decimal(28,10)")
                    )
                    .over(w_cum)
                    .cast("double")
                ),
                10,
            )
        )
        .alias("sv"),
    )
    dead = risk.filter(F.col("d") >= F.col("n")).select(
        "g", "t", F.lit(0.0).alias("sv")
    )
    aug = (
        obs.select("g")
        .distinct()
        .select("g", F.lit(0).cast("long").alias("t"), F.lit(1.0).alias("sv"))
        .unionAll(alive.unionAll(dead))
    )
    w_lead = Window.partitionBy("g").orderBy(F.asc("t"), F.desc("sv"))
    step = aug.withColumn("nt", F.lead("t").over(w_lead))
    agg = (
        step.filter(F.col("t") < 168)
        .groupBy("g")
        .agg(
            F.sum(
                F.round(
                    F.col("sv")
                    * (F.least(F.coalesce(F.col("nt"), F.lit(168)), F.lit(168)) - F.col("t")),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("rmst")
        )
    )
    return agg.select(
        F.col("g").alias("user_parity"),
        F.lit(168).cast("long").alias("tau_hours"),
        F.round("rmst", 6).alias("rmst_hours"),
    ).orderBy("user_parity")


@query(
    "ridge_normal_equations",
    oracle="""
    -- Ridge regression (lambda = 1) of event value on (hour, dow, 1) by
    -- the closed-form normal equations: X'X entries are EXACT integers
    -- (features are small ints), X'y rows are ROUND->DECIMAL sums, and
    -- the 3x3 solve is Cramer's rule written as the identical cofactor
    -- double chain in both engines — a regularized multi-feature trainer
    -- through the value-hash gate with ONE data pass + one residual pass.
    WITH f AS (
      SELECT CAST(hour(ts) AS BIGINT) AS h,
             CAST(isodow(ts) AS BIGINT) AS d,
             value AS y
      FROM events
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(h * h) AS BIGINT) + 1 AS a11,
             CAST(SUM(h * d) AS BIGINT) AS a12,
             CAST(SUM(h) AS BIGINT) AS a13,
             CAST(SUM(d * d) AS BIGINT) + 1 AS a22,
             CAST(SUM(d) AS BIGINT) AS a23,
             CAST(COUNT(*) AS BIGINT) + 1 AS a33,
             CAST(SUM(CAST(ROUND(h * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS b1,
             CAST(SUM(CAST(ROUND(d * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS b2,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS b3
      FROM f
    ),
    solve AS (
      SELECT n, b1, b2, b3,
             CAST(a11 AS DOUBLE) AS a11, CAST(a12 AS DOUBLE) AS a12,
             CAST(a13 AS DOUBLE) AS a13, CAST(a22 AS DOUBLE) AS a22,
             CAST(a23 AS DOUBLE) AS a23, CAST(a33 AS DOUBLE) AS a33
      FROM m
    ),
    dets AS (
      SELECT n, b1, b2, b3,
             a11 * (a22 * a33 - a23 * a23)
               - a12 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * a23 - a22 * a13) AS det,
             b1 * (a22 * a33 - a23 * a23)
               - a12 * (b2 * a33 - a23 * b3)
               + a13 * (b2 * a23 - a22 * b3) AS det1,
             a11 * (b2 * a33 - a23 * b3)
               - b1 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * b3 - b2 * a13) AS det2,
             a11 * (a22 * b3 - b2 * a23)
               - a12 * (a12 * b3 - b2 * a13)
               + b1 * (a12 * a23 - a22 * a13) AS det3
      FROM solve
    ),
    beta AS (
      SELECT n, det1 / det AS w_h, det2 / det AS w_d, det3 / det AS w_0
      FROM dets
    ),
    res AS (
      SELECT beta.n, beta.w_h, beta.w_d, beta.w_0,
             CAST(SUM(CAST(ROUND(
               (f.y - (beta.w_h * f.h + beta.w_d * f.d + beta.w_0))
               * (f.y - (beta.w_h * f.h + beta.w_d * f.d + beta.w_0)), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS sse
      FROM f CROSS JOIN beta
      GROUP BY 1, 2, 3, 4
    )
    SELECT n, ROUND(w_h, 8) AS w_hour, ROUND(w_d, 8) AS w_dow,
           ROUND(w_0, 8) AS intercept,
           ROUND(sqrt(sse / n), 6) AS rmse
    FROM res
    """,
)
def ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (lambda=1) of event value on hour-of-day and
    day-of-week by exact normal equations: the Gram matrix is integer-
    exact (small-int features), the moment vector uses rounded-term
    decimal sums, and the 3x3 solve is Cramer's rule as an identical
    cofactor chain in both engines (entries ~1e7 stay exact in doubles;
    the triple products that would overflow int64 are computed in
    floating point on exactly-representable integers). One scan builds
    the moments, one residual pass reports train RMSE.

    Scale shape: two map-side-combined scans and a broadcast 1-row
    coefficient cross join — the canonical closed-form distributed
    trainer; at 100 TB this is exactly how you fit small GLMs."""
    ev = load(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB isodow: 1=Mon..7=Sun.
    # Use the ISO convention on both sides.
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    f = ev.select(
        F.hour("ts").cast("long").alias("h"),
        iso_dow.cast("long").alias("d"),
        F.col("value").alias("y"),
    )
    dsum = lambda c: F.sum(F.round(c, 6).cast("decimal(28,6)")).cast(  # noqa: E731
        "double"
    )
    m = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(F.col("h") * F.col("h")).cast("long") + 1).alias("a11"),
        F.sum(F.col("h") * F.col("d")).cast("long").alias("a12"),
        F.sum("h").cast("long").alias("a13"),
        (F.sum(F.col("d") * F.col("d")).cast("long") + 1).alias("a22"),
        F.sum("d").cast("long").alias("a23"),
        (F.count(F.lit(1)).cast("long") + 1).alias("a33"),
        dsum(F.col("h") * F.col("y")).alias("b1"),
        dsum(F.col("d") * F.col("y")).alias("b2"),
        dsum(F.col("y")).alias("b3"),
    )
    # cofactor products on DOUBLE copies: entries (~1e8) are exactly
    # representable, but their triple products overflow int64 at sf0.1
    # (ANSI would throw); both engines run the identical double chain
    a11, a12, a13 = (F.col(c).cast("double") for c in ("a11", "a12", "a13"))
    a22, a23, a33 = (F.col(c).cast("double") for c in ("a22", "a23", "a33"))
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    solve = m.select(
        "n",
        "b1",
        "b2",
        "b3",
        (
            a11 * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)
        ).alias("det"),
        (
            b1 * (a22 * a33 - a23 * a23)
            - a12 * (b2 * a33 - a23 * b3)
            + a13 * (b2 * a23 - a22 * b3)
        ).alias("det1"),
        (
            a11 * (b2 * a33 - a23 * b3)
            - b1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * b3 - b2 * a13)
        ).alias("det2"),
        (
            a11 * (a22 * b3 - b2 * a23)
            - a12 * (a12 * b3 - b2 * a13)
            + b1 * (a12 * a23 - a22 * a13)
        ).alias("det3"),
    )
    beta = solve.select(
        "n",
        (F.col("det1") / F.col("det")).alias("w_h"),
        (F.col("det2") / F.col("det")).alias("w_d"),
        (F.col("det3") / F.col("det")).alias("w_0"),
    )
    pred_err = F.col("y") - (
        F.col("w_h") * F.col("h") + F.col("w_d") * F.col("d") + F.col("w_0")
    )
    res = (
        f.crossJoin(F.broadcast(beta))
        .groupBy("n", "w_h", "w_d", "w_0")
        .agg(dsum(pred_err * pred_err).alias("sse"))
    )
    return res.select(
        "n",
        F.round("w_h", 8).alias("w_hour"),
        F.round("w_d", 8).alias("w_dow"),
        F.round("w_0", 8).alias("intercept"),
        F.round(F.sqrt(F.col("sse") / F.col("n")), 6).alias("rmse"),
    )


@query(
    "cochran_armitage_trend",
    oracle="""
    -- Cochran-Armitage test for a linear trend in purchase share across
    -- the ordered hour-of-day factor: with integer scores i, the
    -- statistic's numerator N*sum(i*x_i) - X*sum(i*n_i) is EXACT in
    -- int64; the variance pieces stay as exact integers too and only
    -- combine in the final double formula (their int64 product would
    -- overflow), written identically in both engines.
    WITH h AS (
      SELECT CAST(hour(ts) AS BIGINT) AS i, CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x_i
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(x_i) AS BIGINT) AS x,
             CAST(SUM(i * n_i) AS BIGINT) AS sin,
             CAST(SUM(i * x_i) AS BIGINT) AS six,
             CAST(SUM(i * i * n_i) AS BIGINT) AS si2n
      FROM h
    )
    SELECT n, x,
           ROUND((n * six - x * sin)
                 * sqrt(CAST(n AS DOUBLE))
                 / sqrt(CAST(x AS DOUBLE) * (n - x))
                 / sqrt(CAST(n AS DOUBLE) * si2n - CAST(sin AS DOUBLE) * sin),
                 6) AS z_trend
    FROM m
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage linear-trend test: does the purchase share drift
    monotonically across the hour-of-day factor? The dose-response member
    of the categorical family (chi-square/G-test see ANY association;
    CA targets ordered trend with more power). The scaled numerator
    N*sum(i*x) - X*sum(i*n) is exact int64; variance factors combine only
    in the final double expression (identical text both engines) because
    their integer product would overflow.

    Scale shape: one 24-row grouped aggregate; everything else scalar."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(F.hour("ts").cast("long").alias("i")).agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("x_i"),
    )
    m = h.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("x_i").cast("long").alias("x"),
        F.sum(F.col("i") * F.col("n_i")).cast("long").alias("sin"),
        F.sum(F.col("i") * F.col("x_i")).cast("long").alias("six"),
        F.sum(F.col("i") * F.col("i") * F.col("n_i")).cast("long").alias("si2n"),
    )
    return m.select(
        "n",
        "x",
        F.round(
            (F.col("n") * F.col("six") - F.col("x") * F.col("sin"))
            * F.sqrt(F.col("n").cast("double"))
            / F.sqrt(F.col("x").cast("double") * (F.col("n") - F.col("x")))
            / F.sqrt(
                F.col("n").cast("double") * F.col("si2n")
                - F.col("sin").cast("double") * F.col("sin")
            ),
            6,
        ).alias("z_trend"),
    )


@query(
    "negbin_overdispersion_fit",
    oracle=_daily_series_sql()
    + """,
    m2 AS (
      SELECT st.n, st.sx, CAST(SUM(x * x) AS BIGINT) AS sx2
      FROM idx CROSS JOIN st GROUP BY st.n, st.sx
    )
    SELECT n AS n_days,
           ROUND(sx * 1.0 / n, 6) AS mean_daily,
           ROUND(sx2 * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n), 6)
             AS var_daily,
           ROUND((sx2 * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n))
                 / (sx * 1.0 / n), 6) AS fano,
           ROUND((sx * 1.0 / n) * (sx * 1.0 / n)
                 / ((sx2 * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n))
                    - sx * 1.0 / n), 6) AS nb_r,
           ROUND((sx * 1.0 / n)
                 / (sx2 * 1.0 / n - (sx * 1.0 / n) * (sx * 1.0 / n)), 6)
             AS nb_p
    FROM m2
    """,
)
def negbin_overdispersion_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnosis of the daily event-count series: Fano
    factor (var/mean — 1 under Poisson) and the method-of-moments
    negative-binomial fit (r = m^2/(v-m), p = m/v) — the distributional
    check that decides whether Poisson-based alerting thresholds are
    honest. Moments are exact integer sums; ratios are identical double
    divisions.

    Scale shape: one map-side day aggregation; scalar closed forms."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    m2 = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
    )
    mean = F.col("sx") * 1.0 / F.col("n")
    var = F.col("sx2") * 1.0 / F.col("n") - mean * mean
    return m2.select(
        F.col("n").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(var / mean, 6).alias("fano"),
        F.round(mean * mean / (var - mean), 6).alias("nb_r"),
        F.round(mean / var, 6).alias("nb_p"),
    )


@query(
    "cox_one_step_hazard_ratio",
    oracle="""
    -- One Newton step of the Cox proportional-hazards partial likelihood
    -- from beta=0, binary covariate = user parity, Breslow ties: at each
    -- death time the score contributes d1 - d*n1/n and the information
    -- d*(n1/n)*(1-n1/n); beta_1 = U/I, HR = exp(beta_1), SE = 1/sqrt(I).
    -- The survival family's effect estimator (log-rank tests, RMST
    -- describes, Cox quantifies). Same exact risk tables as the log-rank;
    -- score/information terms ROUND@10 into DECIMAL sums.
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts) AS td
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s.t0
      GROUP BY e.user_id
    ),
    last_seen AS (
      SELECT e.user_id, MAX(e.ts) AS tl
      FROM events e JOIN s USING (user_id)
      GROUP BY e.user_id
    ),
    obs AS (
      SELECT s.user_id % 2 AS g,
             CASE WHEN d.td IS NOT NULL THEN 1 ELSE 0 END AS died,
             CAST(FLOOR((epoch_us(COALESCE(d.td, l.tl)) - epoch_us(s.t0))
                        / 3600000000.0) AS BIGINT) AS dur_h
      FROM s
      LEFT JOIN death d USING (user_id)
      JOIN last_seen l USING (user_id)
    ),
    dt AS (
      SELECT dur_h AS t, COUNT(*) AS d,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1
      FROM obs WHERE died = 1 GROUP BY dur_h
    ),
    risk AS (
      SELECT dt.t, dt.d, dt.d1,
             (SELECT COUNT(*) FROM obs WHERE obs.dur_h >= dt.t) AS n,
             (SELECT COUNT(*) FROM obs
              WHERE obs.dur_h >= dt.t AND obs.g = 1) AS n1
      FROM dt
    ),
    agg AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(CAST(ROUND(d * n1 * 1.0 / n, 10) AS DECIMAL(28,10)))
               AS DOUBLE) AS e1,
             CAST(SUM(CAST(ROUND(d * (n1 * 1.0 / n) * (1.0 - n1 * 1.0 / n),
                                 10) AS DECIMAL(28,10))) AS DOUBLE) AS info
      FROM risk
    )
    SELECT o1, ROUND(e1, 6) AS e1, ROUND(info, 6) AS information,
           ROUND((o1 - e1) / info, 6) AS beta_one_step,
           ROUND(exp((o1 - e1) / info), 6) AS hazard_ratio,
           ROUND(1.0 / sqrt(info), 6) AS se_beta,
           ROUND((o1 - e1) / sqrt(info), 6) AS score_z
    FROM agg
    """,
)
def cox_one_step_hazard_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Newton step of Cox partial likelihood from beta=0 (binary
    covariate = user parity, Breslow tie handling): U = sum(d1 - d*n1/n),
    I = sum d*(n1/n)(1-n1/n), beta = U/I, hazard ratio = exp(beta) —
    the survival family's EFFECT ESTIMATOR (the log-rank tests, RMST
    describes, Cox quantifies; the score z here IS the Breslow-variance
    log-rank). Same bounded risk tables; rounded-term decimal sums.

    Scale shape: identical to logrank_test_user_parity."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    death = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("td"))
    )
    last_seen = (
        ev.join(s.select("user_id"), "user_id")
        .groupBy("user_id")
        .agg(F.max("ts").alias("tl"))
    )
    obs = (
        s.join(death, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            (F.col("user_id") % 2).alias("g"),
            F.when(F.col("td").isNotNull(), 1).otherwise(0).alias("died"),
            F.floor(
                (F.unix_micros(F.coalesce("td", "tl")) - F.unix_micros("t0"))
                / 3600000000.0
            )
            .cast("long")
            .alias("dur_h"),
        )
        .persist()
    )
    dt = (
        obs.filter(F.col("died") == 1)
        .groupBy(F.col("dur_h").alias("t"))
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sum((F.col("g") == 1).cast("long")).cast("long").alias("d1"),
        )
    )
    at_risk = obs.select(F.col("dur_h").alias("r_dur"), F.col("g").alias("r_g"))
    risk = (
        dt.join(at_risk, F.col("r_dur") >= F.col("t"))
        .groupBy("t", "d", "d1")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("r_g") == 1).cast("long")).alias("n1"),
        )
    )
    p1 = F.col("n1") * 1.0 / F.col("n")
    agg = risk.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.round(F.col("d") * p1, 10).cast("decimal(28,10)"))
        .cast("double")
        .alias("e1"),
        F.sum(F.round(F.col("d") * p1 * (1.0 - p1), 10).cast("decimal(28,10)"))
        .cast("double")
        .alias("info"),
    )
    u = F.col("o1") - F.col("e1")
    return agg.select(
        "o1",
        F.round("e1", 6).alias("e1"),
        F.round("info", 6).alias("information"),
        F.round(u / F.col("info"), 6).alias("beta_one_step"),
        F.round(F.exp(u / F.col("info")), 6).alias("hazard_ratio"),
        F.round(1.0 / F.sqrt(F.col("info")), 6).alias("se_beta"),
        F.round(u / F.sqrt(F.col("info")), 6).alias("score_z"),
    )


@query(
    "cumulative_gains_deciles",
    oracle="""
    -- Cumulative gains / lift table: rank documents by the length score
    -- descending, cut into 10 integer deciles ((rank-1)*10 div N), and
    -- report what share of all positives (lang='en') each cumulative
    -- decile captures and its lift over random targeting — the chart a
    -- ranking model ships with alongside its AUC. All counts integer;
    -- ratios are identical int/int divisions.
    WITH r AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS p FROM r),
    d AS (
      SELECT CAST(((rk - 1) * 10) // nn.n AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM r CROSS JOIN nn GROUP BY 1
    ),
    c AS (
      SELECT decile, n_docs, n_pos,
             CAST(SUM(n_docs) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
             CAST(SUM(n_pos) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
      FROM d
    )
    SELECT c.decile, c.n_docs, c.n_pos,
           ROUND(c.cum_pos * 1.0 / nn.p, 6) AS cum_capture,
           ROUND((c.cum_pos * 1.0 / c.cum_docs) / (nn.p * 1.0 / nn.n), 6)
             AS cum_lift
    FROM c CROSS JOIN nn ORDER BY c.decile
    """,
)
def cumulative_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile for the length-based
    English classifier — the targeting chart that pairs with ROC AUC:
    decile k's cumulative capture (share of all positives reached) and
    lift over random. Integer decile cuts ((rank-1)*10 div N) and exact
    count ratios keep the whole table engine-exact.

    Scale shape: one global rank window (at production scale: pre-bin by
    score histogram instead of ranking raw rows — same table, coarser
    cut); everything else is a 10-row rollup."""
    docs = load(spark, sf_dir, "documents")
    r = docs.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .alias("rk"),
    )
    nn = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
    )
    d = (
        r.crossJoin(F.broadcast(nn))
        .groupBy(
            F.floor((F.col("rk") - 1) * 10 / F.col("n")).cast("long").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "decile",
        "n_docs",
        "n_pos",
        F.sum("n_docs").over(w_cum).cast("long").alias("cum_docs"),
        F.sum("n_pos").over(w_cum).cast("long").alias("cum_pos"),
    )
    return (
        c.crossJoin(F.broadcast(nn))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.round(F.col("cum_pos") * 1.0 / F.col("p"), 6).alias("cum_capture"),
            F.round(
                (F.col("cum_pos") * 1.0 / F.col("cum_docs"))
                / (F.col("p") * 1.0 / F.col("n")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


@query(
    "dalenius_hodges_strata",
    oracle="""
    -- Dalenius-Hodges cum-sqrt(f) stratification of the order-value
    -- distribution into 4 strata: bin o_totalprice on a fixed integer
    -- grid, accumulate ROUND@8 sqrt(freq) terms as decimals, and cut
    -- where the cumulative crosses k/4 of the total — the boundary-design
    -- step that the Neyman allocation query takes as given. Stratum
    -- assignment ceil(4 * cum / total) is a comparison on the same
    -- decimal-summed doubles in both engines.
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice / 20000) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS f
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT bin, f,
             CAST(SUM(CAST(ROUND(sqrt(f), 8) AS DECIMAL(28,8)))
               OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
      FROM b
    ),
    t AS (SELECT MAX(cum) AS tot FROM c),
    assigned AS (
      SELECT c.bin, c.f,
             LEAST(CAST(CEIL(4.0 * c.cum / t.tot) AS BIGINT), 4) AS stratum
      FROM c CROSS JOIN t
    )
    SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MIN(bin) AS BIGINT) AS bin_lo,
           CAST(MAX(bin) AS BIGINT) AS bin_hi,
           CAST(SUM(f) AS BIGINT) AS n_orders
    FROM assigned GROUP BY stratum ORDER BY stratum
    """,
)
def dalenius_hodges_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dalenius-Hodges cumulative-sqrt(f) rule: design 4 near-optimal
    stratum boundaries over the order-value distribution — the boundary
    step ahead of stratified_neyman_sample's allocation step (together
    they are the textbook design-based sampling pipeline). The cum-sqrt
    accumulation is a rounded-term decimal window sum; stratum cuts are
    ceil comparisons on identical doubles.

    Scale shape: one map-side histogram; the rule runs on the bounded
    bin table."""
    orders = load(spark, sf_dir, "orders")
    b = orders.groupBy(
        F.floor(F.col("o_totalprice") / 20000).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("f"))
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = b.select(
        "bin",
        "f",
        F.sum(F.round(F.sqrt("f"), 8).cast("decimal(28,8)"))
        .over(w_cum)
        .cast("double")
        .alias("cum"),
    )
    t = c.agg(F.max("cum").alias("tot"))
    assigned = c.crossJoin(F.broadcast(t)).select(
        "bin",
        "f",
        F.least(
            F.ceil(4.0 * F.col("cum") / F.col("tot")).cast("long"), F.lit(4)
        ).alias("stratum"),
    )
    return (
        assigned.groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.min("bin").cast("long").alias("bin_lo"),
            F.max("bin").cast("long").alias("bin_hi"),
            F.sum("f").cast("long").alias("n_orders"),
        )
        .orderBy("stratum")
    )


@query(
    "mann_kendall_trend",
    oracle=_daily_series_sql()
    + """,
    pairs AS (
      SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM idx a JOIN idx b ON b.t > a.t
    ),
    ties AS (
      SELECT COALESCE(CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tg FROM idx GROUP BY x)
      WHERE tg > 1
    )
    SELECT st.n AS n_days, p.s,
           ROUND((st.n * (st.n - 1) * (2 * st.n + 5) - t.tie_term) / 18.0, 6)
             AS var_s,
           ROUND(CASE WHEN p.s > 0 THEN (p.s - 1)
                      WHEN p.s < 0 THEN (p.s + 1)
                      ELSE 0 END
                 / sqrt((st.n * (st.n - 1) * (2 * st.n + 5) - t.tie_term)
                        / 18.0), 6) AS z_mk
    FROM pairs p CROSS JOIN ties t CROSS JOIN st
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the daily event-count series — the
    nonparametric partner of the Theil-Sen slope (MK decides IF there is
    a monotone trend; Sen's slope says how steep): S = sum of pairwise
    signs (exact integer over the |days|^2 pair join), tie-corrected
    variance as an exact rational, continuity-corrected z.

    Scale shape: day aggregate (map-side), then a calendar-bounded pair
    join."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
        "x",
    ).persist()
    st = idx.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = idx.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = idx.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("tb") > F.col("ta")).agg(
        F.sum(
            F.when(F.col("xb") > F.col("xa"), 1)
            .when(F.col("xb") < F.col("xa"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s")
    )
    ties = (
        idx.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("tg"))
        .filter(F.col("tg") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tg") * (F.col("tg") - 1) * (2 * F.col("tg") + 5)
                ).cast("long"),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    var_expr = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z_num = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    return (
        pairs.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(st))
        .select(
            F.col("n").alias("n_days"),
            "s",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z_num / F.sqrt(var_expr), 6).alias("z_mk"),
        )
    )


@query(
    "runs_test_daily",
    oracle=_daily_series_sql()
    + """,
    med AS (
      -- lower median by integer rank: exact, engine-identical
      SELECT x AS m FROM (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, t) AS r FROM idx
      ) CROSS JOIN st WHERE r = (st.n + 1) // 2
    ),
    signs AS (
      SELECT t, CASE WHEN x > m THEN 1 ELSE 0 END AS s
      FROM idx CROSS JOIN med WHERE x <> m
    ),
    seq AS (
      SELECT s, LAG(s) OVER (ORDER BY t) AS prev FROM signs
    ),
    agg AS (
      SELECT CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS runs,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2
      FROM seq
    )
    SELECT runs, n1, n2,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1.0, 6) AS mu_runs,
           ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * 1.0 * (n1 + n2 - 1))), 6)
             AS z_runs
    FROM agg
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily count series
    around its (lower) median — the serial-dependence check that says
    whether treating days as i.i.d. (as the bootstrap and CLT error bars
    do) is defensible. Median by integer rank, runs and group counts
    exact integers, closed-form z.

    Scale shape: day aggregate + |days|-row windows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
        "x",
    ).persist()
    st = idx.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = idx.select(
        "x", F.row_number().over(Window.orderBy("x", "t")).cast("long").alias("r")
    )
    med = (
        ranked.crossJoin(F.broadcast(st))
        .filter(F.col("r") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("x").alias("m"))
    )
    signs = (
        idx.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("t", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    seq = signs.select(
        "s", F.lag("s").over(Window.orderBy("t")).alias("prev")
    )
    agg = seq.agg(
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("s") != F.col("prev")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    mu = 2.0 * F.col("n1") * F.col("n2") / (F.col("n1") + F.col("n2")) + 1.0
    nn = F.col("n1") + F.col("n2")
    sig = F.sqrt(
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (nn * nn * 1.0 * (nn - 1))
    )
    return agg.select(
        "runs",
        "n1",
        "n2",
        F.round(mu, 6).alias("mu_runs"),
        F.round((F.col("runs") - mu) / sig, 6).alias("z_runs"),
    )


@query(
    "durbin_watson_daily",
    oracle=_daily_series_sql()
    + """,
    y AS (
      SELECT idx.t, st.n * idx.x - st.sx AS y
      FROM idx CROSS JOIN st
    ),
    dw AS (
      SELECT
        CAST((SELECT SUM((b.y - a.y) * (b.y - a.y))
              FROM y a JOIN y b ON b.t = a.t + 1) AS BIGINT) AS num,
        CAST((SELECT SUM(a.y * a.y) FROM y a) AS BIGINT) AS den
    )
    SELECT st.n AS n_days, dw.num, dw.den,
           ROUND(dw.num * 1.0 / dw.den, 6) AS dw_stat
    FROM dw CROSS JOIN st
    """,
)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation statistic of the mean-centered daily
    series: DW = sum of squared successive residual differences over the
    residual sum of squares. The n*x - S centering keeps BOTH sums exact
    integers (the common n^2 scale cancels in the ratio), so DW ~ 2(1 -
    rho1) comes out of one exact division — the diagnostic that pairs
    with the Yule-Walker fit.

    Scale shape: day aggregate + one lag self-join on the bounded series."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).cast("long").alias("t"),
        "x",
    )
    st = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    y = idx.crossJoin(F.broadcast(st)).select(
        "t", (F.col("n") * F.col("x") - F.col("sx")).alias("y")
    ).persist()
    a = y.select(F.col("t").alias("ta"), F.col("y").alias("ya"))
    b = y.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    num = a.join(b, F.col("tb") == F.col("ta") + 1).agg(
        F.sum((F.col("yb") - F.col("ya")) * (F.col("yb") - F.col("ya")))
        .cast("long")
        .alias("num")
    )
    den = y.agg(F.sum(F.col("y") * F.col("y")).cast("long").alias("den"))
    return (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(st))
        .select(
            F.col("n").alias("n_days"),
            "num",
            "den",
            F.round(F.col("num") * 1.0 / F.col("den"), 6).alias("dw_stat"),
        )
    )


@query(
    "granger_causality_click_purchase",
    oracle="""
    -- Does yesterday's click volume help predict today's purchase volume
    -- beyond purchase history itself? Granger causality, 1 lag: full OLS
    -- y_t ~ [1, y_{t-1}, x_{t-1}] vs restricted y_t ~ [1, y_{t-1}],
    -- F = (SSE_r - SSE_f) / (SSE_f / (n-3)). Counts are integers, so both
    -- Gram matrices and moment vectors are EXACT int64; the solves are
    -- Cramer cofactor chains on double-cast entries (identical text both
    -- engines) and the SSE passes use ROUND->DECIMAL sums.
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, y, x
      FROM daily
    ),
    r AS (
      SELECT a.y AS yt, b.y AS yl, b.x AS xl
      FROM idx a JOIN idx b ON a.t = b.t + 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yl) AS BIGINT) AS syl,
             CAST(SUM(xl) AS BIGINT) AS sxl,
             CAST(SUM(yl * yl) AS BIGINT) AS syy,
             CAST(SUM(yl * xl) AS BIGINT) AS syx,
             CAST(SUM(xl * xl) AS BIGINT) AS sxx,
             CAST(SUM(yt) AS BIGINT) AS sy,
             CAST(SUM(yl * yt) AS BIGINT) AS sly,
             CAST(SUM(xl * yt) AS BIGINT) AS slx
      FROM r
    ),
    d AS (
      SELECT CAST(n AS DOUBLE) AS n, CAST(syl AS DOUBLE) AS a12,
             CAST(sxl AS DOUBLE) AS a13, CAST(syy AS DOUBLE) AS a22,
             CAST(syx AS DOUBLE) AS a23, CAST(sxx AS DOUBLE) AS a33,
             CAST(sy AS DOUBLE) AS b1, CAST(sly AS DOUBLE) AS b2,
             CAST(slx AS DOUBLE) AS b3
      FROM m
    ),
    fullm AS (
      SELECT n, b1, b2, b3, a12, a13, a22, a23, a33,
             n * (a22 * a33 - a23 * a23)
               - a12 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * a23 - a22 * a13) AS det,
             b1 * (a22 * a33 - a23 * a23)
               - a12 * (b2 * a33 - a23 * b3)
               + a13 * (b2 * a23 - a22 * b3) AS det1,
             n * (b2 * a33 - a23 * b3)
               - b1 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * b3 - b2 * a13) AS det2,
             n * (a22 * b3 - b2 * a23)
               - a12 * (a12 * b3 - b2 * a13)
               + b1 * (a12 * a23 - a22 * a13) AS det3
      FROM d
    ),
    beta AS (
      SELECT n, det1 / det AS f0, det2 / det AS f1, det3 / det AS f2,
             (b1 * a22 - a12 * b2) / (n * a22 - a12 * a12) AS r0,
             (n * b2 - a12 * b1) / (n * a22 - a12 * a12) AS r1
      FROM fullm
    ),
    sse AS (
      SELECT beta.n, beta.f1, beta.f2,
             CAST(SUM(CAST(ROUND(
               (r.yt - (beta.f0 + beta.f1 * r.yl + beta.f2 * r.xl))
               * (r.yt - (beta.f0 + beta.f1 * r.yl + beta.f2 * r.xl)), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS sse_f,
             CAST(SUM(CAST(ROUND(
               (r.yt - (beta.r0 + beta.r1 * r.yl))
               * (r.yt - (beta.r0 + beta.r1 * r.yl)), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS sse_r
      FROM r CROSS JOIN beta
      GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n_eff, ROUND(f1, 8) AS beta_y_lag,
           ROUND(f2, 8) AS beta_x_lag,
           ROUND(sse_f, 4) AS sse_full, ROUND(sse_r, 4) AS sse_restricted,
           ROUND((sse_r - sse_f) / (sse_f / (n - 3)), 6) AS f_granger
    FROM sse
    """,
)
def granger_causality_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality (1 lag): does the click series improve one-step
    prediction of the purchase series beyond its own history? Full and
    restricted OLS solved in closed form from EXACT integer Gram matrices
    (daily counts are integers, so every cross-moment is int64-exact; the
    solves double-cast entries before the Cramer cofactor products), one
    residual pass per model, F from the SSE gap — the causal-screening
    member of the time-series family next to AR(2)/MASE/MK/DW.

    Scale shape: one map-side day aggregate; the lag join and both
    residual passes run on the calendar-bounded series."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("y"),
        F.sum((F.col("event_type") == "click").cast("long"))
        .cast("long")
        .alias("x"),
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        "y",
        "x",
    )
    a = idx.select(F.col("t").alias("ta"), F.col("y").alias("yt"))
    b = idx.select(
        F.col("t").alias("tb"), F.col("y").alias("yl"), F.col("x").alias("xl")
    )
    r = a.join(b, F.col("ta") == F.col("tb") + 1).select("yt", "yl", "xl").persist()
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("yl").cast("long").alias("syl"),
        F.sum("xl").cast("long").alias("sxl"),
        F.sum(F.col("yl") * F.col("yl")).cast("long").alias("syy"),
        F.sum(F.col("yl") * F.col("xl")).cast("long").alias("syx"),
        F.sum(F.col("xl") * F.col("xl")).cast("long").alias("sxx"),
        F.sum("yt").cast("long").alias("sy"),
        F.sum(F.col("yl") * F.col("yt")).cast("long").alias("sly"),
        F.sum(F.col("xl") * F.col("yt")).cast("long").alias("slx"),
    )
    d = m.select(
        F.col("n").cast("double").alias("n"),
        F.col("syl").cast("double").alias("a12"),
        F.col("sxl").cast("double").alias("a13"),
        F.col("syy").cast("double").alias("a22"),
        F.col("syx").cast("double").alias("a23"),
        F.col("sxx").cast("double").alias("a33"),
        F.col("sy").cast("double").alias("b1"),
        F.col("sly").cast("double").alias("b2"),
        F.col("slx").cast("double").alias("b3"),
    )
    n, a12, a13 = F.col("n"), F.col("a12"), F.col("a13")
    a22, a23, a33 = F.col("a22"), F.col("a23"), F.col("a33")
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    fullm = d.select(
        "n",
        "b1",
        "b2",
        "b3",
        "a12",
        "a13",
        "a22",
        "a23",
        "a33",
        (
            n * (a22 * a33 - a23 * a23)
            - a12 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * a23 - a22 * a13)
        ).alias("det"),
        (
            b1 * (a22 * a33 - a23 * a23)
            - a12 * (b2 * a33 - a23 * b3)
            + a13 * (b2 * a23 - a22 * b3)
        ).alias("det1"),
        (
            n * (b2 * a33 - a23 * b3)
            - b1 * (a12 * a33 - a23 * a13)
            + a13 * (a12 * b3 - b2 * a13)
        ).alias("det2"),
        (
            n * (a22 * b3 - b2 * a23)
            - a12 * (a12 * b3 - b2 * a13)
            + b1 * (a12 * a23 - a22 * a13)
        ).alias("det3"),
    )
    beta = fullm.select(
        "n",
        (F.col("det1") / F.col("det")).alias("f0"),
        (F.col("det2") / F.col("det")).alias("f1"),
        (F.col("det3") / F.col("det")).alias("f2"),
        ((b1 * a22 - a12 * b2) / (n * a22 - a12 * a12)).alias("r0"),
        ((n * b2 - a12 * b1) / (n * a22 - a12 * a12)).alias("r1"),
    )
    ef = F.col("yt") - (
        F.col("f0") + F.col("f1") * F.col("yl") + F.col("f2") * F.col("xl")
    )
    er = F.col("yt") - (F.col("r0") + F.col("r1") * F.col("yl"))
    sse = (
        r.crossJoin(F.broadcast(beta))
        .groupBy("n", "f1", "f2")
        .agg(
            F.sum(F.round(ef * ef, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("sse_f"),
            F.sum(F.round(er * er, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("sse_r"),
        )
    )
    return sse.select(
        F.col("n").cast("long").alias("n_eff"),
        F.round("f1", 8).alias("beta_y_lag"),
        F.round("f2", 8).alias("beta_x_lag"),
        F.round("sse_f", 4).alias("sse_full"),
        F.round("sse_r", 4).alias("sse_restricted"),
        F.round(
            (F.col("sse_r") - F.col("sse_f")) / (F.col("sse_f") / (F.col("n") - 3)),
            6,
        ).alias("f_granger"),
    )


def _stump_oracle() -> str:
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.text import (
        EN_STOPWORDS,
    )

    stops = "('" + "','".join(EN_STOPWORDS) + "')"
    return f"""
    -- exact Gini-optimal decision stump: all operands exact int64 (see the
    -- Spark docstring); argmax on score = (A*n_r + B*n_l)/(n_l*n_r), the
    -- monotone transform of weighted Gini; window SUM cast to BIGINT
    -- (DuckDB returns HUGEINT).
    WITH d AS (
      SELECT n_chars AS x,
             CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                       w -> w IN {stops})) * 1.0
                       / len(list_filter(string_split(lower(text), ' '),
                                         w -> w <> '')) >= 0.05
                  THEN 1 ELSE 0 END AS y
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos FROM d),
    g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(y) AS BIGINT) AS p FROM d GROUP BY x),
    cum AS (
      SELECT x, CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) AS nl,
             CAST(SUM(p) OVER (ORDER BY x) AS BIGINT) AS pl
      FROM g
    ),
    sc AS (
      SELECT c.x AS t, tot.n, tot.pos,
             c.nl AS n_left, tot.n - c.nl AS n_right,
             c.pl AS pos_left, tot.pos - c.pl AS pos_right,
             (c.pl * c.pl + (c.nl - c.pl) * (c.nl - c.pl)) AS a_sq,
             ((tot.pos - c.pl) * (tot.pos - c.pl)
              + ((tot.n - c.nl) - (tot.pos - c.pl))
                * ((tot.n - c.nl) - (tot.pos - c.pl))) AS b_sq
      FROM cum c CROSS JOIN tot WHERE c.nl < tot.n
    ),
    scored AS (
      SELECT t, n, pos, n_left, n_right, pos_left, pos_right,
             (a_sq * n_right + b_sq * n_left) * 1.0 / (n_left * n_right)
               AS score
      FROM sc
    )
    SELECT t AS split_threshold, n_left, n_right, pos_left, pos_right,
           ROUND(1.0 - (pos * pos + (n - pos) * (n - pos)) * 1.0 / (n * n), 6)
             AS base_gini,
           ROUND(1.0 - score / n, 6) AS split_gini,
           ROUND(score / n
                 - (pos * pos + (n - pos) * (n - pos)) * 1.0 / (n * n), 6)
             AS gini_gain
    FROM scored
    ORDER BY score DESC, t
    LIMIT 1
    """


@query("decision_stump_quality", oracle=_stump_oracle())
def decision_stump_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump training through the value-hash gate — the
    TREE member of the trainer family (beside the logistic GD loop, ridge
    normal equations, rank-1 ALS and naive Bayes): predict the stopword-
    ratio quality gate (>= 0.05) from document length by choosing the
    Gini-optimal split threshold over ALL distinct n_chars values.

    Exactness: with cumulative (n_l, pos_l) over the sorted distinct
    feature values, minimizing weighted Gini is maximizing score(t) =
    (A*n_r + B*n_l)/(n_l*n_r) with A/B the left/right pos^2+neg^2 sums —
    every operand an exact int64 (< 2^53 products at every sf), so the
    argmax ordering and the reported impurities are identical doubles
    cross-engine; ties break on the smaller threshold.

    Scale shape: one scan for labels, one groupBy on the feature, a
    cumulative window over DISTINCT feature values (bounded by the value
    support, not rows — the same candidate-split compression every
    histogram-based GBDT uses), one TakeOrdered for the argmax."""
    docs = load(spark, sf_dir, "documents")
    d = stump_labeled_features(docs)
    g = d.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("p"),
    )
    return stump_split_from_counts(g)


def stump_labeled_features(docs: DataFrame) -> DataFrame:
    """(x = n_chars, y = stopword-ratio >= 0.05) rows — the labeled feature
    stream the batch and streaming stump trainers share."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import (
        text as T,
    )

    ws_n = F.size(T.word_tokens(F.col("text")))
    return docs.filter(ws_n > 0).select(
        F.col("n_chars").alias("x"),
        F.when(T.stopword_ratio(F.col("text")) >= 0.05, 1)
        .otherwise(0)
        .alias("y"),
    )


def stump_split_from_counts(g: DataFrame) -> DataFrame:
    """Gini-optimal stump from the per-feature-value sufficient statistic
    g(x, c, p) — the fold both the batch trainer and the streaming
    histogram state share (the table is additive, so any partition of the
    input rows yields the same g and therefore the same split)."""
    tot = g.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("p").cast("long").alias("pos"),
    )
    w = Window.orderBy("x")
    cum = g.select(
        "x",
        F.sum("c").over(w).cast("long").alias("nl"),
        F.sum("p").over(w).cast("long").alias("pl"),
    )
    sc = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
        .select(
            F.col("x").alias("t"),
            "n",
            "pos",
            F.col("nl").alias("n_left"),
            (F.col("n") - F.col("nl")).alias("n_right"),
            F.col("pl").alias("pos_left"),
            (F.col("pos") - F.col("pl")).alias("pos_right"),
        )
        .withColumn(
            "a_sq",
            F.col("pos_left") * F.col("pos_left")
            + (F.col("n_left") - F.col("pos_left"))
            * (F.col("n_left") - F.col("pos_left")),
        )
        .withColumn(
            "b_sq",
            F.col("pos_right") * F.col("pos_right")
            + (F.col("n_right") - F.col("pos_right"))
            * (F.col("n_right") - F.col("pos_right")),
        )
        .withColumn(
            "score",
            (F.col("a_sq") * F.col("n_right") + F.col("b_sq") * F.col("n_left"))
            * F.lit(1.0)
            / (F.col("n_left") * F.col("n_right")),
        )
    )
    base = F.lit(1.0) - (
        F.col("pos") * F.col("pos")
        + (F.col("n") - F.col("pos")) * (F.col("n") - F.col("pos"))
    ) * F.lit(1.0) / (F.col("n") * F.col("n"))
    return (
        sc.orderBy(F.desc("score"), "t")
        .limit(1)
        .select(
            F.col("t").alias("split_threshold"),
            "n_left",
            "n_right",
            "pos_left",
            "pos_right",
            F.round(base, 6).alias("base_gini"),
            F.round(F.lit(1.0) - F.col("score") / F.col("n"), 6).alias(
                "split_gini"
            ),
            F.round(
                F.col("score") / F.col("n")
                - (
                    F.col("pos") * F.col("pos")
                    + (F.col("n") - F.col("pos")) * (F.col("n") - F.col("pos"))
                )
                * F.lit(1.0)
                / (F.col("n") * F.col("n")),
                6,
            ).alias("gini_gain"),
        )
    )




# ---------------------------------------------------------------------------
# Generation-eval metrics: ROUGE-N and corpus BLEU — the n-gram-overlap
# scorecards an LLM-data team runs between candidate generations and their
# references. Pairing on the fixture: every doc whose id is not a multiple
# of 10 is a "candidate" scored against its decile head (doc_id - doc_id%10)
# as "reference". All match counts are clipped EXACT integers; only the
# final divisions are floats.

_ROUGE_PAIR_SQL = """
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
      FROM documents
    ), base AS (
      SELECT doc_id, lang, toks, len(toks) AS n1,
             GREATEST(len(toks) - 1, 0) AS n2,
             doc_id - doc_id % 10 AS ref_id
      FROM d
    ), pairs AS (
      SELECT c.doc_id, c.lang, c.toks AS ct, r.toks AS rt,
             c.n1 AS tc1, c.n2 AS tc2, r.n1 AS tr1, r.n2 AS tr2
      FROM base c JOIN base r ON r.doc_id = c.ref_id
      WHERE c.doc_id % 10 <> 0
    ), cg AS (
      SELECT doc_id, g, COUNT(*) AS cc FROM (
        SELECT doc_id, unnest(ct) AS g FROM pairs
        UNION ALL
        SELECT doc_id,
               unnest([ct[i] || ' ' || ct[i+1] for i in range(1, len(ct))])
        FROM pairs
      ) GROUP BY doc_id, g
    ), rg AS (
      SELECT doc_id, g, COUNT(*) AS cr FROM (
        SELECT doc_id, unnest(rt) AS g FROM pairs
        UNION ALL
        SELECT doc_id,
               unnest([rt[i] || ' ' || rt[i+1] for i in range(1, len(rt))])
        FROM pairs
      ) GROUP BY doc_id, g
    ), m AS (
      SELECT cg.doc_id,
             CAST(SUM(CASE WHEN cg.g NOT LIKE '% %'
                           THEN LEAST(cg.cc, rg.cr) ELSE 0 END) AS BIGINT)
               AS m1,
             CAST(SUM(CASE WHEN cg.g LIKE '% %'
                           THEN LEAST(cg.cc, rg.cr) ELSE 0 END) AS BIGINT)
               AS m2
      FROM cg JOIN rg ON rg.doc_id = cg.doc_id AND rg.g = cg.g
      GROUP BY cg.doc_id
    ), scored AS (
      SELECT p.lang, p.tc1, p.tc2, p.tr1, p.tr2,
             COALESCE(m.m1, 0) AS m1, COALESCE(m.m2, 0) AS m2
      FROM pairs p LEFT JOIN m ON m.doc_id = p.doc_id
    )
"""


@query(
    "rouge_ngram_eval",
    oracle=_ROUGE_PAIR_SQL
    + """
    SELECT lang,
           COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(CAST(ROUND(
             CASE WHEN tc1 + tr1 = 0 THEN 0.0
                  ELSE 2.0 * m1 / (tc1 + tr1) END, 6) AS DECIMAL(28,6)))
             AS DOUBLE) / COUNT(*), 6) AS rouge1_f1,
           ROUND(CAST(SUM(CAST(ROUND(
             CASE WHEN tc2 + tr2 = 0 THEN 0.0
                  ELSE 2.0 * m2 / (tc2 + tr2) END, 6) AS DECIMAL(28,6)))
             AS DOUBLE) / COUNT(*), 6) AS rouge2_f1
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def rouge_ngram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 / ROUGE-2 F1 per language (Lin 2004): clipped n-gram
    matches between each candidate doc and its decile-head reference.
    The F1 collapses to the single exact division 2*m/(|cand|+|ref|)
    (since P = m/|cand|, R = m/|ref|), so per-pair scores are one float
    op on exact integers; the per-language mean follows the
    round-term-then-DECIMAL-sum rule.

    Scale shape: candidate grams key on doc_id, reference grams key on
    ref_id and are joined once per gram (fan-out = pairs per reference,
    a constant 9) — two explode+hash-agg passes and one equi-join on
    (ref_id, gram); no pair materialization beyond the gram join. The
    bigram arrays come from arrays_zip of shifted slices (no per-element
    lambda over long arrays, per CLAUDE.md)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        tokens_col,
    )

    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", tokens_col(F.col("text")).alias("toks"))

    def with_grams(df, tcol):
        t = F.col(tcol)
        npairs = F.greatest(F.size(t) - 1, F.lit(0))
        bg = F.transform(
            F.arrays_zip(
                F.slice(t, 1, npairs).alias("a"), F.slice(t, 2, npairs).alias("b")
            ),
            lambda s: F.concat_ws(" ", s["a"], s["b"]),
        )
        return df.withColumn("grams", F.concat(t, bg))

    # NOTE (r13): candidate-side repartition before the gram build was
    # tried (it removes a >1.1 s single-task stage) but did NOT move the
    # query's wall time — the gram-build task overlaps the concurrent
    # reference/broadcast jobs, so it is off the critical path here
    # (unlike cer_generation_eval, where the single task WAS the query).
    # Reverted to keep the plan exchange-minimal; see OPTIMIZATION_r13.md.
    cand = with_grams(
        d.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id",
            "lang",
            (F.col("doc_id") - F.col("doc_id") % 10).alias("ref_id"),
            "toks",
        ),
        "toks",
    )
    ref = with_grams(
        d.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("ref_id"), F.col("toks").alias("rtoks")
        ),
        "rtoks",
    ).withColumnRenamed("grams", "rgrams")

    cg = (
        cand.select("doc_id", "ref_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "ref_id", "g")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    rg = (
        ref.select("ref_id", F.explode("rgrams").alias("g"))
        .groupBy("ref_id", "g")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    m = (
        cg.join(rg, ["ref_id", "g"])
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(~F.col("g").contains(" "), F.least("cc", "cr")).otherwise(0)
            ).cast("long").alias("m1"),
            F.sum(
                F.when(F.col("g").contains(" "), F.least("cc", "cr")).otherwise(0)
            ).cast("long").alias("m2"),
        )
    )
    sizes = cand.join(
        ref.select("ref_id", F.size("rtoks").alias("tr1")), "ref_id"
    ).select(
        "doc_id",
        "lang",
        F.size("toks").alias("tc1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).alias("tc2"),
        "tr1",
        F.greatest(F.col("tr1") - 1, F.lit(0)).alias("tr2"),
    )
    scored = sizes.join(m, "doc_id", "left").select(
        "lang",
        "tc1",
        "tc2",
        "tr1",
        "tr2",
        F.coalesce("m1", F.lit(0)).alias("m1"),
        F.coalesce("m2", F.lit(0)).alias("m2"),
    )
    f1 = lambda mm, a, b: F.when(  # noqa: E731
        F.col(a) + F.col(b) == 0, F.lit(0.0)
    ).otherwise(F.lit(2.0) * F.col(mm) / (F.col(a) + F.col(b)))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.round(f1("m1", "tc1", "tr1"), 6).cast("decimal(28,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("rouge1_f1"),
            F.round(
                F.sum(F.round(f1("m2", "tc2", "tr2"), 6).cast("decimal(28,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("rouge2_f1"),
        )
        .orderBy("lang")
    )


@query(
    "bleu_corpus_eval",
    oracle=_ROUGE_PAIR_SQL
    + """
    , agg AS (
      SELECT lang, COUNT(*) AS n_pairs,
             CAST(SUM(m1) AS BIGINT) AS mm1, CAST(SUM(m2) AS BIGINT) AS mm2,
             CAST(SUM(tc1) AS BIGINT) AS cc1, CAST(SUM(tc2) AS BIGINT) AS cc2,
             CAST(SUM(tr1) AS BIGINT) AS rr1
      FROM scored GROUP BY lang
    )
    SELECT lang, n_pairs,
           ROUND(mm1 * 1.0 / cc1, 6) AS p1,
           ROUND(mm2 * 1.0 / cc2, 6) AS p2,
           ROUND(CASE WHEN cc1 > rr1 THEN 1.0
                      ELSE exp(1.0 - rr1 * 1.0 / cc1) END, 6) AS bp,
           ROUND(CASE WHEN mm1 = 0 OR mm2 = 0 THEN 0.0
                      ELSE (CASE WHEN cc1 > rr1 THEN 1.0
                                 ELSE exp(1.0 - rr1 * 1.0 / cc1) END)
                           * exp(0.5 * (ln(mm1 * 1.0 / cc1)
                                        + ln(mm2 * 1.0 / cc2))) END, 6)
             AS bleu2
    FROM agg ORDER BY lang
    """,
)
def bleu_corpus_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 per language (Papineni et al. 2002): clipped
    modified precisions pooled over the whole corpus (sum of clipped
    matches / sum of candidate n-grams — NOT a mean of per-pair scores),
    brevity penalty exp(1 - r/c) on pooled lengths, geometric mean of
    p1 and p2. All numerators/denominators are exact integer sums, so
    the only floats are the final division/ln/exp chain — identical to
    ~1 ulp cross-engine, absorbed by ROUND(.,6). Shares the gram-join
    scale shape with rouge_ngram_eval."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        tokens_col,
    )

    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", tokens_col(F.col("text")).alias("toks"))

    def with_grams(df, tcol):
        t = F.col(tcol)
        npairs = F.greatest(F.size(t) - 1, F.lit(0))
        bg = F.transform(
            F.arrays_zip(
                F.slice(t, 1, npairs).alias("a"), F.slice(t, 2, npairs).alias("b")
            ),
            lambda s: F.concat_ws(" ", s["a"], s["b"]),
        )
        return df.withColumn("grams", F.concat(t, bg))

    # NOTE (r13): candidate-side repartition before the gram build was
    # tried (it removes a >1.1 s single-task stage) but did NOT move the
    # query's wall time — the gram-build task overlaps the concurrent
    # reference/broadcast jobs, so it is off the critical path here
    # (unlike cer_generation_eval, where the single task WAS the query).
    # Reverted to keep the plan exchange-minimal; see OPTIMIZATION_r13.md.
    cand = with_grams(
        d.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id",
            "lang",
            (F.col("doc_id") - F.col("doc_id") % 10).alias("ref_id"),
            "toks",
        ),
        "toks",
    )
    ref = with_grams(
        d.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("ref_id"), F.col("toks").alias("rtoks")
        ),
        "rtoks",
    ).withColumnRenamed("grams", "rgrams")

    cg = (
        cand.select("doc_id", "ref_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "ref_id", "g")
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    rg = (
        ref.select("ref_id", F.explode("rgrams").alias("g"))
        .groupBy("ref_id", "g")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    m = (
        cg.join(rg, ["ref_id", "g"])
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(~F.col("g").contains(" "), F.least("cc", "cr")).otherwise(0)
            ).cast("long").alias("m1"),
            F.sum(
                F.when(F.col("g").contains(" "), F.least("cc", "cr")).otherwise(0)
            ).cast("long").alias("m2"),
        )
    )
    sizes = cand.join(
        ref.select("ref_id", F.size("rtoks").alias("tr1")), "ref_id"
    ).select(
        "doc_id",
        "lang",
        F.size("toks").alias("tc1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).alias("tc2"),
        "tr1",
    )
    scored = sizes.join(m, "doc_id", "left").select(
        "lang",
        "tc1",
        "tc2",
        "tr1",
        F.coalesce("m1", F.lit(0)).alias("m1"),
        F.coalesce("m2", F.lit(0)).alias("m2"),
    )
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("m1").cast("long").alias("mm1"),
        F.sum("m2").cast("long").alias("mm2"),
        F.sum("tc1").cast("long").alias("cc1"),
        F.sum("tc2").cast("long").alias("cc2"),
        F.sum("tr1").cast("long").alias("rr1"),
    )
    bp = F.when(F.col("cc1") > F.col("rr1"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("rr1") * F.lit(1.0) / F.col("cc1"))
    )
    return agg.select(
        "lang",
        "n_pairs",
        F.round(F.col("mm1") * F.lit(1.0) / F.col("cc1"), 6).alias("p1"),
        F.round(F.col("mm2") * F.lit(1.0) / F.col("cc2"), 6).alias("p2"),
        F.round(bp, 6).alias("bp"),
        F.round(
            F.when((F.col("mm1") == 0) | (F.col("mm2") == 0), F.lit(0.0)).otherwise(
                bp
                * F.exp(
                    F.lit(0.5)
                    * (
                        F.log(F.col("mm1") * F.lit(1.0) / F.col("cc1"))
                        + F.log(F.col("mm2") * F.lit(1.0) / F.col("cc2"))
                    )
                )
            ),
            6,
        ).alias("bleu2"),
    ).orderBy("lang")


@query(
    "cer_generation_eval",
    oracle="""
    -- Character error rate: unit-cost Levenshtein (both engines implement
    -- the standard codepoint DP, and the fixture is ASCII) between each
    -- candidate doc and its decile-head reference, normalized by
    -- reference length. Distances are exact integers; per-pair CER is one
    -- float division; per-language means follow the round-term ->
    -- DECIMAL-sum rule.
    WITH base AS (
      SELECT doc_id, lang, lower(text) AS s, doc_id - doc_id % 10 AS ref_id
      FROM documents
    ), pairs AS (
      SELECT c.lang, levenshtein(c.s, r.s) AS d, len(r.s) AS lr
      FROM base c JOIN base r ON r.doc_id = c.ref_id
      WHERE c.doc_id % 10 <> 0
    )
    SELECT lang, COUNT(*) AS n_pairs,
           CAST(SUM(d) AS BIGINT) AS total_edit_ops,
           ROUND(CAST(SUM(CAST(ROUND(
             CASE WHEN lr = 0 THEN 0.0 ELSE d * 1.0 / lr END, 6)
             AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS mean_cer
    FROM pairs GROUP BY lang ORDER BY lang
    """,
)
def cer_generation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character error rate per language: the edit-distance member of the
    generation-eval family (next to ROUGE/BLEU's n-gram overlap) —
    levenshtein is a JVM-side built-in, so the O(len^2) DP never leaves
    whole-stage codegen. Scale shape: one self-equi-join on the decile
    head (constant fan-out 9) carrying two ~300-char strings per row; no
    pair blowup, no Python.

    The candidate side is round-robin repartitioned before the broadcast
    join: the fixture's single row group otherwise put every levenshtein
    DP (~len^2 cells x all pairs — the query's whole CPU cost) into ONE
    task (r13 profile: 3.4 s in one task). The per-language aggregates
    are counts and rounded-term decimal sums, so the partitioning cannot
    perturb the result."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.lower("text").alias("s"),
        (F.col("doc_id") - F.col("doc_id") % 10).alias("ref_id"),
    )
    ref = base.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("ref_id"), F.col("s").alias("rs")
    )
    pairs = (
        base.filter(F.col("doc_id") % 10 != 0)
        .repartition(spark.sparkContext.defaultParallelism)
        .join(ref, "ref_id")
        .select(
            "lang",
            F.levenshtein("s", "rs").alias("d"),
            F.length("rs").alias("lr"),
        )
    )
    cer = F.when(F.col("lr") == 0, F.lit(0.0)).otherwise(
        F.col("d") * F.lit(1.0) / F.col("lr")
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d").cast("long").alias("total_edit_ops"),
            F.round(
                F.sum(F.round(cer, 6).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_cer"),
        )
        .orderBy("lang")
    )


@query(
    "wer_generation_eval",
    oracle="""
    -- Word error rate via RANK-TO-ASCII encoding: neither engine has a
    -- word-level edit distance, but mapping each vocabulary word to one
    -- printable ASCII char (rank in the sorted distinct-word table; the
    -- fixture vocabulary is 31 words, asserted <= 94 Spark-side) makes
    -- char-level levenshtein compute EXACTLY the word-level DP. Encoded
    -- docs rebuild word order with string_agg ORDER BY position.
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), vocab AS (
      SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS r FROM (
        SELECT DISTINCT unnest(ws) AS w FROM toks)
    ), pos AS (
      SELECT t.doc_id, t.lang, t.ws[i] AS w, i AS pos
      FROM toks t, range(1, 1000) x(i)
      WHERE i <= len(t.ws)
    ), enc AS (
      SELECT p.doc_id, p.lang,
             string_agg(chr(CAST(32 + v.r AS INTEGER)), '' ORDER BY p.pos) AS e,
             COUNT(*) AS nw
      FROM pos p JOIN vocab v ON v.w = p.w
      GROUP BY p.doc_id, p.lang
    ), base AS (
      SELECT doc_id, lang, e, nw, doc_id - doc_id % 10 AS ref_id FROM enc
    ), pairs AS (
      SELECT c.lang, levenshtein(c.e, r.e) AS d, r.nw AS nr
      FROM base c JOIN base r ON r.doc_id = c.ref_id
      WHERE c.doc_id % 10 <> 0
    )
    SELECT lang, COUNT(*) AS n_pairs,
           CAST(SUM(d) AS BIGINT) AS total_word_edits,
           ROUND(CAST(SUM(CAST(ROUND(
             CASE WHEN nr = 0 THEN 0.0 ELSE d * 1.0 / nr END, 6)
             AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS mean_wer
    FROM pairs GROUP BY lang ORDER BY lang
    """,
)
def wer_generation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word error rate per language: word-level Levenshtein computed by
    the JVM's char-level DP after encoding each word as one printable
    ASCII character (rank in the sorted global vocabulary — asserted
    <= 94 in-query so the encoding can never leave single-byte ASCII;
    a bigger vocabulary would need a wider alphabet, not a different
    algorithm). Scale shape: posexplode + BROADCAST vocab join (the
    vocabulary table is tiny by Heaps' law vs the corpus), one groupBy
    doc_id to rebuild encoded strings, then the constant-fan-out decile
    pair join; everything JVM-side."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.dedup import (
        tokens_col,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", tokens_col(F.col("text")).alias("ws"))
    vocab = (
        toks.select(F.explode("ws").alias("w"))
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("w")))
        .withColumn("c", F.expr("char(32 + r)"))
    )
    n_vocab = vocab.count()
    assert 0 < n_vocab <= 94, (
        f"witness regime broken: vocabulary size {n_vocab} does not fit "
        "the single-byte printable-ASCII encoding (<= 94)"
    )
    # the oracle enumerates token positions via range(1, 1000): a doc with
    # >= 1000 tokens would be silently truncated on the oracle side only
    max_toks = toks.select(F.max(F.size("ws"))).first()[0]
    assert max_toks is not None and max_toks < 1000, (
        f"witness regime broken: max token count {max_toks} exceeds the "
        "oracle's range(1, 1000) position enumeration"
    )
    pos = toks.select(
        "doc_id", "lang", F.posexplode("ws").alias("pos", "w")
    )
    enc = (
        pos.join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("c")))
                    ),
                    lambda s: s["c"],
                ),
            ).alias("e"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    pairs = (
        enc.filter(F.col("doc_id") % 10 != 0)
        .withColumn("ref_id", F.col("doc_id") - F.col("doc_id") % 10)
        .join(
            enc.select(
                F.col("doc_id").alias("ref_id"),
                F.col("e").alias("re"),
                F.col("nw").alias("nr"),
            ).filter(F.col("ref_id") % 10 == 0),
            "ref_id",
        )
        .select("lang", F.levenshtein("e", "re").alias("d"), "nr")
    )
    wer = F.when(F.col("nr") == 0, F.lit(0.0)).otherwise(
        F.col("d") * F.lit(1.0) / F.col("nr")
    )
    return (
        pairs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("d").cast("long").alias("total_word_edits"),
            F.round(
                F.sum(F.round(wer, 6).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_wer"),
        )
        .orderBy("lang")
    )
