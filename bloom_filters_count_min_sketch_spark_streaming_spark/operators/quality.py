"""Declarative data-quality constraint checking (Deequ-style).

A *check* is (name, metric Column, pass predicate). All checks against one
table are evaluated in a SINGLE aggregation pass over that table (scan
sharing — the Deequ design point): each metric is one aggregate expression,
the one-row result is unpivoted with ``stack`` into the audit table

    (constraint STRING, metric_value DOUBLE, passed BOOLEAN)

Scale shape: per table one scan + one partial-aggregated reduce to a single
row; referential integrity is a broadcast-able anti-join count. Nothing is
proportional to row count after the agg, so the audit of a 100 TB table
costs one pass regardless of how many constraints it carries.

Determinism: every metric is either an exact integer count (cast to double)
or a ratio of two counts ROUNDed at 6; pass predicates compare the ROUNDED
metric, so both engines decide from identical values.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    metric: Column  # aggregate expression -> one double
    passed: Column  # boolean over the metric's alias


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num / den, 6))


def row_count(name: str = "row_count") -> Check:
    m = F.count(F.lit(1)).cast("double")
    return Check(name, m, F.col(name) > 0)


def completeness(col: str, name: str | None = None) -> Check:
    name = name or f"completeness_{col}"
    m = _ratio(F.count(col).cast("double"), F.count(F.lit(1)))
    return Check(name, m, F.col(name) == 1.0)


def uniqueness(col: str, name: str | None = None) -> Check:
    name = name or f"uniqueness_{col}"
    m = _ratio(F.count_distinct(F.col(col)).cast("double"), F.count(col))
    return Check(name, m, F.col(name) == 1.0)


def domain(col: str, allowed: list[str], name: str | None = None) -> Check:
    name = name or f"domain_{col}"
    m = _ratio(
        F.sum(F.col(col).isin(allowed).cast("long")).cast("double"), F.count(col)
    )
    return Check(name, m, F.col(name) == 1.0)


def in_range(col: str, lo: float, hi: float, name: str | None = None) -> Check:
    name = name or f"range_{col}"
    m = _ratio(
        F.sum(F.col(col).between(lo, hi).cast("long")).cast("double"), F.count(col)
    )
    return Check(name, m, F.col(name) == 1.0)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregation over ``df``; unpivot to the
    audit schema. ``passed`` predicates reference metrics by alias, so they
    evaluate on the already-aggregated one-row frame (no second scan)."""
    agg_row = df.agg(*[c.metric.alias(c.name) for c in checks])
    flagged = agg_row.select(
        *[F.col(c.name) for c in checks],
        *[c.passed.alias(f"_p_{c.name}") for c in checks],
    )
    stack_args = ", ".join(
        f"'{c.name}', `{c.name}`, `_p_{c.name}`" for c in checks
    )
    return flagged.selectExpr(
        f"stack({len(checks)}, {stack_args}) as (constraint, metric_value, passed)"
    )


def referential_integrity(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, name: str
) -> DataFrame:
    """Orphan-count check: rows of ``child`` whose key has no match in
    ``parent``. Anti-join (broadcast-able when the parent key set is small;
    at scale Spark picks shuffled hash anti-join on the key). Metric is the
    orphan count; passes at exactly 0."""
    orphans = child.select(F.col(child_col).alias("_k")).join(
        parent.select(F.col(parent_col).alias("_k")), "_k", "left_anti"
    )
    return orphans.agg(
        F.lit(name).alias("constraint"),
        F.count(F.lit(1)).cast("double").alias("metric_value"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )


def v_optimal_partition(freqs: list, n_buckets: int) -> tuple:
    """Pure v-optimal histogram DP (Jagadish et al., VLDB 1998) — unit-
    testable without Spark: partition the ordered frequency series into
    n_buckets contiguous buckets minimizing total within-bucket SSE (each
    bucket summarized by its mean frequency, the planner-statistics
    representation). Exact integer/rational arithmetic via prefix sums:
    SSE(i..j) = ss - s^2/len computed in float from exact integers —
    deterministic. Returns (boundaries, total_sse): boundaries are
    end-indices (exclusive) of each bucket."""
    n = len(freqs)
    k = min(n_buckets, n)
    ps = [0] * (n + 1)
    pss = [0] * (n + 1)
    for i, f in enumerate(freqs):
        ps[i + 1] = ps[i] + f
        pss[i + 1] = pss[i] + f * f

    def sse(i: int, j: int) -> float:  # [i, j) on 0-based freqs
        s = ps[j] - ps[i]
        ss = pss[j] - pss[i]
        return ss - s * s / (j - i)

    INF = float("inf")
    # dp[b][i]: min SSE splitting first i values into b buckets
    dp = [[INF] * (n + 1) for _ in range(k + 1)]
    back = [[0] * (n + 1) for _ in range(k + 1)]
    dp[0][0] = 0.0
    for b in range(1, k + 1):
        for i in range(b, n + 1):
            best, bj = INF, b - 1
            for j in range(b - 1, i):
                c = dp[b - 1][j] + sse(j, i)
                if c < best:  # strict: first (leftmost) split wins ties
                    best, bj = c, j
            dp[b][i] = best
            back[b][i] = bj
    bounds = []
    i = n
    for b in range(k, 0, -1):
        bounds.append(i)
        i = back[b][i]
    return list(reversed(bounds)), dp[k][n]
