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


# The vectorized DP below is bit-identical to the exact-int scalar DP only
# while every prefix sum s satisfies s*s <= 2^53 (float64 squares exactly;
# int64 cumsum of f*f cannot wrap): total <= floor(sqrt(2^53)) = 94906265.
# Beyond that the old scalar path squared EXACTLY in arbitrary-precision int
# before the single float division, so the two paths diverge silently
# (ADVICE r13 #1 — the hash-checked saturated witness is on a fixed slice,
# but voptimal_histogram_stats aggregates ALL documents and crosses the
# bound at large SF). Dispatch per the repo's witness discipline: assert
# the exactness regime in-code, fall back to the exact scalar DP outside it.
_VOPT_EXACT_SUM_BOUND = 94906265


def _v_optimal_scalar(freqs: list, n_buckets: int) -> tuple:
    """Exact-int scalar v-optimal DP (the pre-r13 implementation): prefix
    sums and squares in arbitrary-precision Python ints, one float division
    per SSE cell, strict `<` so the leftmost split wins ties."""
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


def v_optimal_partition(freqs: list, n_buckets: int) -> tuple:
    """Pure v-optimal histogram DP (Jagadish et al., VLDB 1998) — unit-
    testable without Spark: partition the ordered frequency series into
    n_buckets contiguous buckets minimizing total within-bucket SSE (each
    bucket summarized by its mean frequency, the planner-statistics
    representation). Exact integer/rational arithmetic via prefix sums:
    SSE(i..j) = ss - s^2/len computed in float from exact integers —
    deterministic. Returns (boundaries, total_sse): boundaries are
    end-indices (exclusive) of each bucket."""
    import numpy as np

    n = len(freqs)
    k = min(n_buckets, n)
    if n == 0:
        return [], 0.0
    if min(freqs) < 0 or sum(freqs) > _VOPT_EXACT_SUM_BOUND:
        return _v_optimal_scalar(freqs, n_buckets)
    f = np.asarray(freqs, dtype=np.int64)
    ps = np.concatenate(([0], np.cumsum(f)))          # exact int64 prefix sums
    pss = np.concatenate(([0], np.cumsum(f * f)))

    # sse[j, i] for the bucket [j, i): (pss[i]-pss[j]) - (ps[i]-ps[j])^2/(i-j).
    # All terms are exact int64 until the single float64 division, which is
    # bit-identical to the scalar `ss - s*s/(j-i)` the original row-by-row
    # loop computed (ints <= 2^53 convert exactly). The saturated witness
    # runs this DP at k = n (O(n^3) cells), which in pure Python was ~3.4 s
    # of driver time per run (r13 profile); one vectorized (n+1)^2 matrix
    # per b keeps IDENTICAL float results and leftmost tie-breaks
    # (np.argmin returns the first minimum, matching the strict `<` scan).
    idx = np.arange(n + 1)
    width = idx[None, :] - idx[:, None]               # i - j
    with np.errstate(divide="ignore", invalid="ignore"):
        sse_m = (pss[None, :] - pss[:, None]) - np.where(
            width > 0, (ps[None, :] - ps[:, None]).astype(np.float64) ** 2 / np.where(width > 0, width, 1), 0.0
        )
    INF = float("inf")
    sse_m = np.where(width > 0, sse_m.astype(np.float64), INF)

    dp_prev = np.full(n + 1, INF)
    dp_prev[0] = 0.0
    back = np.zeros((k + 1, n + 1), dtype=np.int64)
    for b in range(1, k + 1):
        cand = dp_prev[:, None] + sse_m               # rows j, cols i
        cand[width <= 0] = INF                        # only j < i are splits
        bj = np.argmin(cand, axis=0)                  # first (leftmost) min
        dp_b = cand[bj, idx]
        dp_b[:b] = INF                                # need at least b values
        bj = np.where(idx >= b, bj, b - 1)
        back[b] = bj
        dp_prev = dp_b
    bounds = []
    i = n
    for b in range(k, 0, -1):
        bounds.append(i)
        i = int(back[b][i])
    return list(reversed(bounds)), float(dp_prev[n])
