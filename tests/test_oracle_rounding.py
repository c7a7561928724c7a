"""Boundary-luck sweep over every oracle's rounded float aggregates.

Failure class (round 1, ``math_function_family``): ``ROUND(SUM(double), s)``
passes locally but fails the driver's value-hash when cross-engine
summation-order noise (~1e-12 relative) lands the pre-round sum within a few
ulps of a ``.5`` rounding boundary. The local gate can't see it — both
engines are compared post-round on THIS host's summation order.

This test makes the risk visible: for each oracle, strip every ROUND that
directly wraps an order-dependent float aggregate (SUM/AVG/... or a window),
re-run the stripped SQL in DuckDB at sf0.01, and assert each pre-round value
sits at least ``noise * |value|`` away from its nearest rounding boundary.
A query that trips this is luck-dependent and must either round coarser or
move the rounding inside the aggregate (per-term ROUND + DECIMAL sum).
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

# Relative noise bound for cross-engine float-sum divergence. The r1 failure
# (sum 487.0001036264947 rounded at 1e-6, digit distance 1.26e-7 ≈ 2.6e-10
# relative) sits well inside this bound, so it would have been flagged.
NOISE_REL = 1e-9

# Queries whose rounded aggregate is order-identical in both engines by
# construction, so boundary proximity is harmless:
# - window_running_value_per_user: running SUM over a totally-ordered ROWS
#   frame — both engines accumulate in the exact same order, bit-for-bit.
# - pandas_udaf_window_trailing_mean: AVG(BIGINT) over a ROWS frame — the
#   window sum is an exact integer in both engines (DuckDB hugeint, Spark
#   long) and the single division of exact ints is IEEE-identical, so the
#   pre-round doubles are bit-equal by construction. (Trips the heuristic
#   only because 501/7's repetend digit lands ~7e-8 from a boundary, right
#   at the 1e-9*|v| threshold.)
# - multimodal_jpeg_decode: mean_gray is an exact BIGINT pixel sum divided
#   by the tile count (1..6) — the single division of exact ints is
#   IEEE-identical in both engines, so the pre-round doubles are bit-equal
#   by construction. Trips the heuristic only because one mean is exactly
#   500/3, whose repetend distance to the scale-6 boundary is EXACTLY
#   NOISE_REL * |v| (1/6e6 = 1e-9 * 500/3) — the <= comparison then flips
#   on last-ulp accumulation order, which is how this surfaced under
#   threads=1.
EXEMPT = {
    "window_running_value_per_user",
    "pandas_udaf_window_trailing_mean",
    "multimodal_jpeg_decode",
}

_AGG_RE = re.compile(
    r"(?i)\b(sum|avg|mean|stddev|stddev_samp|stddev_pop|var_samp|var_pop|corr|covar_samp|covar_pop)\s*\("
)


def _decimal_sums_only(expr: str) -> bool:
    """True if every float aggregate in ``expr`` is an order-independent
    decimal sum — SUM(CAST(... AS DECIMAL(p,s))) — and no window is present.
    COUNT(*) divisors and +-*/ of such sums stay exact-then-identical."""
    if re.search(r"(?i)\bover\b", expr):
        return False
    aggs = list(_AGG_RE.finditer(expr))
    if not aggs:
        return False
    for m in aggs:
        if m.group(1).lower() != "sum":
            return False
        after = expr[expr.index("(", m.start()) + 1 :]
        if not re.match(r"(?is)\s*cast\b", after):
            return False
    return bool(re.search(r"(?i)AS\s+DECIMAL", expr))


def _strip_agg_rounds(sql: str) -> tuple[str, list[int]]:
    """Replace ROUND(expr, s) with (expr) wherever expr contains a float
    aggregate or window; return (stripped_sql, scales_removed)."""
    scales: list[int] = []
    changed = True
    while changed:
        changed = False
        for m in re.finditer(r"(?i)\bROUND\s*\(", sql):
            open_i = sql.index("(", m.start())
            level, k, last = 1, open_i + 1, open_i + 1
            parts: list[str] = []
            while k < len(sql) and level:
                ch = sql[k]
                if ch == "(":
                    level += 1
                elif ch == ")":
                    level -= 1
                    if level == 0:
                        break
                elif ch == "," and level == 1:
                    parts.append(sql[last:k])
                    last = k + 1
                k += 1
            parts.append(sql[last:k])
            expr = parts[0]
            if _decimal_sums_only(expr):
                # every aggregate inside is SUM(CAST(ROUND(term) AS DECIMAL)):
                # exact decimal arithmetic, order-independent by construction —
                # both engines compute the identical pre-round double, so
                # boundary proximity is harmless (the per-TERM rounding is the
                # controlled step, and that is what the DECIMAL sum preserves)
                continue
            if _AGG_RE.search(expr) or re.search(r"(?i)\bover\b", expr):
                try:
                    scales.append(int(parts[1].strip()) if len(parts) > 1 else 0)
                except ValueError:
                    continue  # non-literal scale: skip
                sql = sql[: m.start()] + "(" + expr + ")" + sql[k + 1 :]
                changed = True
                break
    return sql, scales


def _boundary_distance_ok(values: pd.Series, scale: int) -> tuple[bool, float | None]:
    """Min distance of v*10^s from its nearest .5 boundary vs noise*|v|."""
    for v in values.dropna():
        v = float(v)
        if not math.isfinite(v):
            continue
        scaled = v * (10**scale)
        frac = abs(scaled - math.floor(scaled) - 0.5)  # 0 = exactly on boundary
        dist_abs = frac / (10**scale)
        if dist_abs <= NOISE_REL * max(1.0, abs(v)):
            return False, v
    return True, None


@pytest.fixture(scope="module")
def oracle_env():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import TABLES

    con = duckdb.connect()
    # Single-threaded: multi-threaded DuckDB splits float sums differently
    # run to run (~1 ulp wobble), which made THIS test flaky when a
    # pre-round value sat right at the 1e-9 margin (r12: weighted_price
    # passed one sweep, failed the next on identical code). One thread
    # makes every measured margin deterministic; the 1e-9 bound already
    # dwarfs thread-order noise, so the protective power is unchanged.
    con.sql("SET threads=1")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con, entrymod.oracle_sql()


def test_no_rounded_float_agg_near_boundary(oracle_env):
    con, oracles = oracle_env
    offenders: list[str] = []
    for name, sql in oracles.items():
        if name in EXEMPT:
            continue
        stripped, scales = _strip_agg_rounds(sql)
        if not scales:
            continue
        orig = con.sql(sql).df()
        pre = con.sql(stripped).df()
        for col in pre.columns:
            if not pd.api.types.is_float_dtype(pre[col]):
                continue
            if col in orig.columns and pre[col].equals(orig[col]):
                continue  # this float column wasn't one of the rounded ones
            for s in sorted(set(scales)):
                rounded = pre[col].round(s)
                if not ((rounded - orig[col]).abs().fillna(0) < 10.0**-s).all():
                    continue  # not the scale this column was rounded at
                ok, v = _boundary_distance_ok(pre[col], s)
                if not ok:
                    offenders.append(f"{name}.{col} (scale {s}): pre-round {v!r} too close to boundary")
                break
    assert not offenders, "luck-dependent rounding:\n" + "\n".join(offenders)
