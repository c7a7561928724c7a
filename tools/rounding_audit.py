"""Boundary-margin audit for every oracle's rounded float aggregates.

The pytest sweep (tests/test_oracle_rounding.py) only FLAGS a query once a
pre-round value crosses the 1e-9 relative margin; this tool shows the whole
distribution so near-threshold risks get fixed BEFORE they flake a gate
(r12: `pandas_udaf_weighted_price` sat ~1e-10 from a .00005 boundary and
aborted a closeout when DuckDB's thread-order wobble flipped it).

For each oracle with a strippable ROUND-over-float-agg it reports:
  - the minimum relative distance of any pre-round value to a .5 rounding
    boundary (the sweep fails under 1e-9), tightest first;
  - whether the pre-round values are RUN-TO-RUN UNSTABLE under
    multi-threaded DuckDB (repeated stripped runs compared bit-for-bit).
    Unstable = a genuinely order-dependent float aggregate: these are the
    only entries whose margin can drift, so `unstable` + a tight margin is
    the fix-now signal. Stable entries (e.g. per-term-rounded DECIMAL sums
    the sweep's parser can't classify through a CTE) hold their margin
    deterministically.

Usage: python tools/rounding_audit.py [--sf /root/testdata/sf0.01] [--runs 6]
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=6, help="stability re-runs")
    ap.add_argument("--top", type=int, default=20, help="rows to print")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "tor", os.path.join(REPO, "tests", "test_oracle_rounding.py")
    )
    tor = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tor)

    import __spark_entry__ as entrymod
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import TABLES

    con = duckdb.connect()  # default threads: we WANT the wobble visible
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    rows = []
    for name, sql in entrymod.oracle_sql().items():
        if name in tor.EXEMPT:
            continue
        stripped, scales = tor._strip_agg_rounds(sql)
        if not scales:
            continue
        try:
            orig = con.sql(sql).df()
            runs = [con.sql(stripped).df() for _ in range(max(2, args.runs))]
        except Exception as ex:
            print(f"ERR {name}: {str(ex)[:100]}", file=sys.stderr)
            continue
        base = runs[0]
        for col in base.columns:
            if not pd.api.types.is_float_dtype(base[col]):
                continue
            # Mirror the sweep's column matching (test_oracle_rounding.py):
            # a float column whose stripped values equal the original was NOT
            # one of the stripped ROUNDs (e.g. a decimal-sum-classified column
            # that still post-rounds) — its margin is not this audit's concern.
            if col not in orig.columns or base[col].equals(orig[col]):
                continue
            a = np.sort(base[col].dropna().to_numpy())
            if not len(a):
                continue
            unstable = any(
                len(b := np.sort(r[col].dropna().to_numpy())) != len(a)
                or not np.array_equal(a, b)
                for r in runs[1:]
            )
            # Attribute the column to the ONE scale whose round(pre, s)
            # reproduces the committed output (first match, like the sweep) —
            # not the min margin across every scale stripped from the query.
            chosen = None
            for s in sorted(set(scales)):
                rounded = base[col].round(s)
                if ((rounded - orig[col]).abs().fillna(0) < 10.0**-s).all():
                    chosen = s
                    break
            if chosen is None:
                continue  # no stripped scale owns this column
            scaled = a * (10.0**chosen)
            frac = np.abs(scaled - np.floor(scaled) - 0.5)
            rel = (frac / (10.0**chosen)) / np.maximum(1.0, np.abs(a))
            rows.append((float(rel.min()), unstable, name, col, chosen))

    rows.sort(key=lambda r: (not r[1], r[0]))  # unstable first, then tightest
    print(f"{'rel margin':>12}  {'unstable':>8}  query.column (scale)   [sweep fails under 1e-9]")
    for m, u, name, col, s in rows[: args.top]:
        print(f"{m:12.3e}  {str(u):>8}  {name}.{col} (scale {s})")
    n_unstable = sum(1 for r in rows if r[1])
    # 10x the sweep's 1e-9 flag bound: an unstable margin inside this band
    # is one wobble from aborting a gate, a stable one holds deterministically
    tight_unstable = [r for r in rows if r[1] and r[0] < 1e-8]
    print(f"\n{len(rows)} rounded float-agg columns; {n_unstable} order-dependent (unstable)")
    if tight_unstable:
        print("FIX NOW (unstable AND margin < 1e-8):")
        for m, _, name, col, s in tight_unstable:
            print(f"  {name}.{col} (scale {s}, margin {m:.3e})")
        return 1
    print("no unstable column within 1e-8 of a boundary")
    return 0


if __name__ == "__main__":
    sys.exit(main())
