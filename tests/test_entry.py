"""Driver-contract smoke tests."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"event_type", "exact_cnt", "cms_est", "abs_err"} <= set(df.columns)


def test_every_oracle_key_has_a_query(spark):
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_queries_run_at_smoke_scale(spark, sf_dir):
    """Every registered non-streaming query executes at sf0.001 (streaming
    ones are exercised in test_streaming + the oracle harness; they're slow
    to spin per-query here)."""
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        if name.startswith("stream_"):
            continue
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
