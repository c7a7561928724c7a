"""Witness-ledger discipline (VERDICT r10 #6), mechanized.

The witness program closed in round 10: every rows-only query family has a
hash-checked exactness witness or a documented impossibility. These tests
keep that true STRUCTURALLY — a future rows-only query registered without a
``witness=`` or ``no_witness_reason=`` marker fails here instead of silently
eroding the program.
"""

from bloom_filters_count_min_sketch_spark_streaming_spark.plans import registry


def setup_module(module):
    registry.load_all_query_modules()


def test_every_rows_only_query_has_witness_or_reason():
    rows_only = [n for n in registry.QUERIES if n not in registry.ORACLES]
    missing = [
        n
        for n in rows_only
        if n not in registry.WITNESSES and n not in registry.NO_WITNESS_REASONS
    ]
    assert not missing, (
        "rows-only queries without a witness marker or a documented "
        f"impossibility: {missing} — add witness=... (an oracle-backed "
        "exactness witness) or no_witness_reason=... to the @query decorator"
    )


def test_witness_targets_are_oracle_backed_and_registered():
    for name, w in registry.WITNESSES.items():
        assert w in registry.QUERIES, f"{name}: witness {w!r} is not registered"
        assert w in registry.ORACLES, (
            f"{name}: witness {w!r} is rows-only — a witness must itself be "
            "hash-checked against a DuckDB oracle"
        )
        assert w != name, f"{name}: a query cannot witness itself"


def test_markers_only_on_rows_only_queries():
    # An oracle-backed query IS its own evidence; witness markers on it would
    # let a future edit drop the oracle while the ledger still looks covered.
    both = [n for n in registry.WITNESSES if n in registry.ORACLES]
    assert not both, f"oracle-backed queries carrying witness markers: {both}"
    both = [n for n in registry.NO_WITNESS_REASONS if n in registry.ORACLES]
    assert not both, f"oracle-backed queries carrying impossibility tags: {both}"
    overlap = set(registry.WITNESSES) & set(registry.NO_WITNESS_REASONS)
    assert not overlap, f"queries with BOTH markers: {sorted(overlap)}"


def test_ledger_matches_round10_closure():
    # The closed program: exactly two documented impossibilities today.
    # (Growing this set is allowed but must be a conscious, reviewed act.)
    assert set(registry.NO_WITNESS_REASONS) == {
        "dedup_icws_weighted_minhash",
        "compression_ratio_quality",
    }
