"""KMV (bottom-k) distinct sketch: estimator error bound + merge identity.

The oracle queries pin cross-engine determinism; these tests pin the
*statistics*: the estimate concentrates around the true distinct count
(std ~ 1/sqrt(k-2)), and the sketch is mergeable — bottom-k of a union of
bottom-k sketches equals the sketch of the unioned set (an exact set
identity, the basis of kmv_set_overlap's union estimate).
"""

from __future__ import annotations

import hashlib


def _frac(x: str) -> float:
    h = int(hashlib.md5(x.encode()).hexdigest()[:12], 16)
    return (h + 1) / float(1 << 48)


def _bottom_k(elems, k):
    return sorted(((_frac(e), e) for e in set(elems)))[:k]


def _estimate(sketch, k):
    assert len(sketch) == k
    return (k - 1) / sketch[-1][0]


def test_kmv_error_bound():
    k = 64
    for n, salt in [(500, "a"), (2000, "b"), (10000, "c")]:
        elems = [f"{salt}-{i}" for i in range(n)]
        est = _estimate(_bottom_k(elems, k), k)
        # KMV relative std is ~1/sqrt(k-2) ~ 12.7%; 4 sigma.
        assert abs(est - n) / n < 4 / (k - 2) ** 0.5


def test_kmv_merge_identity():
    k = 64
    a = [f"x-{i}" for i in range(1500)]
    b = [f"x-{i}" for i in range(700, 2600)]  # overlaps a
    ka, kb = _bottom_k(a, k), _bottom_k(b, k)
    merged = sorted(set(ka) | set(kb))[:k]
    direct = _bottom_k(a + b, k)
    assert merged == direct


def test_kmv_spark_fraction_matches_reference(spark):
    """The Spark kmv_fraction column equals the hashlib reference bit-for-bit."""
    from pyspark.sql import functions as F

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import sketches

    df = spark.range(200).select(F.concat(F.lit("e-"), F.col("id")).alias("elem"))
    rows = df.select("elem", sketches.kmv_fraction(F.col("elem")).alias("f")).collect()
    for r in rows:
        assert r["f"] == _frac(r["elem"])
