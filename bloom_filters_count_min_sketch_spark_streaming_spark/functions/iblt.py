"""Invertible Bloom Lookup Table (IBLT) set reconciliation.

Goodrich & Mitzenmacher 2011 / Eppstein, Goodrich, Uyeda & Varghese
SIGCOMM 2011 ("What's the Difference?"): each side summarizes its key set
into m cells of (count, key-XOR, checksum-XOR) under k hash functions;
SUBTRACTING the two tables cancels every common key, and the symmetric
difference — the actual keys, not an estimate — peels out of the residual
like sparse graph 2-core removal, as long as |difference| stays under
~m/(1.2..1.5) for k=3.

Scale story: two 100 TB key sets reconcile by exchanging O(m) kilobytes —
each side's table is ONE distributed aggregate (explode k cells per key,
groupBy cell with count + bit_xor), the subtraction is an m-row join, and
only the m-cell residual ever reaches the driver for peeling. Hashing is
md5-derived, so cell assignment is engine- and language-portable (the
Python peeler reproduces the SQL/Catalyst cell math bit for bit).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_expr(key_col, j: int, m: int):
    """Catalyst cell index for hash j: md5(key|j) 48-bit prefix mod m."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key_col.cast("string"), F.lit(f"|{j}"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % m
    )


def _checksum_expr(key_col):
    """Catalyst per-key checksum: md5(key|g) 48-bit prefix."""
    return F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit("|g"))), 1, 12),
        16,
        10,
    ).cast("long")


def _cell_py(key: int, j: int, m: int) -> int:
    return int(hashlib.md5(f"{key}|{j}".encode()).hexdigest()[:12], 16) % m


def _checksum_py(key: int) -> int:
    return int(hashlib.md5(f"{key}|g".encode()).hexdigest()[:12], 16)


def iblt_table(keys: DataFrame, key_col: str, m: int, k: int = 3) -> DataFrame:
    """One side's IBLT: m rows of (cell, cnt, key_x, sum_x) built with a
    single distributed aggregate (k exploded cell rows per key, map-side
    combined). Distinct-ness of ``keys`` is the caller's contract."""
    kc = F.col(key_col)
    exploded = keys.select(
        kc.alias("key"),
        _checksum_expr(kc).alias("g"),
        F.explode(
            F.array(*[_cell_expr(kc, j, m) for j in range(k)])
        ).alias("cell"),
    )
    return exploded.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.expr("bit_xor(key)").alias("key_x"),
        F.expr("bit_xor(g)").alias("sum_x"),
    )


def iblt_subtract(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise A - B: counts subtract, XOR fields cancel common keys."""
    aa = a.select("cell", F.col("cnt").alias("ca"), F.col("key_x").alias("ka"), F.col("sum_x").alias("sa"))
    bb = b.select("cell", F.col("cnt").alias("cb"), F.col("key_x").alias("kb"), F.col("sum_x").alias("sb"))
    z = F.lit(0).cast("long")
    return aa.join(bb, "cell", "full_outer").select(
        "cell",
        (F.coalesce("ca", z) - F.coalesce("cb", z)).alias("dcnt"),
        F.coalesce("ka", z).bitwiseXOR(F.coalesce("kb", z)).alias("key_x"),
        F.coalesce("sa", z).bitwiseXOR(F.coalesce("sb", z)).alias("sum_x"),
    )


def iblt_peel(residual_cells, m: int, k: int = 3):
    """Driver-side peel of the subtracted table (bounded: m cells).

    Repeatedly pop a PURE cell (|dcnt| == 1 and the checksum matches its
    key-XOR), recover that key and its side (+1 = A-only, -1 = B-only),
    and remove it from its k cells; like 2-core peeling this terminates
    in O(diff * k). Returns sorted [(key, side)].

    Raises ValueError if peeling stalls with residue left — the honest
    'difference exceeded table capacity' signal (callers size m to the
    expected diff, exactly like sizing a Bloom filter to its key count).
    """
    cells = {int(r["cell"]): [int(r["dcnt"]), int(r["key_x"]), int(r["sum_x"])] for r in residual_cells}
    out = []
    progress = True
    while progress:
        progress = False
        for c, (d, kx, sx) in list(cells.items()):
            if abs(d) == 1 and _checksum_py(kx) == sx:
                side = d
                out.append((kx, side))
                g = _checksum_py(kx)
                for j in range(k):
                    cj = _cell_py(kx, j, m)
                    cell = cells.setdefault(cj, [0, 0, 0])
                    cell[0] -= side
                    cell[1] ^= kx
                    cell[2] ^= g
                progress = True
    if any(d != 0 or kx != 0 or sx != 0 for d, kx, sx in cells.values()):
        raise ValueError(
            "IBLT peel stalled: symmetric difference exceeds table capacity "
            f"(m={m}, k={k}); increase m"
        )
    return sorted(out)
