"""Driver-side bit-exact emulation of the engine's iterative-float
discipline (ROUND half-up at a scale -> DECIMAL sum -> CAST AS DOUBLE).

The bounded-graph queries (PageRank / HITS / LPA / TextRank on the
nation or capped-vocabulary graphs) iterate over an SF-INDEPENDENT edge
table of at most a few hundred rows. Running those supersteps as Spark
jobs cost 1-2 actions + an eager localCheckpoint each (r13 profile:
hits_trade_hubs = 78 jobs, ~5.4 s of job wall for a 25-node graph);
running them on the driver is the same "dimension-bounded driver peel"
discipline the rest of the graph family already uses — but it is only
legal if every float op reproduces Catalyst's results BIT-IDENTICALLY,
because these queries are under the driver's value-hash gate.

The two non-IEEE ops and their exact Python twins:

- ``F.round(x, s)`` on DOUBLE: Catalyst computes
  ``BigDecimal.decimal(x).setScale(s, HALF_UP).toDouble`` —
  half-up decimal rounding of the double's SHORTEST decimal repr.
  Python's ``repr(float)`` is the same shortest round-trip repr, and
  ``Decimal.quantize(..., ROUND_HALF_UP)`` the same tie rule, so
  ``round_half_up`` matches bit-for-bit (property-tested against
  F.round over randomized + crafted-tie grids in
  tests/test_exactfloat_parity.py).
- ``SUM(CAST(t AS DECIMAL(38, s)))`` then ``CAST(... AS DOUBLE)``:
  terms already rounded at scale s quantize exactly; the decimal sum is
  exact (order-independent), and both engines' final cast is
  correctly-rounded nearest-double. ``dec_sum_double`` reproduces it
  with ``decimal.Decimal`` (context precision 60 > 38).

Plain +, -, *, / on doubles are IEEE-754 and identical in Python.
"""

from __future__ import annotations

import math
from collections.abc import Iterable
from decimal import ROUND_HALF_UP, Context, Decimal

_CTX = Context(prec=60)


def round_half_up(x: float, scale: int) -> float:
    """Bit-exact twin of Catalyst ``Round(double, scale)`` (HALF_UP on the
    shortest decimal representation)."""
    if math.isnan(x) or math.isinf(x):
        return x
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP, context=_CTX
        )
    )


def dec_sum_double(terms: Iterable[float], scale: int) -> float:
    """Bit-exact twin of ``CAST(SUM(CAST(t AS DECIMAL(38, scale))) AS
    DOUBLE)`` over terms that are already exact multiples of 10^-scale
    (the engine rounds every term at ``scale`` first). Empty input
    returns 0.0 (the queries wrap the sum in COALESCE(..., 0.0))."""
    q = Decimal(1).scaleb(-scale)
    total = Decimal(0)
    for t in terms:
        total = _CTX.add(
            total, Decimal(repr(t)).quantize(q, rounding=ROUND_HALF_UP, context=_CTX)
        )
    return float(total)
