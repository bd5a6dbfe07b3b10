"""Cross-engine-deterministic rounding.

Library ``round(x, s)`` differs between engines at exact half-boundaries:
Spark converts the double to BigDecimal (exact expansion) and HALF_UPs;
DuckDB multiplies by 10^s and ``std::round``s — on the *same* input double
these can land on opposite sides (e.g. means of cent-quantized values end in
exact ``.XXXX5``). Since the driver value-hashes Spark output against DuckDB
oracle output, every surfaced float goes through ``rnd`` instead: plain IEEE
multiply/add/floor, which both engines execute bit-identically.

Oracle-side equivalent: ``floor(x * 1e{s} + 0.5) / 1e{s}``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column | str, s: int) -> Column:
    """Half-up rounding to ``s`` decimals via IEEE ops (cross-engine stable)."""
    col = F.col(c) if isinstance(c, str) else c
    f = float(10**s)
    return F.floor(col * f + F.lit(0.5)) / F.lit(f)


def rnd_sql(expr: str, s: int) -> str:
    """The DuckDB-side twin of ``rnd`` for oracle SQL strings."""
    f = float(10**s)
    return f"floor(({expr}) * {f} + 0.5) / {f}"
