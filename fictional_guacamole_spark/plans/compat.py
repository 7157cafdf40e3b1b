"""Cross-engine numeric compatibility helpers.

The driver hash-compares Spark results against a DuckDB oracle. Double-sum
aggregation is order-dependent in IEEE arithmetic, so a naive ``SUM(double)``
can differ in the low bits between engines (and between runs, since Spark's
partial aggregation order is nondeterministic). Technique used throughout the
query library:

    cast each input term to DECIMAL(25,6)  -> per-value deterministic
    SUM in decimal                          -> exact, order-insensitive
    cast the final result to DOUBLE         -> identical round-to-nearest bits

Both engines perform the identical exact computation, so the hashes match
bit-for-bit. Averages are expressed as decimal-sum / count (IEEE division of
identical operands is identical).

CAVEAT: the double→decimal cast is only cross-engine-exact while
|value| · 10^scale stays well under 2^53 — beyond that the scaling multiply
itself rounds, and engines may disagree in the last bit (observed with
price² ≈ 1e10 at scale 6). For products of large terms, cast the *inputs*
to decimal and multiply in decimal instead (see agg_corr_price_discount).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column) -> Column:
    """Order-insensitive, engine-portable sum of a double column."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Engine-portable average: exact decimal sum / count."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
