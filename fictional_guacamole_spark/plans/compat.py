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

from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dec_to_double_exact(d: Column) -> Column:
    """Decimal column → double, bit-identically across engines even when
    the decimal exceeds 53 bits of mantissa.

    A direct decimal→double cast diverges in the last bit between engines
    for large values (DuckDB converts int128→double then divides by
    10^scale — two roundings; the JVM rounds the full decimal once).
    Splitting into integer part (exact as long) + fraction (exactly one
    correctly-rounded small conversion in both engines) leaves a single
    identical rounded addition. Decimal *rescaling* is NOT portable either
    (Spark rounds half-up, DuckDB differs on ties) — never rescale.
    """
    i = F.floor(d)
    return i.cast("long").cast("double") + (d - i).cast("double")


def sql_dec_to_double_exact(d: str) -> str:
    """DuckDB rendering of :func:`dec_to_double_exact`."""
    return (f"(CAST(CAST(FLOOR({d}) AS BIGINT) AS DOUBLE)"
            f" + CAST(({d}) - FLOOR({d}) AS DOUBLE))")


def dsum(col: Column) -> Column:
    """Order-insensitive, engine-portable sum of a double column.

    The final decimal→double conversion goes through the split form so the
    result stays bit-identical even when the sum exceeds 53 mantissa bits.
    """
    return dec_to_double_exact(F.sum(col.cast(DEC)))


def davg(col: Column) -> Column:
    """Engine-portable average: exact decimal sum / count."""
    return dec_to_double_exact(F.sum(col.cast(DEC))) / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB-side rendering of :func:`dsum`."""
    return sql_dec_to_double_exact(f"SUM(CAST({expr} AS DECIMAL(25,6)))")


def sql_davg(expr: str) -> str:
    """DuckDB-side rendering of :func:`davg`."""
    return (sql_dec_to_double_exact(f"SUM(CAST({expr} AS DECIMAL(25,6)))")
            + f" / COUNT({expr})")


@contextmanager
def scoped_shuffle_partitions(spark, n: int):
    """Scope ``spark.sql.shuffle.partitions`` for one judged query whose
    intermediate tables are orders of magnitude smaller than the corpus
    (e.g. BPE's Heaps-bounded vocabulary, streaming state stores — see
    windows_streaming._stream_state_partitions for the streaming variant).
    The count is a deployment sizing knob, not semantics: results are
    identical at any value. Restored on exit so surrounding plans keep the
    session default."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
