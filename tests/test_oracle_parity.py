"""The t2 gate, run locally: every registered query with an oracle is
executed in Spark AND in DuckDB on the same parquet tables, then compared on
row count, column names, and an order-insensitive value hash — mirroring the
driver's CORRECTNESS check so failures surface before the round boundary.
"""

from __future__ import annotations

import hashlib
import math
import os
from decimal import Decimal

import duckdb
import pytest

from fictional_guacamole_spark.plans import REGISTRY
from fictional_guacamole_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v) -> str:
    """Canonical string for one cell, tolerant of engine container types."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of a double is exact & unique — bit-level comparison
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def _hash_rows(rows: list[tuple]) -> str:
    lines = sorted("|".join(_canon(c) for c in row) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


_SPARK_TYPE_CLASS = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f",
    "string": "s", "boolean": "b", "timestamp": "t", "timestamp_ntz": "t",
    "date": "d", "binary": "y",
}
# HUGEINT deliberately does NOT alias "i": Spark has no int128, so a HUGEINT
# oracle column (DuckDB's SUM over integers) always diverges from Spark's
# BIGINT in the driver's dtype-sensitive canonicalizer — CAST the oracle's
# SUM to BIGINT instead (this is exactly how q12 failed the r1 driver gate
# while passing the then-coarser local mirror).
_DUCK_TYPE_CLASS = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "HUGEINT": "hugeint", "FLOAT": "f", "DOUBLE": "f",
    "VARCHAR": "s", "BOOLEAN": "b", "TIMESTAMP": "t", "TIMESTAMP_NS": "t",
    "DATE": "d", "BLOB": "y",
}


def _spark_type_class(dt: str) -> str:
    if dt.startswith("array<"):
        return "l<" + _spark_type_class(dt[6:-1]) + ">"
    if dt.startswith("decimal"):
        return "dec"
    return _SPARK_TYPE_CLASS.get(dt, dt)


def _duck_type_class(dt: str) -> str:
    if dt.endswith("[]"):
        return "l<" + _duck_type_class(dt[:-2]) + ">"
    if dt.startswith("DECIMAL"):
        return "dec"
    return _DUCK_TYPE_CLASS.get(dt, dt)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    from fictional_guacamole_spark.plans import JUDGE_WINDOW

    q = REGISTRY[name]
    sdf = q.builder(spark, SF_DIR)
    if name in JUDGE_WINDOW:
        # the driver's comparator canonicalizes through a pandas sort +
        # factorize, which crashes on list/map/struct cells — every judged
        # output column must be a scalar type
        nonscalar = [(c, t) for c, t in sdf.dtypes
                     if t.startswith(("array", "map", "struct"))]
        assert not nonscalar, (
            f"{name}: judged output has non-scalar columns {nonscalar}; "
            "serialize them (array_join/to_json) on both engines")
    spark_cols = [c.lower() for c in sdf.columns]
    spark_types = [_spark_type_class(t) for _, t in sdf.dtypes]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(q.oracle)
    duck_cols = [c.lower() for c in rel.columns]
    duck_types = [_duck_type_class(str(t)) for t in rel.types]
    duck_rows = rel.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert spark_types == duck_types, (
        f"{name}: dtype mismatch {list(zip(spark_cols, spark_types, duck_types))}")
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    sh, dh = _hash_rows(spark_rows), _hash_rows(duck_rows)
    if sh != dh:
        s_set = {tuple(_canon(c) for c in r) for r in spark_rows}
        d_set = {tuple(_canon(c) for c in r) for r in duck_rows}
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        pytest.fail(f"{name}: value hash mismatch\n spark-only={only_s}\n "
                    f"duck-only={only_d}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
