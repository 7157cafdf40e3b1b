"""Distributed SQLite scan + single-writer sink (S4/K1 parity).

The reference's only persistent store is SQLite
(/root/reference/db_utils.py:17-32 creates it; export_to_csv.py:8-10 reads
it back). The container ships no JDBC driver jar, so this module gives the
engine a REAL, demonstrated SQLite path using the stdlib ``sqlite3``
module executor-side:

- :func:`read_sqlite` — a range-partitioned parallel scan: the driver
  reads only ``MIN(rowid)/MAX(rowid)`` and the schema, splits the rowid
  space into N ranges, and each Spark task opens the database read-only
  and pulls its slice with ``rowid BETWEEN lo AND hi``. This is exactly
  the shape of Spark's JDBC ``partitionColumn/lowerBound/upperBound``
  scan — swap the connection line for a JDBC URL and the plan is
  unchanged. Column pruning and predicate pushdown are genuine: the
  SELECT list and WHERE clause are evaluated by SQLite inside each task,
  so only surviving rows cross into Spark.
- :func:`write_sqlite` — the K1 append analogue. SQLite is a
  single-writer store (the reference writes from one process —
  real_guac.py's single consumer loop), so the frame is written from one
  task via ``coalesce(1)``. Pass ``primary_key`` to get idempotent
  appends: the DDL declares the key and rows go in with ``INSERT OR
  REPLACE``, so a retried/replayed batch converges instead of
  duplicating. WITHOUT a declared key the write is plain ``INSERT`` and
  retries DO duplicate — callers needing exactly-once must supply the
  key (streaming/pipeline.py's parquet sink gets the same property from
  dynamic-partition overwrite instead).

At 100 TB the data does not live in SQLite — the pattern is what scales:
a metadata/lookup table in any single-node store becomes a
range-partitioned parallel read feeding a broadcast, while fact-scale
data stays on parquet (tables.py). The scan's partition count bounds
per-task memory; sqlite's page cache makes co-resident range reads
near-sequential IO.
"""

from __future__ import annotations

import re
import sqlite3
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_idents(*names: str) -> None:
    """SQL-identifier whitelist for everything interpolated into DDL/DML.
    Names are always double-quoted at the use site too; this guard keeps
    the public API safe even against quote-smuggling inputs."""
    bad = [n for n in names if not _IDENT.match(n or "")]
    if bad:
        raise ValueError(f"invalid SQL identifier(s): {bad}")

# SQLite type affinity (https://www.sqlite.org/datatype3.html §3.1) →
# Spark type. Declared types are free-form; affinity is what the engine
# actually applies, so mapping affinity is the faithful translation.
def _affinity_type(declared: str) -> T.DataType:
    d = (declared or "").upper()
    if "INT" in d:
        return T.LongType()
    if any(k in d for k in ("CHAR", "CLOB", "TEXT")):
        return T.StringType()
    if d == "" or "BLOB" in d:
        return T.BinaryType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB")):
        return T.DoubleType()
    return T.DoubleType()  # NUMERIC affinity


def _schema_of(db_path: str, table: str,
               columns: list[str] | None) -> T.StructType:
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    if not info:
        raise ValueError(f"sqlite table not found: {table}")
    by_name = {row[1]: _affinity_type(row[2]) for row in info}
    names = columns if columns is not None else [row[1] for row in info]
    missing = [c for c in names if c not in by_name]
    if missing:
        raise ValueError(f"columns not in {table}: {missing}")
    return T.StructType([T.StructField(n, by_name[n]) for n in names])


def read_sqlite(spark: SparkSession, db_path: str, table: str,
                columns: list[str] | None = None,
                where: str | None = None,
                num_partitions: int = 8) -> DataFrame:
    """Range-partitioned parallel scan of one SQLite table.

    ``columns`` prunes the SELECT list and ``where`` pushes the predicate
    into SQLite itself (both evaluated store-side, per task). The rowid
    space is split evenly; sparse rowids only skew partition sizes, never
    correctness (ranges partition the keyspace) — see the adversarial-gap
    property tests in tests/test_source_formats.py.

    Parallelism requires an implicit rowid; a ``WITHOUT ROWID`` table or a
    view has none, so those fall back to one whole-table partition (the
    predicate/column pushdown still applies). A future ``partition_column``
    argument is the JDBC-style answer if a parallel scan of such a table
    is ever needed.
    """
    _check_idents(table, *(columns or []))
    schema = _schema_of(db_path, table, columns)
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        try:
            lo, hi = con.execute(
                f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"').fetchone()
            has_rowid = True
        except sqlite3.OperationalError:
            # WITHOUT ROWID table or view: no implicit rowid to range over
            lo, hi, has_rowid = 0, 0, False
    finally:
        con.close()
    if has_rowid and lo is None:  # empty table
        return spark.createDataFrame([], schema)

    if has_rowid:
        n = max(1, min(num_partitions, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
                  for i in range(n) if lo + i * step <= hi]
    else:
        ranges = [(0, 0)]  # single whole-table scan task
    select_list = ", ".join(f'"{f.name}"' for f in schema.fields)
    arrow_names = [f.name for f in schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
            try:
                for r_lo, r_hi in zip(pdf["lo"], pdf["hi"]):
                    if has_rowid:
                        pred = f" AND ({where})" if where else ""
                        out = pd.read_sql_query(
                            f'SELECT {select_list} FROM "{table}" '
                            f"WHERE rowid BETWEEN ? AND ?{pred}",
                            con, params=(int(r_lo), int(r_hi)))
                    else:
                        pred = f" WHERE {where}" if where else ""
                        out = pd.read_sql_query(
                            f'SELECT {select_list} FROM "{table}"{pred}', con)
                    out.columns = arrow_names
                    if len(out):
                        yield out
            finally:
                con.close()

    # exactly one range per task: parallelize's even slicing guarantees it,
    # where repartition(n, "lo") hash-partitions and can collide two ranges
    # into one task (halving effective scan parallelism) while idling another
    bounds = spark.createDataFrame(
        spark.sparkContext.parallelize(ranges, len(ranges)),
        "lo long, hi long")
    return bounds.mapInPandas(scan, schema=schema)


def write_sqlite(df: DataFrame, db_path: str, table: str,
                 mode: str = "append",
                 primary_key: list[str] | None = None) -> None:
    """Single-writer append into SQLite (K1 analogue; see module doc).

    ``mode='replace'`` recreates the table from the frame's schema. With
    ``primary_key``, the DDL declares the key and rows are written with
    ``INSERT OR REPLACE`` — a replayed batch (checkpoint retry) converges
    to the same table instead of duplicating. Without it, appends are
    plain ``INSERT`` and are NOT idempotent. The write funnels through one
    task because SQLite serializes writers — the same single-consumer
    shape as the reference's ingest loop.
    """
    if mode not in ("append", "replace"):
        raise ValueError(f"mode must be 'append' or 'replace', got {mode!r}")
    names = df.schema.fieldNames()
    pk = list(primary_key or [])
    _check_idents(table, *names, *pk)
    missing = [c for c in pk if c not in names]
    if missing:
        raise ValueError(f"primary_key columns not in frame: {missing}")
    ddl_types = {T.LongType(): "INTEGER", T.IntegerType(): "INTEGER",
                 T.DoubleType(): "REAL", T.FloatType(): "REAL",
                 T.BinaryType(): "BLOB"}
    cols_ddl = ", ".join(
        f'"{f.name}" {ddl_types.get(f.dataType, "TEXT")}'
        for f in df.schema.fields)
    if pk:
        cols_ddl += ", PRIMARY KEY (" + ", ".join(
            f'"{c}"' for c in pk) + ")"
    verb = "INSERT OR REPLACE" if pk else "INSERT"

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(db_path, timeout=30.0)
        try:
            if mode == "replace":
                con.execute(f'DROP TABLE IF EXISTS "{table}"')
            con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({cols_ddl})')
            placeholders = ", ".join("?" for _ in names)
            ins = (f'{verb} INTO "{table}" '
                   f'({", ".join(chr(34) + n + chr(34) for n in names)}) '
                   f"VALUES ({placeholders})")
            total = 0
            for pdf in batches:
                rows = [tuple(None if pd.isna(v) else v for v in rec)
                        for rec in pdf[names].itertuples(index=False)]
                con.executemany(ins, rows)
                total += len(rows)
            con.commit()
        finally:
            con.close()
        yield pd.DataFrame({"n_written": [total]})

    # coalesce(1): one writer, matching sqlite's write model; collect the
    # count so the action is driven and failures surface
    df.coalesce(1).mapInPandas(
        write_partition, schema="n_written long").collect()
