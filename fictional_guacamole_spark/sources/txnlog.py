"""Transactional parquet table: a minimal commit-log table format giving
the K1/K3 sink ACID properties without Delta Lake (which is not
installable in this container — see PARITY.md known gaps).

The reference's store is a transactional single file
(/root/reference/db_utils.py:17-32 — SQLite gives it atomic commits for
free). The engine's parquet sinks get idempotence from dynamic-partition
overwrite (streaming/pipeline.py), which is replay-safe but not ACID under
concurrent writers. This module supplies the missing properties with the
same CONCEPT the public Delta/Iceberg protocols use — an append-only
commit log over immutable parquet data files — implemented from scratch on
stdlib primitives:

- **Atomic commit**: each commit writes its data to a private directory,
  then publishes a JSON entry as ``_txnlog/<version>.json`` via
  ``os.link`` from a staged temp file — link(2) fails with EEXIST if the
  version is taken, so claiming a version and publishing its content is
  one atomic step (no reader can observe a half-written commit file).
- **Optimistic concurrency**: on EEXIST the writer re-reads the log (the
  winner's commit is now visible) and retries the next version. Two
  concurrent committers both land, serialized by the filesystem.
- **Exactly-once / idempotent replay**: every commit carries a caller
  ``txn_id``; a commit whose txn_id already appears in the log is a no-op
  (the foreachBatch replay contract — pass the micro-batch id and a
  retried batch converges, exactly Delta's ``txnAppId``/``txnVersion``
  pattern).
- **Snapshot isolation**: a read resolves the log ONCE and pins the
  explicit file list into the DataFrame's plan — a concurrent commit
  cannot change what an already-constructed frame reads. ``version=``
  gives time travel over the retained log.
- **Schema evolution (K3)**: each commit records its schema; reads union
  snapshots ``allowMissingColumns`` so a widened schema is readable
  across the boundary, old rows null-filled.

At 100 TB this layout is exactly the production pattern: the log is
KB-scale JSON regardless of data volume, data files are immutable and
scan-parallel, and commit conflicts cost one filesystem round-trip. On a
real cluster the ``os.link`` claim maps to the object store's
put-if-absent (S3 conditional PUT / GCS generation preconditions), which
is how open-source Delta's S3 LogStore works.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_txnlog"
_DATA_DIR = "data"


class TransactionalParquetTable:
    """A directory-backed transactional table (see module docstring)."""

    def __init__(self, path: str):
        self.path = path
        self.log_path = os.path.join(path, _LOG_DIR)
        os.makedirs(self.log_path, exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # -- log primitives -----------------------------------------------------

    def _entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.log_path)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.log_path, name)) as f:
                out.append(json.load(f))
        return sorted(out, key=lambda e: e["version"])

    def version(self) -> int:
        """Latest committed version (0 = empty table)."""
        entries = self._entries()
        return entries[-1]["version"] if entries else 0

    def history(self) -> list[dict]:
        """The commit log, oldest first (version, txn_id, data dir)."""
        return self._entries()

    # -- write path ----------------------------------------------------------

    def commit(self, df: DataFrame, txn_id: str, *,
               supersede_through: int | None = None) -> int:
        """Atomically append ``df`` as one commit; replays are no-ops.

        Returns the version that carries ``txn_id`` (the existing one on
        replay). The data is written BEFORE the commit is published, so a
        crash between the two leaves an unreferenced data directory (debris
        a vacuum pass may collect) — never a visible partial commit.

        ``supersede_through`` publishes the commit as a BASE entry that
        replaces every commit up to that log position (the compact
        mechanism, exposed so layered tables — e.g. the merge-on-read
        :class:`~fictional_guacamole_spark.sources.cdc.UpsertTable` — can
        publish a RESOLVED snapshot rather than the raw union
        :meth:`compact` writes).
        """
        existing = [e for e in self._entries() if e["txn_id"] == txn_id]
        if existing:
            return existing[0]["version"]

        rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(os.path.join(self.path, rel_dir))
        # data_dir is RELATIVE to the table root: the table stays readable
        # after a rename/move (atomic-publish builds, object-store copies)
        entry = {"txn_id": txn_id, "data_dir": rel_dir,
                 "schema": df.schema.json()}
        if supersede_through is not None:
            entry["base_through"] = supersede_through
        return self._publish(entry, txn_id)

    def _publish(self, entry: dict, txn_id: str) -> int:
        """Atomically claim the next version for ``entry`` (shared by
        commit and compact — the os.link claim + optimistic retry loop)."""
        staged = os.path.join(self.log_path, f".tmp.{uuid.uuid4().hex}")
        try:
            while True:
                entry["version"] = self.version() + 1
                with open(staged, "w") as f:
                    f.write(json.dumps(entry))
                target = os.path.join(self.log_path,
                                      f"{entry['version']:08d}.json")
                try:
                    os.link(staged, target)  # atomic claim + publish
                    return entry["version"]
                except FileExistsError:
                    # lost the race: the winner's commit is visible now —
                    # it may even be OUR txn_id via a concurrent replay
                    dup = [e for e in self._entries()
                           if e["txn_id"] == txn_id]
                    if dup:
                        return dup[0]["version"]
        finally:
            if os.path.exists(staged):
                os.unlink(staged)

    # -- maintenance ---------------------------------------------------------

    def compact(self, spark: SparkSession, txn_id: str) -> int:
        """OPTIMIZE: rewrite the current snapshot as ONE data directory and
        publish it as a *base* commit that supersedes everything up to the
        snapshot it read (``base_through``).

        Small-file compaction is what keeps a commit-log table readable at
        scale — a long-running foreachBatch sink accretes one directory per
        micro-batch, and scan cost grows with file count, not data size.
        Concurrency-safe by construction: the base entry records the log
        position it actually read, so an append that lands DURING the
        compaction claims a later version and stays visible (readers take
        the base plus every non-base entry past ``base_through``). Replays
        of the compaction itself converge through the same txn_id check as
        any commit."""
        existing = [e for e in self._entries() if e["txn_id"] == txn_id]
        if existing:
            return existing[0]["version"]

        through = self.version()
        if through == 0:
            return 0  # empty log: nothing to fold (see cdc.compact_resolved)
        snapshot = self.read(spark, version=through)
        rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        snapshot.write.mode("overwrite").parquet(
            os.path.join(self.path, rel_dir))
        entry = {"txn_id": txn_id, "data_dir": rel_dir,
                 "schema": snapshot.schema.json(), "base_through": through}
        return self._publish(entry, txn_id)

    def vacuum(self) -> list[str]:
        """Delete data directories no longer reachable from the LATEST
        snapshot: commits superseded by a base (version ≤ its
        ``base_through``) and crash debris (data dirs referenced by no log
        entry). Returns the removed relative paths.

        The trade is the same one Delta's VACUUM makes: time travel to a
        version at or before the base's snapshot stops working once its
        files are gone (the log entries remain, so ``history()`` still
        shows lineage). A production deployment would add a retention
        age-guard before each delete; the in-container single-writer tests
        don't need one."""
        import shutil

        entries = self._entries()
        base = self._latest_base(entries)
        live = set()
        for e in entries:
            superseded = (base is not None and e is not base
                          and e["version"] <= base["base_through"])
            if not superseded:
                live.add(e["data_dir"])
        removed = []
        data_root = os.path.join(self.path, _DATA_DIR)
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, name)
            if rel not in live:
                shutil.rmtree(os.path.join(data_root, name),
                              ignore_errors=True)
                removed.append(rel)
        return removed

    # -- read path -----------------------------------------------------------

    @staticmethod
    def _latest_base(entries: list[dict]) -> dict | None:
        bases = [e for e in entries if "base_through" in e]
        return bases[-1] if bases else None

    @staticmethod
    def _snapshot_entries(entries: list[dict]) -> list[dict]:
        """The live commit set: the latest base (if any) plus every
        non-base entry past the log position that base actually read —
        which keeps appends that raced with the compaction, and lets an
        older base's content be safely ignored (it is contained in the
        newer base plus those appends)."""
        base = TransactionalParquetTable._latest_base(entries)
        if base is None:
            return entries
        return [base] + [e for e in entries
                         if "base_through" not in e
                         and e["version"] > base["base_through"]]

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read (optionally time-traveled to ``version``).

        The commit list is resolved HERE, once: the returned DataFrame's
        plan carries explicit directories, so later commits never leak
        into an existing frame (snapshot isolation). Snapshots with
        differing schemas union by name with missing columns null-filled
        (K3 schema evolution). After a compaction, reads resolve to the
        base file plus post-snapshot appends; time travel before the base
        keeps working until :meth:`vacuum` reclaims the superseded files.
        """
        parts = self.snapshot_parts(spark, version)
        if not parts:
            schema = (T.StructType.fromJson(json.loads(es[-1]["schema"]))
                      if (es := self._entries()) else T.StructType([]))
            return spark.createDataFrame([], schema)
        out = parts[0][1]
        for _, p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def snapshot_parts(self, spark: SparkSession,
                       version: int | None = None
                       ) -> list[tuple[int, DataFrame]]:
        """The live commit set as (version, DataFrame) pairs, oldest first
        — the resolution primitive layered tables build on: a merge-on-
        read reader needs each part's log position to order row versions
        (latest wins), which the flat union of :meth:`read` erases."""
        entries = self._entries()
        if version is not None:
            entries = [e for e in entries if e["version"] <= version]
        entries = self._snapshot_entries(entries)
        return [(e["version"],
                 spark.read.parquet(os.path.join(self.path, e["data_dir"])))
                for e in entries]
