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

- **Zone-map data skipping**: a commit made with ``stats_cols`` records
  per-data-file min/max for those columns in the log entry (read once
  from the parquet footers pyarrow already wrote — no extra Spark job),
  exactly Delta's per-AddFile ``stats`` / the classic zone map.
  :meth:`read_pruned` then drops whole files whose [min, max] cannot
  intersect a requested range BEFORE any Spark job runs: the surviving
  file list is pinned into the plan, so a selective read of a
  range-clustered table scans a fraction of the files. At 100 TB this is
  the difference between "scan 100 TB to answer a one-day query" and
  "scan the three files whose ts range covers that day" — the log is the
  index, and it is KB-scale. Skipping is an optimization, not a filter:
  surviving files may contain out-of-range rows, and the caller applies
  the exact predicate (which Spark then ALSO pushes into the surviving
  files' row groups — footer pruning composes below file pruning).

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

# On-disk layout version. Bump on ANY change to the log-entry JSON shape,
# directory layout, or data-file encoding: cache keys derived from tables
# of this format (e.g. the /tmp table caches in plans/curation.py) fold
# this in, so a layout change automatically invalidates stale on-disk
# tables built by an older writer (r10 advice).
FORMAT_VERSION = 1


def _stat_key(v):
    """JSON-storable, order-preserving encoding of one stats value.

    int/float/str store as-is; date/datetime store as ``isoformat()``
    strings, whose fixed field order makes lexicographic == chronological
    (a missing fractional part reads as .000000, which the string order
    also gets right). tz-aware datetimes — pyarrow surfaces Spark's
    UTC-adjusted TIMESTAMP_MICROS stats that way — are converted to UTC
    and stripped of tzinfo FIRST, so file stats and naive caller bounds
    render in one convention: without this, a '+00:00' suffix makes an
    exactly-boundary-aligned file compare strictly greater than the
    equal inclusive bound and get wrongly pruned. Bytes that are not
    strict UTF-8 encode as None (unprunable — the safe side, a lossy
    replacement string could mis-order against str bounds). Everything
    else is unsupported — the caller picked the stats columns, so fail
    loudly rather than mis-prune."""
    import datetime

    if v is None or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):  # pyarrow may surface BYTE_ARRAY stats raw
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None  # undecodable stat: unprunable, never mis-ordered
    raise TypeError(f"unsupported zone-map stats type: {type(v).__name__}")


def _session_naive_dt_to_utc(spark, v):
    """Interpret a NAIVE datetime bound in the session timezone and
    convert it to UTC-naive — the frame `_stat_key` renders file stats
    in, and the frame Spark itself gives a naive timestamp literal in
    the caller's residual filter. Identity under a UTC session;
    tz-aware values and non-datetimes pass through (tz-aware is handled
    by `_stat_key`). An unresolvable session zone falls back to the raw
    value (UTC-equivalent behavior, matching every session this engine
    configures)."""
    import datetime

    if not isinstance(v, datetime.datetime) or v.tzinfo is not None:
        return v
    try:
        tzname = spark.conf.get("spark.sql.session.timeZone")
        from zoneinfo import ZoneInfo
        zone = ZoneInfo(tzname)
    except Exception:
        return v
    return (v.replace(tzinfo=zone).astimezone(datetime.timezone.utc)
            .replace(tzinfo=None))


def zone_map_survives(stats: dict, bounds: dict) -> bool:
    """The pruning decision: may this file intersect every bounded range?

    ``stats``: column → [min, max] (encoded via :func:`_stat_key`) or
    None. ``bounds``: column → (lo, hi) encoded, either side None for
    open — or a LIST of such ranges, meaning the file survives when it
    may intersect ANY of them (the IN-list / probed-cell-set shape: one
    pruning pass over the file list instead of one scan per value).
    Missing/None stats can never prune — the safety direction.
    Module-level so the property tests can drive it against a row model
    without a SparkSession in the loop."""
    for col, rs in bounds.items():
        mm = stats.get(col)
        if mm is None or mm[0] is None or mm[1] is None:
            continue  # no/opaque stats for this column: cannot prune
        ranges = rs if isinstance(rs, list) else [rs]
        if not any((hi is None or mm[0] <= hi) and
                   (lo is None or mm[1] >= lo) for lo, hi in ranges):
            return False
    return True


def _file_stats(file_path: str, cols: list[str]) -> dict:
    """Per-file min/max for ``cols`` from the parquet footer (row-group
    stats aggregated; no data pages read). A column with no usable stats
    maps to None — the file then survives every prune on that column."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    stats: dict[str, list | None] = {c: None for c in cols}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for i, name in enumerate(names):
            if name not in stats:
                continue
            st = row_group.column(i).statistics
            if st is None or not st.has_min_max:
                stats[name] = None  # one opaque row group poisons the file
                continue
            lo, hi = _stat_key(st.min), _stat_key(st.max)
            if lo is None or hi is None:  # undecodable bytes stat
                stats[name] = None
                continue
            cur = stats[name]
            if cur is None and rg > 0:
                continue  # already poisoned by an earlier opaque group
            stats[name] = ([lo, hi] if cur is None
                           else [min(cur[0], lo), max(cur[1], hi)])
    return {"rows": md.num_rows, "stats": stats}


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
               supersede_through: int | None = None,
               stats_cols: list[str] | None = None) -> int:
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

        ``stats_cols`` records per-file zone maps (min/max per listed
        column, read from the just-written parquet footers) in the log
        entry, enabling :meth:`read_pruned` file skipping over this
        commit.
        """
        existing = [e for e in self._entries() if e["txn_id"] == txn_id]
        if existing:
            return existing[0]["version"]

        rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        self._write(df, rel_dir, stats_wanted=bool(stats_cols))
        # data_dir is RELATIVE to the table root: the table stays readable
        # after a rename/move (atomic-publish builds, object-store copies)
        entry = {"txn_id": txn_id, "data_dir": rel_dir,
                 "schema": df.schema.json()}
        if stats_cols:
            entry["files"] = self._collect_stats(rel_dir, stats_cols)
        if supersede_through is not None:
            entry["base_through"] = supersede_through
        return self._publish(entry, txn_id)

    def _write(self, df: DataFrame, rel_dir: str, *,
               stats_wanted: bool) -> None:
        """Write one commit's data dir. When zone maps are requested,
        timestamps must be written as TIMESTAMP_MICROS: Spark's default
        INT96 physical type is deprecated and carries NO footer min/max
        (the same reason Delta requires int64 timestamps for its stats).
        The conf flip is scoped to this write and restored after — the
        single-writer commit path, not a concurrent mutation surface."""
        target = os.path.join(self.path, rel_dir)
        if not stats_wanted:
            df.write.mode("overwrite").parquet(target)
            return
        key = "spark.sql.parquet.outputTimestampType"
        sess = df.sparkSession
        prev = sess.conf.get(key, None)
        sess.conf.set(key, "TIMESTAMP_MICROS")
        try:
            df.write.mode("overwrite").parquet(target)
        finally:
            if prev is None:
                sess.conf.unset(key)
            else:
                sess.conf.set(key, prev)

    def _collect_stats(self, rel_dir: str,
                       stats_cols: list[str]) -> list[dict]:
        """Zone maps for every data file in ``rel_dir`` — a footer-only
        pass (KB per file), the same cost profile as Delta writing
        AddFile.stats."""
        abs_dir = os.path.join(self.path, rel_dir)
        out = []
        for name in sorted(os.listdir(abs_dir)):
            if not name.endswith(".parquet"):
                continue
            rec = _file_stats(os.path.join(abs_dir, name), stats_cols)
            rec["path"] = os.path.join(rel_dir, name)
            out.append(rec)
        return out

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

    def compact(self, spark: SparkSession, txn_id: str, *,
                stats_cols: list[str] | None = None,
                cluster_by: list[str] | None = None,
                n_output_files: int | None = None) -> int:
        """OPTIMIZE: rewrite the current snapshot as ONE data directory and
        publish it as a *base* commit that supersedes everything up to the
        snapshot it read (``base_through``).

        ``cluster_by`` additionally range-partitions and sorts the
        rewritten snapshot on the given columns (``n_output_files`` output
        files, default 8) — the Delta ``OPTIMIZE ... ZORDER``-style layout
        pass for 1-D keys. Micro-batch ingest lands files whose key spans
        overlap arbitrarily, which erodes :meth:`read_pruned`'s skip rate;
        a clustered compaction restores tight per-file [min, max] so
        skipping is effective again. Pair it with ``stats_cols`` so the
        new base's zone maps are recorded.

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
        if cluster_by:
            snapshot = (snapshot
                        .repartitionByRange(n_output_files or 8, *cluster_by)
                        .sortWithinPartitions(*cluster_by))
        rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        self._write(snapshot, rel_dir, stats_wanted=bool(stats_cols))
        entry = {"txn_id": txn_id, "data_dir": rel_dir,
                 "schema": snapshot.schema.json(), "base_through": through}
        if stats_cols:
            entry["files"] = self._collect_stats(rel_dir, stats_cols)
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
            # Empty-snapshot schema comes from the version-pinned entry
            # list, not the log head: after schema evolution a time
            # travel must present the pinned snapshot's schema.
            es = self._entries()
            if version is not None:
                es = [e for e in es if e["version"] <= version]
            schema = (T.StructType.fromJson(json.loads(es[-1]["schema"]))
                      if es else T.StructType([]))
            return spark.createDataFrame([], schema)
        out = parts[0][1]
        for _, p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def read_pruned(self, spark: SparkSession,
                    ranges: dict[str, tuple],
                    version: int | None = None) -> DataFrame:
        """Snapshot read with zone-map file skipping.

        ``ranges`` maps column → ``(lo, hi)`` inclusive bounds (either
        side ``None`` for open), or a LIST of such bounds meaning the
        file survives when it may intersect ANY of them (the probed-cell
        / IN-list shape: ONE scan node over the union of surviving
        files, instead of a per-value union of scans). A data file is
        skipped when its recorded [min, max] on ANY bounded column
        cannot intersect the requested range(s); files (or whole
        commits) without recorded stats always survive — skipping can
        only drop provably-irrelevant files, never rows the predicate
        wants. The surviving file list is resolved HERE, once, and
        pinned into the plan (same snapshot-isolation contract as
        :meth:`read`).

        This is an OPTIMIZATION, not the predicate: the result may
        contain out-of-range rows from surviving files, and the caller
        applies the exact ``filter(...)`` — which Catalyst then pushes
        into the surviving files' row groups, so footer-level pruning
        stacks under file-level pruning.

        Naive ``datetime`` bounds are interpreted in the SESSION
        timezone and converted to UTC before comparison — the same frame
        Spark gives a naive timestamp literal in the caller's residual
        filter, and the frame parquet stats are stored in (UTC-adjusted
        TIMESTAMP_MICROS). Under a UTC session this is the identity;
        under any other session tz, skipping the conversion would
        compare wall clocks from two different zones and could wrongly
        prune boundary files.
        """
        def enc(v):
            return _stat_key(_session_naive_dt_to_utc(spark, v)) \
                if v is not None else None

        bounds = {c: [(enc(lo), enc(hi)) for lo, hi in r]
                  if isinstance(r, list) else (enc(r[0]), enc(r[1]))
                  for c, r in ranges.items()}

        entries = self._entries()
        if version is not None:
            entries = [e for e in entries if e["version"] <= version]
        parts: list[DataFrame] = []
        for e in self._snapshot_entries(entries):
            schema = T.StructType.fromJson(json.loads(e["schema"]))
            if "files" not in e:  # stats-less commit: read it whole
                parts.append(spark.read.schema(schema).parquet(
                    os.path.join(self.path, e["data_dir"])))
                continue
            keep = [os.path.join(self.path, f["path"])
                    for f in e["files"]
                    if zone_map_survives(f["stats"], bounds)]
            if keep:
                parts.append(spark.read.schema(schema).parquet(*keep))
        if not parts:
            # `entries` is already version-filtered above — the pinned
            # snapshot's schema, not the log head's (schema evolution).
            schema = (T.StructType.fromJson(json.loads(entries[-1]["schema"]))
                      if entries else T.StructType([]))
            return spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
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
