"""Jar-free transactional table format: snapshot-isolation commits,
time travel, MERGE upsert, and concurrent-writer safety over plain
parquet — built from first principles on the PUBLIC log-structured
table protocol concepts (Delta Lake's commit log / Iceberg's snapshot
manifests, as described in their published papers), the way
``operators/avro_py.py`` builds the Avro OCF codec from the public
spec. The reference has no sink/DML surface at all (SURVEY §2.8) —
this is the superset a production pipeline needs where
``pipeline_merge_upsert``'s atomic-directory-swap emulation stops:
snapshot commits, read-at-version, and two writers racing.

Protocol
--------
::

    table/
      _txn/v00000001.json     one JSON commit per snapshot
      data/<uuid>/part-*.parquet   immutable data files

- **Atomic publication**: a commit is a single JSON file named by its
  version, created with POSIX put-if-absent (``os.link`` of a temp
  file onto the final name — fails with ``FileExistsError`` if the
  version already exists). Readers either see the whole commit or
  none: snapshot isolation without locks. On an object store a
  production deployment swaps this one primitive for a conditional
  PUT / commit service (the documented Delta approach); everything
  else is storage-agnostic.
- **Optimistic concurrency**: a writer losing the race re-reads the
  log, revalidates against the new snapshot, and retries with the
  next version number. Appends always revalidate trivially;
  merge/overwrite recompute from the fresh snapshot.
- **Immutability**: commits never rewrite parquet — they add and
  remove *references*. Time travel is replaying the log prefix.
- **File skipping**: each added file carries row count and min/max
  stats of a designated key column (read from the parquet footers via
  pyarrow). MERGE rewrites ONLY files whose key range intersects the
  source batch's range — a file whose [min,max] is disjoint from the
  source's [min,max] cannot contain any matched key, so it survives
  untouched (Delta-style data skipping applied to write amplification).
  At 100 TB with time-clustered ingest keys this turns a full-table
  rewrite into a few-file rewrite.

Scale notes: the log is O(commits) tiny JSON; reads list one directory
and load K parquet path lists — no driver-side data. All data movement
is ``spark.read.parquet(paths)`` / ``df.write.parquet`` (distributed,
columnar, predicate-pushdown preserved). ``vacuum`` deletes data files
unreferenced by any snapshot >= a cutoff (time travel below the cutoff
is forfeited, as in Delta VACUUM).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txn"
_DATA_DIR = "data"
_V_FMT = "v%08d.json"


class CommitConflict(Exception):
    """Another writer published this version first (caught internally
    by the retry loop; surfaces only when retries are exhausted)."""


def _json_scalar(v):
    """Parquet-footer stat -> JSON-safe scalar (bytes decode, dates
    stringify); None passes through."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (int, float, str)) or v is None:
        return v
    return str(v)


class TxnTable:
    """Handle on a transactional parquet table rooted at ``path``.

    >>> t = TxnTable.create(spark, path, df, key="o_orderkey")
    >>> t.append(more)              # snapshot 2
    >>> t.merge(updates)            # snapshot 3 (upsert on the key)
    >>> t.read()                    # latest
    >>> t.read(version=1)           # time travel
    >>> t.history()                 # [{'version': 1, 'action': ...}]
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log = os.path.join(path, _LOG_DIR)

    # ---------------------------------------------------------- setup
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame | None = None,
        key: str | None = None,
        n_buckets: int | None = None,
    ) -> "TxnTable":
        """Initialize the table (version 1 = empty create or the given
        frame). ``key`` designates the stats/merge column recorded per
        data file; ``n_buckets`` fixes a hash-bucketed layout for the
        table's lifetime (see :meth:`_write_data`)."""
        if n_buckets is not None and key is None:
            raise ValueError("n_buckets requires a key column")
        t = cls(spark, path)
        os.makedirs(t._log, exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        if t.latest_version() > 0:
            raise ValueError(f"table already exists at {path}")
        adds = t._write_data(df, key, n_buckets) if df is not None else []
        schema = df.schema.json() if df is not None else None
        t._commit_with_retry(
            lambda snap: {"action": "create", "add": adds, "remove": [],
                          "key": key, "schema": schema,
                          "n_buckets": n_buckets},
            max_retries=0,
        )
        return t

    # ------------------------------------------------------------ log
    def latest_version(self) -> int:
        try:
            vs = [
                int(f[1:9])
                for f in os.listdir(self._log)
                if f.startswith("v") and f.endswith(".json")
            ]
        except FileNotFoundError:
            return 0
        return max(vs, default=0)

    def _read_log(self, version: int | None = None) -> list[dict]:
        head = self.latest_version() if version is None else version
        out = []
        for v in range(1, head + 1):
            p = os.path.join(self._log, _V_FMT % v)
            try:
                with open(p) as fh:
                    out.append(json.load(fh))
            except FileNotFoundError:
                raise ValueError(
                    f"version {v} missing from log at {self._log} "
                    f"(requested snapshot {head})"
                ) from None
        return out

    def _live_files(self, version: int | None = None) -> list[dict]:
        live: dict[str, dict] = {}
        for entry in self._read_log(version):
            for rel in entry.get("remove", []):
                live.pop(rel, None)
            for add in entry.get("add", []):
                live[add["path"]] = add
        return list(live.values())

    def history(self) -> list[dict]:
        """Commit metadata per version (action, file/row deltas, key)."""
        return [
            {
                "version": e["version"],
                "action": e["action"],
                "n_added_files": len(e.get("add", [])),
                "n_removed_files": len(e.get("remove", [])),
                "n_added_rows": sum(a["rows"] for a in e.get("add", [])),
                "key": e.get("key"),
            }
            for e in self._read_log()
        ]

    def table_key(self) -> str | None:
        log = self._read_log()
        return log[0].get("key") if log else None

    def table_buckets(self) -> int | None:
        log = self._read_log()
        return log[0].get("n_buckets") if log else None

    # ----------------------------------------------------------- data
    def _write_data(
        self, df: DataFrame, key: str | None, n_buckets: int | None = None
    ) -> list[dict]:
        """Write a frame as immutable parquet under ``data/<uuid>/``;
        return add-entries with per-file row counts and key min/max
        stats from the parquet footers (pyarrow — no data read).

        ``n_buckets``: hash-bucketed LAYOUT — rows land in
        ``__bucket=pmod(xxhash64(key), n)`` partition dirs and each
        manifest entry records its bucket. Range stats skip files for
        time-clustered keys; buckets skip files for UNIFORM keys (a
        small merge batch touches at most |batch| buckets), the
        complementary half of write-amplification control."""
        import pyarrow.parquet as pq

        sub = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        out_dir = os.path.join(self.path, sub)
        if n_buckets and key is not None:
            from pyspark.sql import functions as F

            (
                df.withColumn(
                    "__bucket",
                    F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)),
                )
                # repartition ON the bucket column first: without it,
                # partitionBy splits EVERY upstream task per bucket —
                # tasks x buckets files (measured 64x64=4096 on a 15M-row
                # create); with it, one file per non-empty bucket.
                .repartition(n_buckets, "__bucket")
                .write.partitionBy("__bucket")
                .parquet(out_dir)
            )
            parts = []
            for d in sorted(os.listdir(out_dir)):
                if d.startswith("__bucket="):
                    b = int(d.split("=", 1)[1])
                    for f in sorted(
                        os.listdir(os.path.join(out_dir, d))
                    ):
                        parts.append((os.path.join(d, f), b))
        else:
            df.write.parquet(out_dir)
            parts = [(f, None) for f in sorted(os.listdir(out_dir))]
        adds = []
        for f, bucket in parts:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.join(sub, f)
            meta = pq.ParquetFile(os.path.join(self.path, rel)).metadata
            if meta.num_rows == 0:
                # Spark writes one file per partition including empty
                # ones — referencing them bloats manifests for nothing
                os.unlink(os.path.join(self.path, rel))
                continue
            entry: dict = {"path": rel, "rows": meta.num_rows}
            if bucket is not None:
                entry["bucket"] = bucket
            if key is not None and meta.num_rows:
                idx = {
                    meta.schema.column(i).name: i
                    for i in range(meta.num_columns)
                }.get(key)
                if idx is not None:
                    mins, maxs = [], []
                    for rg in range(meta.num_row_groups):
                        st = meta.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            mins, maxs = [], []
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                    if mins:
                        entry["min"] = _json_scalar(min(mins))
                        entry["max"] = _json_scalar(max(maxs))
            adds.append(entry)
        return adds

    # --------------------------------------------------------- commit
    def _try_publish(self, version: int, payload: dict) -> bool:
        """Put-if-absent publication of one commit file. True on win."""
        tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self._log, _V_FMT % version)
        with open(tmp, "w") as fh:
            json.dump(payload, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)  # atomic, fails iff version exists
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _commit_with_retry(self, build, max_retries: int = 10) -> int:
        """Optimistic-concurrency loop: ``build(snapshot_version)``
        returns the commit body computed AGAINST that snapshot; losing
        the publication race re-reads the log and rebuilds. Returns the
        committed version."""
        for _ in range(max_retries + 1):
            snap = self.latest_version()
            body = build(snap)
            body["version"] = snap + 1
            body["parent"] = snap
            if self._try_publish(snap + 1, body):
                return snap + 1
        raise CommitConflict(
            f"lost the commit race {max_retries + 1} times at {self.path}"
        )

    def committed_app_txn_ids(self) -> set[str]:
        """All ``app_txn_id`` markers in the log — the exactly-once
        handshake for streaming writers: a foreachBatch sink passes
        ``app_txn_id=f"{query_id}:{epoch_id}"`` and SKIPS batches whose
        id is already committed, so a micro-batch REPLAY after a
        failure cannot double-apply (the Delta idempotent-writes
        txnAppId/txnVersion pattern)."""
        return {
            e["app_txn_id"]
            for e in self._read_log()
            if e.get("app_txn_id") is not None
        }

    # ------------------------------------------------------------ DML
    def append(self, df: DataFrame, app_txn_id: str | None = None) -> int:
        """Add rows; commutes with concurrent appends (data files are
        written once, only the log retries). ``app_txn_id``: skip (and
        return the current version) if this application transaction is
        already committed — see :meth:`committed_app_txn_ids`."""
        if app_txn_id is not None and app_txn_id in self.committed_app_txn_ids():
            return self.latest_version()
        key = self.table_key()
        adds = self._write_data(df, key, self.table_buckets())
        schema = df.schema.json()
        return self._commit_with_retry(
            lambda snap: {"action": "append", "add": adds, "remove": [],
                          "key": key, "schema": schema,
                          "app_txn_id": app_txn_id}
        )

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents atomically (readers at older
        versions still see their snapshot)."""
        key = self.table_key()
        adds = self._write_data(df, key, self.table_buckets())
        schema = df.schema.json()
        return self._commit_with_retry(
            lambda snap: {
                "action": "overwrite",
                "add": adds,
                "remove": [f["path"] for f in self._live_files(snap)],
                "key": key,
                "schema": schema,
            }
        )

    def merge(
        self,
        source: DataFrame,
        key: str | None = None,
        app_txn_id: str | None = None,
    ) -> int:
        """MERGE upsert: target rows whose key matches a source row are
        replaced by the source row; unmatched source rows insert;
        everything else is untouched. File-skipping: only live files
        whose [min,max] key range intersects the source's range AND
        (for a bucketed table) whose hash bucket appears in the source
        are rewritten — range stats prune for time-clustered keys,
        buckets prune for uniform keys; together write amplification is
        bounded by the SMALLER of key clustering and batch cardinality.
        ``app_txn_id``: exactly-once skip, see :meth:`append`."""
        from pyspark.sql import functions as F

        if app_txn_id is not None and app_txn_id in self.committed_app_txn_ids():
            return self.latest_version()
        key = key or self.table_key()
        if key is None:
            raise ValueError("merge needs a key column (create(..., key=))")
        # align the source key dtype with the table's recorded type:
        # xxhash64 bucketing is TYPE-sensitive (an int32 batch key would
        # hash into the wrong bucket and the prune would MISS the
        # rewrite — a lost update, not a slow one)
        from pyspark.sql.types import StructType

        ktype = None
        for entry in self._read_log():
            if entry.get("schema"):
                st = StructType.fromJson(json.loads(entry["schema"]))
                if key in st.fieldNames():
                    ktype = st[key].dataType
        if ktype is not None and source.schema[key].dataType != ktype:
            source = source.withColumn(key, F.col(key).cast(ktype))

        def build(snap: int) -> dict:
            live = self._live_files(snap)
            schema = source.schema.json()
            row = source.agg(
                F.min(key).alias("lo"), F.max(key).alias("hi")
            ).collect()[0]
            lo, hi = row["lo"], row["hi"]
            if lo is None:  # empty source: no-op commit
                return {"action": "merge", "add": [], "remove": [],
                        "key": key, "schema": schema,
                        "app_txn_id": app_txn_id}
            n_buckets = self.table_buckets()
            src_buckets: set[int] | None = None
            if n_buckets:
                # bucket pruning for UNIFORM keys: a source key's file
                # can only live in that key's hash bucket, so files in
                # other buckets survive by reference. The distinct-
                # bucket collect is bounded by n_buckets.
                src_buckets = {
                    r["b"]
                    for r in source.select(
                        F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                }
            hit = [
                f for f in live
                if ("min" not in f or not (f["max"] < lo or f["min"] > hi))
                and (
                    src_buckets is None
                    or "bucket" not in f
                    or f["bucket"] in src_buckets
                )
            ]
            hit_paths = [f["path"] for f in hit]
            if hit_paths:
                cur = self.spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.path, p) for p in hit_paths]
                )
                # allowMissingColumns: schema evolution — a source batch
                # carrying a new column upserts with NULLs for kept rows
                out = cur.join(source, key, "left_anti").unionByName(
                    source, allowMissingColumns=True
                )
            else:
                out = source
            adds = self._write_data(out, key, n_buckets)
            return {"action": "merge", "add": adds, "remove": hit_paths,
                    "key": key, "schema": schema,
                    "app_txn_id": app_txn_id}

        return self._commit_with_retry(build)

    def compact(self, target_files: int = 1) -> int:
        """OPTIMIZE-style compaction: rewrite the current live file set
        into ``target_files`` files — same rows, one snapshot commit
        (action "compact"), so readers at older versions still see the
        small-files layout and concurrent writers conflict-detect
        normally. The small-files problem is the tax every streaming
        ingest pays (one parquet per micro-batch); compaction is how a
        log-structured table stays scan-efficient at 100 TB."""
        key = self.table_key()

        def build(snap: int) -> dict:
            live = self._live_files(snap)
            if len(live) <= target_files:
                return {"action": "compact", "add": [], "remove": [],
                        "key": key}
            cur = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, f["path"]) for f in live]
            )
            adds = self._write_data(
                cur.coalesce(target_files), key, self.table_buckets()
            )
            return {"action": "compact", "add": adds,
                    "remove": [f["path"] for f in live], "key": key,
                    "schema": cur.schema.json()}

        return self._commit_with_retry(build)

    # ----------------------------------------------------------- read
    def read(
        self,
        version: int | None = None,
        key_between: tuple | None = None,
    ) -> DataFrame:
        """Snapshot read (latest, or time travel to ``version``).

        ``key_between=(lo, hi)``: MANIFEST-level data skipping — files
        whose recorded [min,max] key range (and hash bucket, when lo ==
        hi on a bucketed table) cannot contain the range are excluded
        BEFORE Spark ever lists them, then the residual predicate is
        applied row-wise (parquet row-group pruning still applies
        inside surviving files). This is the Delta data-skipping read
        path: at 100 TB the manifest prune is the difference between
        opening thousands of files and opening three."""
        head = self.latest_version()
        if head == 0:
            raise ValueError(f"no table at {self.path}")
        if version is not None and not 1 <= version <= head:
            raise ValueError(f"version {version} not in [1, {head}]")
        files = self._live_files(version)
        key = self.table_key()
        if key_between is not None:
            if key is None:
                raise ValueError("key_between needs a key column")
            lo, hi = key_between
            files = [
                f for f in files
                if "min" not in f or not (f["max"] < lo or f["min"] > hi)
            ]
            n_buckets = self.table_buckets()
            if n_buckets and lo == hi:
                # point lookup on a bucketed table: only the key's own
                # hash bucket can hold it. xxhash64 is TYPE-sensitive
                # (int32 vs int64 literals hash differently), so the
                # literal must carry the key column's recorded type.
                from pyspark.sql import functions as F
                from pyspark.sql.types import StructType

                ktype = None
                for entry in self._read_log(version):
                    if entry.get("schema"):
                        st = StructType.fromJson(
                            json.loads(entry["schema"])
                        )
                        if key in st.fieldNames():
                            ktype = st[key].dataType
                if ktype is not None:
                    b = (
                        self.spark.range(1)
                        .select(
                            F.pmod(
                                F.xxhash64(F.lit(lo).cast(ktype)),
                                F.lit(n_buckets),
                            ).alias("b")
                        )
                        .collect()[0]["b"]
                    )
                    files = [
                        f for f in files
                        if "bucket" not in f or f["bucket"] == b
                    ]
        if not files:
            # empty snapshot (empty create, or everything removed):
            # return a typed zero-row frame from the last schema the log
            # recorded at or before this version — "a filter eliminated
            # everything" is a daily event at scale, not an error.
            from pyspark.sql.types import StructType

            schema_json = None
            for entry in self._read_log(version):
                if entry.get("schema"):
                    schema_json = entry["schema"]
            if schema_json is None:
                raise ValueError(
                    f"snapshot {version or head} is empty and no commit "
                    "recorded a schema"
                )
            out = self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
        else:
            # mergeSchema: live files may span schema evolution (a column
            # added by a later append/merge) — absent columns read as NULL
            out = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, f["path"]) for f in files]
            )
        if key_between is not None:
            from pyspark.sql import functions as F

            # residual row-wise bound: surviving files may hold rows
            # outside the range (pushed into the parquet scan)
            out = out.where(
                F.col(key).between(key_between[0], key_between[1])
            )
        return out

    def change_feed(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level CHANGE DATA FEED between snapshots (the Delta CDF
        concept): for each version v in (from_version, to_version],
        diff snapshot v against v-1 on the table key and emit one row
        per change with ``_change_type`` (``insert`` /
        ``update_postimage`` / ``delete`` — deletes carry the
        pre-image) and ``_commit_version``. Downstream incremental
        consumers process ONLY what changed instead of rescanning the
        table — the property that makes a 100-TB nightly pipeline
        incremental. This implementation reconstructs changes from
        snapshots (two scans per version, key-join); a write-time CDF
        (persisting each merge's rewrite delta alongside the commit)
        gives the same frame for free and is the production upgrade
        path."""
        from pyspark.sql import functions as F

        key = self.table_key()
        if key is None:
            raise ValueError("change_feed needs a key column")
        head = self.latest_version()
        to_version = head if to_version is None else to_version
        if not 1 <= from_version < to_version <= head:
            raise ValueError(
                f"empty or bad version range ({from_version}, "
                f"{to_version}] (head {head})"
            )
        frames = []
        for v in range(from_version + 1, to_version + 1):
            prev, cur = self.read(version=v - 1), self.read(version=v)
            cols = sorted((set(prev.columns) | set(cur.columns)) - {key})

            def norm(df, tag):
                out = df
                for c in cols:
                    if c not in df.columns:
                        out = out.withColumn(c, F.lit(None))
                return out.select(
                    F.col(key).alias(f"__{tag}_k"),
                    *[F.col(c).alias(f"__{tag}_{c}") for c in cols],
                )

            j = norm(cur, "c").join(
                norm(prev, "p"),
                F.col("__c_k").eqNullSafe(F.col("__p_k")),
                "full_outer",
            )
            changed = F.xxhash64(
                *[F.col(f"__c_{c}") for c in cols]
            ) != F.xxhash64(*[F.col(f"__p_{c}") for c in cols])
            typed = j.withColumn(
                "_change_type",
                F.when(F.col("__p_k").isNull(), F.lit("insert"))
                .when(F.col("__c_k").isNull(), F.lit("delete"))
                .when(changed, F.lit("update_postimage")),
            ).where(F.col("_change_type").isNotNull())
            # deletes carry the pre-image; inserts/updates the post-image
            pick = [
                F.coalesce(F.col("__c_k"), F.col("__p_k")).alias(key),
                *[
                    F.when(
                        F.col("_change_type") == "delete", F.col(f"__p_{c}")
                    )
                    .otherwise(F.col(f"__c_{c}"))
                    .alias(c)
                    for c in cols
                ],
                "_change_type",
                F.lit(v).cast("int").alias("_commit_version"),
            ]
            frames.append(typed.select(*pick))
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out

    # --------------------------------------------------------- vacuum
    def vacuum(
        self,
        retain_from_version: int,
        orphans: bool = False,
        orphan_grace_sec: float = 3600.0,
    ) -> list[str]:
        """Delete data files not referenced by ANY snapshot >=
        ``retain_from_version`` (nor by the latest). Time travel below
        the cutoff is forfeited — exactly Delta VACUUM's trade. Returns
        the deleted relative paths.

        ``orphans=True`` additionally removes data files referenced by
        NO log entry at all — the staged-but-never-committed leftovers
        of lost commit races — but only those older than
        ``orphan_grace_sec`` (a concurrent writer's staged files look
        identical until its commit publishes; the grace window is the
        standard uncommitted-file retention guard)."""
        import time as _time

        head = self.latest_version()
        keep: set[str] = set()
        for v in range(max(1, retain_from_version), head + 1):
            keep.update(f["path"] for f in self._live_files(v))
        dropped = []
        for entry in self._read_log():
            for add in entry.get("add", []):
                rel = add["path"]
                if rel not in keep:
                    p = os.path.join(self.path, rel)
                    if os.path.exists(p):
                        os.unlink(p)
                        dropped.append(rel)
        if orphans:
            referenced = {
                add["path"]
                for e in self._read_log()
                for add in e.get("add", [])
            }
            droot = os.path.join(self.path, _DATA_DIR)
            now = _time.time()
            for d in sorted(os.listdir(droot)):
                full = os.path.join(droot, d)
                if not os.path.isdir(full):
                    continue
                for f in sorted(os.listdir(full)):
                    rel = os.path.join(_DATA_DIR, d, f)
                    p = os.path.join(full, f)
                    if (
                        rel not in referenced
                        and os.path.isfile(p)
                        and now - os.path.getmtime(p) >= orphan_grace_sec
                    ):
                        os.unlink(p)
                        dropped.append(rel)
        # prune now-empty data dirs
        droot = os.path.join(self.path, _DATA_DIR)
        for d in os.listdir(droot):
            full = os.path.join(droot, d)
            if os.path.isdir(full) and not any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                shutil.rmtree(full, ignore_errors=True)
        return sorted(dropped)
