"""Iceberg-contract table layer over partitioned Parquet.

This sandbox has no iceberg-spark-runtime jar (SURVEY.md §1.4), so the
engine ships a thin layer with the Iceberg *contract*:

- a named table = a directory of immutable Parquet data dirs plus a
  ``_manifest.json`` recording the current snapshot's file set, schema,
  partition spec, per-partition lineage (rows, order-insensitive
  xxhash64 checksum) and arbitrary properties (e.g. the continuous-
  aggregate watermark);
- commits are atomic: manifest written to a temp file then ``os.replace``
  (single-FS rename), so readers always see a consistent snapshot;
- snapshot history is retained (time travel by snapshot id);
- partition pruning happens manifest-side: ``read(partition_filter=...)``
  only hands the matching data paths to Spark.

On a real cluster with the Iceberg runtime present, ``IcebergTableIO``
(same interface, ``spark.table``/``writeTo`` calls) drops in — nothing
above this layer changes.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"

# manifest bloom-filter geometry (point-lookup file skipping): m bits,
# k md5-derived hash positions per value. Positions are stored as a
# sorted distinct-position list per entry — same information as the
# packed bitmap, JSON-friendly at this scale; a production manifest
# would pack the 4096 bits into 512 bytes.
BLOOM_M = 4096
BLOOM_K = 4


def _bloom_positions(value) -> list[int]:
    """The k bit positions of a value — md5-derived so Spark SQL and
    DuckDB re-derive them identically (portable-hash twin convention)."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}#{i}".encode()).hexdigest()[:15], 16)
        % BLOOM_M
        for i in range(BLOOM_K)
    ]


def _next_id(m: dict) -> int:
    """Allocate a monotonic snapshot id and record it in the manifest's
    ``last_id`` high-water mark (not current+1: publish/rollback can
    move `current` backwards past later ids, and an aborted staged id
    must never be REUSED — a held time-travel reference would silently
    resolve to a different snapshot)."""
    nid = max(
        max((s["id"] for s in m["snapshots"]), default=0),
        m.get("last_id", 0),
    ) + 1
    m["last_id"] = nid
    return nid


def _xor64(values) -> int:
    """Unsigned-64 XOR fold of (possibly signed) int64 checksums."""
    acc = 0
    for v in values:
        acc ^= v & 0xFFFFFFFFFFFFFFFF
    return acc


class TableIO:
    def __init__(
        self,
        root: str,
        table: str,
        partition_by: list[str] | None = None,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ):
        """``stats_cols``: columns whose per-entry min/max are recorded
        in the manifest at write time (Iceberg column-stats contract),
        enabling :meth:`read` to skip whole entries by value range
        before Spark ever lists a file. ``bloom_cols``: high-cardinality
        columns getting a per-entry bloom filter (m=4096/k=4, md5
        positions) for POINT-lookup skipping, where min/max ranges are
        useless — the Parquet/Iceberg bloom contract at the manifest
        level."""
        self.root = root
        self.table = table
        self.dir = os.path.join(root, table)
        self.partition_by = partition_by or []
        self.stats_cols = stats_cols or []
        self.bloom_cols = bloom_cols or []
        os.makedirs(self.dir, exist_ok=True)
        # an existing table's CURRENT spec wins over the constructor
        # argument (partition-spec evolution: a reader/writer opened
        # with a stale spec must not silently fork the layout)
        if os.path.exists(self._manifest_path):
            m = self._load()
            if m.get("partition_by") is not None:
                self.partition_by = m["partition_by"]

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self):
        return os.path.join(self.dir, MANIFEST)

    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {
                "table": self.table,
                "partition_by": self.partition_by,
                "current_snapshot": None,
                "snapshots": [],
                "entries": [],
                "properties": {},
            }
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict):
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self._manifest_path)  # atomic snapshot swap

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def properties(self) -> dict:
        return self._load().get("properties", {})

    def set_property(self, key: str, value):
        m = self._load()
        m.setdefault("properties", {})[key] = value
        self._commit(m)

    def snapshots(self) -> list[dict]:
        return self._load()["snapshots"]

    # -- schema evolution ----------------------------------------------------
    def schema_version(self) -> int:
        return self._load().get("schema_version", 0)

    def evolve_schema(self, columns: dict[str, tuple[str, object]]) -> int:
        """Iceberg ADD COLUMN semantics: register new columns with a
        Spark type DDL and a default, WITHOUT rewriting a single data
        file. The manifest's schema version bumps; every entry records
        the version it was written under, and the reader fills the
        default for entries older than a column. Returns the new
        schema version."""
        m = self._load()
        ver = m.get("schema_version", 0) + 1
        ev = m.setdefault("evolved_columns", {})
        for name, (dtype, default) in columns.items():
            if name in ev:
                raise ValueError(f"column {name} already evolved")
            ev[name] = {"type": dtype, "default": default, "since": ver}
        m["schema_version"] = ver
        self._commit(m)
        return ver

    def _evolved_fill(self, df: DataFrame, entry_sv: int, m: dict) -> DataFrame:
        for name, spec in m.get("evolved_columns", {}).items():
            if entry_sv < spec["since"] and name not in df.columns:
                df = df.withColumn(
                    name, F.lit(spec["default"]).cast(spec["type"])
                )
        return df

    def entries(self) -> list[dict]:
        """Current file set: [{path, partition, rows, checksum}]."""
        return self._load()["entries"]

    # -- partition-spec evolution --------------------------------------------
    def evolve_partition_spec(self, new_partition_by: list[str]) -> int:
        """Iceberg partition evolution: change the partition spec for
        FUTURE writes without touching a single existing file. Old
        entries keep their old partition layout; reads union both
        (missing partition columns surface from the data itself when
        the file carries them, else as NULL), and partition pruning
        NEVER prunes an entry that predates the current spec (it cannot
        be pruned safely). :meth:`migrate_partition_spec` is the
        optional rewrite that re-lays old entries under the new spec so
        pruning becomes fully effective. Returns the new spec version."""
        m = self._load()
        ver = m.get("spec_version", 0) + 1
        m["partition_by"] = list(new_partition_by)
        m["spec_version"] = ver
        self._commit(m)
        self.partition_by = list(new_partition_by)
        return ver

    def migrate_partition_spec(self, spark: SparkSession) -> int:
        """Rewrite every entry whose partition keys differ from the
        CURRENT spec into the current layout — one atomic 'migrate'
        commit (rows verified). Pending equality-deletes must be
        applied first (same rule as compact)."""
        m = self._load()
        dels = m.get("deletes", [])
        spec = set(m.get("partition_by", self.partition_by))
        old = [
            e
            for e in m["entries"]
            if set(e["partition"].keys()) != spec
        ]
        if not old:
            return m["current_snapshot"] or 0
        if any(self._applicable_deletes(e, dels) for e in old):
            raise ValueError(
                "pending equality-deletes apply to pre-evolution entries; "
                "run apply_deletes() before migrate_partition_spec()"
            )
        expected = sum(e["rows"] for e in old)
        df = self._read_entries(spark, old)
        snap = self.write(
            df,
            mode="append",
            _op="migrate",
            _drop_paths={e["path"] for e in old},
        )
        got = sum(
            e["rows"]
            for e in self.entries()
            if e.get("snapshot") == snap
        )
        if got != expected:
            raise RuntimeError(
                f"partition-spec migration row mismatch: {got} != {expected};"
                f" snapshot {snap - 1} still holds the pre-migration state"
            )
        return snap

    # -- write -------------------------------------------------------------
    def _lineage(self, df: DataFrame) -> list[dict]:
        """Per-partition (rows, order-insensitive checksum) lineage.

        The row hash feeds columns in SORTED NAME order so the checksum
        is independent of column position — a compaction read-back
        (partition column re-attached last) must reproduce the original
        writer's checksum bit-for-bit."""
        keys = [F.col(c).cast("string").alias(c) for c in self.partition_by]
        data_cols = sorted(df.columns)  # before any __bl_ temp columns
        stat_aggs = []
        for c in self.stats_cols:
            # native JSON types survive the manifest round-trip for
            # numerics; timestamps serialize via default=str to a
            # lexicographically ordered "YYYY-MM-DD HH:MM:SS" form
            stat_aggs.append(F.min(c).alias(f"__min_{c}"))
            stat_aggs.append(F.max(c).alias(f"__max_{c}"))
        for c in self.bloom_cols:
            # per-entry bloom: the distinct md5 bit positions of every
            # value — computed JVM-side, map-side combinable
            df = df.withColumn(
                f"__bl_{c}",
                F.array(
                    *[
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.col(c).cast("string"),
                                        F.lit(f"#{i}"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % BLOOM_M
                        for i in range(BLOOM_K)
                    ]
                ),
            )
            stat_aggs.append(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(f"__bl_{c}")))
                ).alias(f"__bloom_{c}")
            )
        agg = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(data_cols) + "))"
            ).alias("checksum"),
            *stat_aggs,
        )
        out = []
        for row in agg.collect():
            part = {c: row[c] for c in self.partition_by}
            ent = {
                "partition": part,
                "rows": row["rows"],
                "checksum": str(row["checksum"]),
            }
            if self.stats_cols:
                ent["stats"] = {
                    c: [row[f"__min_{c}"], row[f"__max_{c}"]]
                    for c in self.stats_cols
                }
            if self.bloom_cols:
                ent["bloom"] = {
                    c: [int(p) for p in row[f"__bloom_{c}"]]
                    for c in self.bloom_cols
                }
            out.append(ent)
        return out

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        schema_ddl: str | None = None,
        _op: str | None = None,
        _replace_parts: set[str] | None = None,
        _drop_paths: set[str] | None = None,
        branch: str | None = None,
        props: dict | None = None,
    ):
        """mode: overwrite | append | dynamic (overwrite only partitions
        present in ``df`` — Spark's dynamic partitionOverwriteMode,
        expressed at the manifest level). ``_op`` overrides the snapshot
        op label (used by :meth:`compact` so maintenance commits are
        distinguishable from user writes in the history). ``branch``:
        commit against the named branch's head instead of main — the
        branch ref advances, the main view is untouched. ``props``:
        table properties updated in the SAME atomic commit as the data
        (the Iceberg exactly-once sink protocol records the streaming
        epoch id this way — data and its watermark can never diverge)."""
        assert mode in ("overwrite", "append", "dynamic")
        m = self._load()
        if branch is not None:
            ref = self._resolve_ref(m, branch)
            if ref["type"] != "branch":
                raise ValueError(f"{branch!r} is a tag, not a branch")
            base_entries = self._entries_at(m, ref["snapshot"])
        else:
            base_entries = m["entries"]
        snap_id = _next_id(m)
        data_dir = os.path.join(self.dir, "data", f"s{snap_id:06d}-{uuid.uuid4().hex[:8]}")
        t0 = time.time()
        lineage = self._lineage(df)
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(data_dir)
        wall_ms = int((time.time() - t0) * 1000)

        def part_path(part: dict) -> str:
            if not part:
                return data_dir
            return os.path.join(
                data_dir, *[f"{k}={v}" for k, v in part.items()]
            )

        new_entries = [
            {
                "path": part_path(e["partition"]),
                "partition": e["partition"],
                "rows": e["rows"],
                "checksum": e["checksum"],
                "snapshot": snap_id,
                "sv": m.get("schema_version", 0),
                **({"stats": e["stats"]} if "stats" in e else {}),
                **({"bloom": e["bloom"]} if "bloom" in e else {}),
            }
            for e in lineage
        ]
        if not self.partition_by and not new_entries:
            new_entries = [
                {"path": data_dir, "partition": {}, "rows": 0, "checksum": "0", "snapshot": snap_id}
            ]
        if mode == "overwrite":
            entries = new_entries
            # a full overwrite replaces every row; no surviving entry
            # predates any delete, so pending equality-deletes can never
            # apply again — drop them (main view only: a branch
            # overwrite must not clear main's delete list)
            if branch is None:
                m["deletes"] = []
        elif mode == "append":
            base = (
                [e for e in base_entries if e["path"] not in _drop_paths]
                if _drop_paths
                else base_entries
            )
            entries = base + new_entries
        else:  # dynamic
            replaced = {json.dumps(e["partition"], sort_keys=True) for e in new_entries}
            if _replace_parts:
                replaced |= _replace_parts
            entries = [
                e
                for e in base_entries
                if json.dumps(e["partition"], sort_keys=True) not in replaced
            ] + new_entries
        if branch is None:
            m["entries"] = entries
            m["current_snapshot"] = snap_id
        else:
            m["refs"][branch]["snapshot"] = snap_id
        if props:
            m.setdefault("properties", {}).update(props)
        if schema_ddl:
            m["schema"] = schema_ddl
        m["partition_by"] = self.partition_by
        m["snapshots"].append(
            {
                "id": snap_id,
                "op": _op or mode,
                "wall_ms": wall_ms,
                "ts": time.time(),
                "added": lineage,
                "entry_count": len(entries),
                "entries": entries,
                "deletes": list(m.get("deletes", [])),
                **({"branch": branch} if branch else {}),
            }
        )
        self._commit(m)
        return snap_id

    # -- write-audit-publish -------------------------------------------------
    def write_staged(self, df: DataFrame, mode: str = "append") -> int:
        """WAP step 1 (Iceberg's ``stage-only`` commit): write the data
        files and record the would-be snapshot in the history WITHOUT
        making it current — readers keep seeing the pre-stage table.
        Returns the staged snapshot id for :meth:`audit_staged` /
        :meth:`publish_staged` / :meth:`abort_staged`."""
        m_before = self._load()
        cur_before = m_before["current_snapshot"]
        entries_before = m_before["entries"]
        staged_id = self.write(df, mode=mode, _op="stage")
        m = self._load()
        snap = m["snapshots"][-1]
        assert snap["id"] == staged_id and snap["op"] == "stage"
        snap["staged"] = True
        # restore the reader-visible state; the staged entry set lives
        # only in the snapshot record until published
        m["entries"] = entries_before
        m["current_snapshot"] = cur_before
        m["staged_head"] = staged_id
        self._commit(m)
        return staged_id

    def read_staged(self, spark: SparkSession, staged_id: int) -> DataFrame:
        """Read the table AS IF the staged snapshot were published —
        the audit view."""
        return self.read(spark, snapshot=staged_id)

    def publish_staged(self, staged_id: int) -> int:
        """WAP step 3a (``cherrypick_snapshot``): make the audited
        snapshot's entry set current. Metadata-only."""
        m = self._load()
        hist = [s for s in m["snapshots"] if s["id"] == staged_id]
        if not hist or not hist[0].get("staged"):
            raise ValueError(f"snapshot {staged_id} is not staged")
        hist[0]["staged"] = False
        hist[0]["published_as"] = staged_id
        m["entries"] = list(hist[0]["entries"])
        m["current_snapshot"] = staged_id
        m.pop("staged_head", None)
        self._commit(m)
        return staged_id

    def abort_staged(self, staged_id: int) -> None:
        """WAP step 3b: drop the staged snapshot from history (its data
        dirs become unreferenced; vacuum reclaims them)."""
        m = self._load()
        keep = [
            s
            for s in m["snapshots"]
            if not (s["id"] == staged_id and s.get("staged"))
        ]
        if len(keep) == len(m["snapshots"]):
            raise ValueError(f"snapshot {staged_id} is not staged")
        m["snapshots"] = keep
        m.pop("staged_head", None)
        self._commit(m)

    def rollback(self, snapshot: int) -> int:
        """Iceberg ``rollback_to_snapshot``: make a historic snapshot's
        entry set current again via a NEW snapshot (history is never
        rewritten — the bad snapshots stay inspectable, and rolling
        forward again is just another rollback). Metadata-only."""
        m = self._load()
        hist = [s for s in m["snapshots"] if s["id"] == snapshot]
        if not hist:
            raise ValueError(f"unknown snapshot {snapshot}")
        snap_id = _next_id(m)
        entries = list(hist[0]["entries"])
        m["entries"] = entries
        m["current_snapshot"] = snap_id
        m["snapshots"].append(
            {
                "id": snap_id,
                "op": "rollback",
                "rolled_back_to": snapshot,
                "wall_ms": 0,
                "ts": time.time(),
                "entry_count": len(entries),
                "entries": entries,
            }
        )
        self._commit(m)
        return snap_id

    def merge(
        self,
        df: DataFrame,
        key_cols: list[str],
        partition_of=None,
    ) -> int:
        """MERGE INTO (upsert): rows in ``df`` REPLACE existing rows
        with the same ``key_cols`` values and new keys are inserted —
        in ONE atomic dynamic-overwrite commit touching only the
        partitions the merge batch lands in.

        ``partition_of``: optional fn(df) -> df adding the partition
        columns when ``df`` does not already carry them (they must be
        derivable from the row, e.g. p_day from ts — the Iceberg hidden
        -partitioning contract). Scale shape: the anti-join runs ONLY
        over the touched partitions' current rows (manifest-pruned
        read), broadcast-joined against the merge batch when small —
        never a full-table scan. Assumes keys are partition-stable (a
        key always maps to the same partition values, the upsert shape
        of every time-partitioned store): a key that MOVED partitions
        would leave its old row behind, exactly as partition-pruned
        MERGE does on Iceberg."""
        spark = df.sparkSession
        if partition_of is not None:
            df = partition_of(df)
        for c in self.partition_by:
            if c not in df.columns:
                raise ValueError(f"merge batch lacks partition column {c}")
        touched = {
            tuple(r[c] for c in self.partition_by)
            for r in df.select(*self.partition_by).distinct().collect()
        }
        out = df
        if self.exists() and touched:
            try:
                cur = self.read(
                    spark,
                    partition_filter=lambda p: tuple(
                        p[c] for c in self.partition_by
                    ) in touched,
                )
            except FileNotFoundError:
                cur = None  # merge lands only in brand-new partitions
            if cur is not None:
                kept = cur.join(
                    F.broadcast(df.select(*key_cols).distinct()),
                    on=key_cols,
                    how="left_anti",
                )
                out = kept.unionByName(df)
        return self.write(out, mode="dynamic", _op="merge")

    def delete_partitions(self, predicate) -> tuple[int, int]:
        """Retention expiry: drop every partition matching ``predicate``
        (a callable over the partition-value dict) from the CURRENT
        snapshot — a pure metadata commit, like Iceberg's
        drop-partition. Data files stay on disk, so time travel to any
        pre-deletion snapshot still sees the expired rows; a separate
        vacuum (out of scope here) reclaims unreachable files.

        Returns (n_partitions_dropped, new_snapshot_id); no-op commit is
        skipped (returns current snapshot id)."""
        m = self._load()
        keep, dropped = [], []
        for e in m["entries"]:
            (dropped if predicate(e["partition"]) else keep).append(e)
        if not dropped:
            return 0, m["current_snapshot"] or 0
        snap_id = _next_id(m)
        m["entries"] = keep
        m["current_snapshot"] = snap_id
        m["snapshots"].append(
            {
                "id": snap_id,
                "op": "delete",
                "wall_ms": 0,
                "ts": time.time(),
                "removed": [
                    {"partition": e["partition"], "rows": e["rows"]}
                    for e in dropped
                ],
                "entry_count": len(keep),
                "entries": keep,
            }
        )
        self._commit(m)
        return len(dropped), snap_id

    # -- refs: branches & tags (Iceberg ref semantics) -----------------------
    def refs(self) -> dict:
        return self._load().get("refs", {})

    def _resolve_ref(self, m: dict, name: str) -> dict:
        ref = m.get("refs", {}).get(name)
        if ref is None:
            raise ValueError(f"unknown ref {name!r}")
        return ref

    def create_branch(self, name: str, from_snapshot: int | None = None) -> int:
        """Create a named branch pointing at ``from_snapshot`` (default:
        current). Writes with ``branch=name`` advance ONLY the branch
        head; ``main`` (the default read view) never sees them until
        :meth:`fast_forward`. The Iceberg audit-branch workflow."""
        return self._create_ref(name, "branch", from_snapshot)

    def create_tag(self, name: str, snapshot: int | None = None) -> int:
        """Create an immutable named tag (a retained, human-named
        snapshot — 'v1', 'training-run-2026-01'). Tags cannot be
        written to or moved, only dropped."""
        return self._create_ref(name, "tag", snapshot)

    def _create_ref(self, name, rtype, snapshot):
        m = self._load()
        if name in m.get("refs", {}):
            raise ValueError(f"ref {name!r} already exists")
        snap = snapshot if snapshot is not None else m["current_snapshot"]
        if not any(s["id"] == snap for s in m["snapshots"]):
            raise ValueError(f"unknown snapshot {snap}")
        m.setdefault("refs", {})[name] = {"type": rtype, "snapshot": snap}
        self._commit(m)
        return snap

    def drop_ref(self, name: str) -> None:
        m = self._load()
        self._resolve_ref(m, name)
        del m["refs"][name]
        self._commit(m)

    def fast_forward(self, branch: str) -> int:
        """Make the main view adopt the branch head (Iceberg
        ``fast_forward('main', branch)``): current entries/snapshot
        become the branch's — metadata-only. The branch ref remains and
        can keep advancing."""
        m = self._load()
        ref = self._resolve_ref(m, branch)
        if ref["type"] != "branch":
            raise ValueError(f"{branch!r} is a tag, not a branch")
        head = ref["snapshot"]
        hist = [s for s in m["snapshots"] if s["id"] == head]
        m["entries"] = list(hist[0]["entries"])
        m["current_snapshot"] = head
        self._commit(m)
        return head

    # -- row-level deletes (Iceberg v2 equality deletes, merge-on-read) ------
    def delete_rows(self, keys_df: DataFrame, key_cols: list[str]) -> int:
        """Iceberg v2 equality-delete: record the key set as a delete
        file — ZERO data files touched (merge-on-read). The delete
        applies to every entry whose snapshot is <= the delete's
        snapshot (Iceberg sequence-number semantics), so a key
        re-inserted by a LATER append is visible again — delete files
        never shadow newer data. Readers anti-join the (small,
        broadcast) key sets at scan time; :meth:`apply_deletes` is the
        copy-on-write maintenance job that folds them into the data
        files when the MoR overhead accumulates. Contract with
        continuous aggregates: the invalidation scan diffs (path,
        checksum) ENTRY sets, which an MoR delete leaves untouched —
        downstream tiers refresh the deletion only after
        ``apply_deletes`` rewrites the files (gated in
        tests/test_continuous.py). Returns the delete snapshot id."""
        m = self._load()
        snap_id = _next_id(m)
        ddir = os.path.join(
            self.dir, "deletes", f"d{snap_id:06d}-{uuid.uuid4().hex[:8]}"
        )
        kdf = keys_df.select(*key_cols).distinct()
        n = kdf.count()
        kdf.write.mode("overwrite").parquet(ddir)
        dels = m.setdefault("deletes", [])
        dels.append(
            {"path": ddir, "key_cols": key_cols, "snapshot": snap_id, "rows": n}
        )
        m["current_snapshot"] = snap_id
        m["snapshots"].append(
            {
                "id": snap_id,
                "op": "rowdelete",
                "wall_ms": 0,
                "ts": time.time(),
                "entry_count": len(m["entries"]),
                "entries": m["entries"],
                "deletes": list(dels),
            }
        )
        self._commit(m)
        return snap_id

    def _deletes_at(self, m: dict, snapshot: int | None) -> list[dict]:
        """Delete files active at a snapshot (records written before the
        feature carry none)."""
        if snapshot is None:
            return m.get("deletes", [])
        hist = [s for s in m["snapshots"] if s["id"] == snapshot]
        if not hist:
            raise ValueError(f"unknown snapshot {snapshot}")
        return hist[0].get("deletes", [])

    @staticmethod
    def _applicable_deletes(entry: dict, deletes: list[dict]) -> tuple:
        return tuple(
            d["path"]
            for d in deletes
            if entry.get("snapshot", 0) <= d["snapshot"]
        )

    def apply_deletes(self, spark: SparkSession) -> int:
        """Copy-on-write fold of the pending equality-deletes: every
        entry an active delete applies to is read back (deletes
        applied), rewritten, and swapped in; untouched entries keep
        their files; the delete list clears — ONE atomic
        'apply-deletes' commit. Pre-apply snapshots still time-travel
        with their recorded delete sets. Returns the new snapshot id
        (current id when there was nothing to apply)."""
        m = self._load()
        dels = m.get("deletes", [])
        affected = [
            e for e in m["entries"] if self._applicable_deletes(e, dels)
        ]
        if not dels or not affected:
            return m["current_snapshot"] or 0
        # rewrite at PARTITION granularity: a partition mixing affected
        # and unaffected entries must carry its unaffected rows through
        # the dynamic overwrite
        parts = {
            json.dumps(e["partition"], sort_keys=True) for e in affected
        }
        rewrite = [
            e
            for e in m["entries"]
            if json.dumps(e["partition"], sort_keys=True) in parts
        ]
        df = self._read_entries(spark, rewrite, deletes=dels)
        # clear the delete list first so the write() commit records the
        # post-apply state; _replace_parts forces even fully-emptied
        # partitions (every row deleted) to drop their old entries
        m["deletes"] = []
        self._commit(m)
        return self.write(
            df, mode="dynamic", _op="apply-deletes", _replace_parts=parts
        )

    # -- read ---------------------------------------------------------------
    @staticmethod
    def _stats_keep(entry: dict, stats_filter: dict) -> bool:
        """True iff the entry's recorded [min, max] ranges can contain a
        row matching every requested inclusive (lo, hi) range. Entries
        without stats for a requested column are kept (cannot prune
        safely); None bounds are open."""
        st = entry.get("stats", {})
        for col, (lo, hi) in stats_filter.items():
            if col not in st:
                continue
            mn, mx = st[col]
            if mn is None or mx is None:
                continue
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
        return True

    @staticmethod
    def _bloom_keep(entry: dict, point_filter: dict) -> bool:
        """True unless some requested point value is PROVABLY absent —
        all k of its bit positions must be present in the entry's
        recorded position set to keep (no false negatives by
        construction; false positives only cost a read). Entries
        without a bloom for a requested column are kept."""
        bl = entry.get("bloom", {})
        for col, val in point_filter.items():
            if col not in bl:
                continue
            present = set(bl[col])
            if not all(p in present for p in _bloom_positions(val)):
                return False
        return True

    def scan_entries(
        self,
        partition_filter=None,
        stats_filter: dict | None = None,
        snapshot: int | None = None,
        point_filter: dict | None = None,
    ) -> tuple[list[dict], list[dict]]:
        """Manifest-side scan planning: returns ``(selected, skipped)``
        entry lists after partition pruning, column-stats (min/max)
        file skipping, and bloom point-lookup skipping — the Iceberg
        metadata read path. ``stats_filter`` maps column -> inclusive
        ``(lo, hi)`` (None = open bound); an entry is skipped when its
        recorded range provably cannot intersect. ``point_filter`` maps
        column -> exact value; an entry is skipped when its bloom
        provably excludes the value. Spark never lists a skipped
        file."""
        m = self._load()
        entries = self._entries_at(m, snapshot)
        if partition_filter is not None:
            # spec-evolution safety: an entry written under an older
            # partition spec (keys differ from the current spec) cannot
            # be pruned by a partition predicate — always kept
            spec = set(m.get("partition_by", self.partition_by))
            entries = [
                e
                for e in entries
                if set(e["partition"].keys()) != spec
                or partition_filter(e["partition"])
            ]
        if not stats_filter and not point_filter:
            return entries, []
        selected, skipped = [], []
        for e in entries:
            keep = (
                not stats_filter or self._stats_keep(e, stats_filter)
            ) and (not point_filter or self._bloom_keep(e, point_filter))
            (selected if keep else skipped).append(e)
        return selected, skipped

    def read(
        self,
        spark: SparkSession,
        partition_filter=None,
        snapshot: int | None = None,
        stats_filter: dict | None = None,
        ref: str | None = None,
        point_filter: dict | None = None,
    ) -> DataFrame:
        """Read the current (or a historic) snapshot, or a named
        branch/tag head via ``ref``. ``point_filter`` (column -> exact
        value) applies manifest-side bloom skipping for point lookups
        — like stats pruning it is an optimization only, the caller
        still filters rows. ``partition_filter``
        is a predicate over the partition-value dict and ``stats_filter``
        a column -> (lo, hi) range map, both applied manifest-side —
        Iceberg-style partition pruning + column-stats file skipping
        before Spark ever lists a file. Stats pruning is an optimization
        only: the caller still applies its own row-level predicate (the
        kept entries may contain non-matching rows)."""
        if ref is not None:
            if snapshot is not None:
                raise ValueError("pass either ref or snapshot, not both")
            snapshot = self._resolve_ref(self._load(), ref)["snapshot"]
        entries, _ = self.scan_entries(
            partition_filter, stats_filter, snapshot, point_filter
        )
        entries = [e for e in entries if os.path.exists(e["path"])]
        if not entries:
            raise FileNotFoundError(f"table {self.table}: no data for predicate")
        dels = self._deletes_at(self._load(), snapshot)
        return self._read_entries(spark, entries, deletes=dels)

    def _read_entries(
        self,
        spark: SparkSession,
        entries: list[dict],
        deletes: list[dict] | None = None,
    ) -> DataFrame:
        m = self._load()
        deletes = deletes or []
        if (
            not deletes
            and not self.partition_by
            and not m.get("evolved_columns")
        ):
            return spark.read.parquet(*[e["path"] for e in entries])
        # partitionBy-written files drop the partition columns; re-attach
        # them from the manifest (partition values are strings by contract).
        # Entries written before a schema evolution get the evolved
        # columns filled with their defaults (no file rewrite — the
        # Iceberg ADD COLUMN read path). Equality-deletes apply per
        # entry-group by Iceberg sequence rule (entry snapshot <= delete
        # snapshot): entries sharing an applicable-delete signature read
        # together, then anti-join each (small, broadcast) key set.
        groups: dict[tuple, list[dict]] = {}
        for e in entries:
            groups.setdefault(self._applicable_deletes(e, deletes), []).append(e)
        # partition-spec evolution: entries written under different
        # specs carry different partition keys — attach each entry's
        # own, and fill any other entry's keys as NULL unless the data
        # file already carries the column (pre-partitioning writes do)
        all_keys: list[str] = []
        for e in entries:
            for k in e["partition"]:
                if k not in all_keys:
                    all_keys.append(k)
        out = None
        for sig in sorted(groups):
            g = None
            for e in groups[sig]:
                d = spark.read.parquet(e["path"])
                for k, v in e["partition"].items():
                    d = d.withColumn(k, F.lit(v))
                for k in all_keys:
                    if k not in e["partition"] and k not in d.columns:
                        d = d.withColumn(k, F.lit(None).cast("string"))
                d = self._evolved_fill(d, e.get("sv", 0), m)
                g = d if g is None else g.unionByName(d)
            for dpath in sig:
                dd = next(x for x in deletes if x["path"] == dpath)
                kdf = spark.read.parquet(dd["path"])
                g = g.join(F.broadcast(kdf), on=dd["key_cols"], how="left_anti")
            out = g if out is None else out.unionByName(g)
        return out

    def _entries_at(self, m: dict, snapshot: int | None) -> list[dict]:
        if snapshot is None:
            return m["entries"]
        hist = [s for s in m["snapshots"] if s["id"] == snapshot]
        if not hist:
            raise ValueError(f"unknown snapshot {snapshot}")
        return hist[0]["entries"]

    def read_incremental(
        self,
        spark: SparkSession,
        since: int,
        until: int | None = None,
    ) -> DataFrame:
        """Incremental (CDC append) scan: rows in entries that exist at
        ``until`` (default: current) but not at snapshot ``since`` —
        Iceberg's incremental read between snapshot ids. This is what a
        downstream consumer polls instead of re-scanning 100 TB: a pure
        manifest diff hands Spark only the new files. Entries are
        identified by (path, checksum), so a rewritten partition
        (dynamic overwrite / compaction) surfaces its NEW files; a pure
        compaction emits rewritten-but-identical rows — consumers that
        must ignore rewrites should filter snapshots by op first
        (:meth:`snapshots`). Returns an empty DataFrame (correct schema)
        when nothing changed."""
        m = self._load()
        old = {
            (e["path"], e["checksum"]) for e in self._entries_at(m, since)
        }
        cur = self._entries_at(m, until)
        added = [e for e in cur if (e["path"], e["checksum"]) not in old]
        if not added:
            if not cur:
                raise FileNotFoundError(f"table {self.table}: empty")
            return self._read_entries(spark, cur[:1]).limit(0)
        return self._read_entries(spark, added)

    def compact(
        self,
        spark: SparkSession,
        min_entries: int = 2,
        partition_filter=None,
    ) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files`` bin-pack
        semantics): every partition holding >= ``min_entries`` manifest
        entries (accumulated by appends / dynamic overwrites) is read
        back and rewritten as ONE entry in a single atomic commit;
        partitions below the threshold are untouched. Content
        preservation is *verified*, not assumed: per partition, the new
        entry's row count and order-insensitive checksum (bit_xor of
        row xxhash64 — XOR is associative, so the pre-compaction value
        is the XOR of the old entries' checksums) must match, else
        RuntimeError — the pre-compaction snapshot remains time-travel
        readable either way. At 100 TB this is the maintenance job that
        keeps read amplification bounded after many small streaming
        commits."""
        m = self._load()
        dels = m.get("deletes", [])
        if any(self._applicable_deletes(e, dels) for e in m["entries"]):
            # bin-pack verifies content preservation by row count +
            # checksum; folding equality-deletes would change both —
            # that is apply_deletes' job, run it first
            raise ValueError(
                "pending equality-deletes apply to current entries; "
                "run apply_deletes() before compact()"
            )
        by_part: dict[str, list[dict]] = {}
        for e in m["entries"]:
            by_part.setdefault(
                json.dumps(e["partition"], sort_keys=True), []
            ).append(e)
        targets = {
            k: es
            for k, es in by_part.items()
            if len(es) >= min_entries
            and (partition_filter is None or partition_filter(es[0]["partition"]))
        }
        if not targets:
            return {
                "compacted_partitions": 0,
                "entries_before": len(m["entries"]),
                "entries_after": len(m["entries"]),
                "snapshot": m["current_snapshot"],
            }
        cur_sv = m.get("schema_version", 0)
        expected = {
            k: (
                sum(e["rows"] for e in es),
                # a checksum written under an older schema version covers
                # fewer columns than the rewrite will hash — compare
                # checksums only when every source entry is current
                # (rows are always compared)
                _xor64(int(e["checksum"]) for e in es)
                if all(e.get("sv", 0) == cur_sv for e in es)
                else None,
            )
            for k, es in targets.items()
        }
        df = self._read_entries(
            spark, [e for es in targets.values() for e in es]
        )
        snap = self.write(df, mode="dynamic", _op="compact")
        new_by_part = {
            json.dumps(e["partition"], sort_keys=True): e for e in self.entries()
        }
        for k, (rows, chk) in expected.items():
            got = new_by_part[k]
            if got["rows"] != rows or (
                chk is not None and _xor64([int(got["checksum"])]) != chk
            ):
                raise RuntimeError(
                    f"compaction verification failed for partition {k}: "
                    f"expected ({rows}, {chk}), got "
                    f"({got['rows']}, {got['checksum']}); snapshot "
                    f"{snap - 1} still holds the pre-compaction state"
                )
        return {
            "compacted_partitions": len(targets),
            "entries_before": len(m["entries"]),
            "entries_after": len(self.entries()),
            "snapshot": snap,
            "verified": True,
        }

    def snapshot_ids(self, spark: SparkSession | None = None) -> list:
        """Snapshot ids, oldest first — the backend-agnostic face of
        :meth:`snapshots` (IcebergTableIO exposes the same method, so
        the contract test drives either backend identically; the
        unused ``spark`` keeps the signatures aligned)."""
        return [s["id"] for s in self.snapshots()]

    def total_rows(self) -> int:
        return sum(e["rows"] for e in self.entries())

    # -- metadata tables (Iceberg `table.files` / `.history` / `.refs`) -----
    def files_df(self, spark: SparkSession) -> DataFrame:
        """The current entry set as a queryable DataFrame (Iceberg's
        ``SELECT * FROM tbl.files``): one row per data entry with
        partition values (JSON), row count, checksum, and the writing
        snapshot — scan planning becomes plain SQL over metadata, no
        data file touched."""
        rows = [
            (
                e["path"],
                json.dumps(e["partition"], sort_keys=True),
                int(e["rows"]),
                str(e["checksum"]),
                int(e.get("snapshot", 0)),
                int(e.get("sv", 0)),
            )
            for e in self.entries()
        ]
        return spark.createDataFrame(
            rows,
            "path string, partition string, rows long, checksum string, "
            "snapshot long, sv long",
        )

    def history_df(self, spark: SparkSession) -> DataFrame:
        """Snapshot history as a DataFrame (Iceberg's ``.history`` /
        ``.snapshots``): id, op, entry count, total rows, and whether
        the snapshot is the current one."""
        m = self._load()
        cur = m["current_snapshot"]
        rows = [
            (
                int(s["id"]),
                str(s["op"]),
                int(s.get("entry_count", len(s.get("entries", [])))),
                int(sum(e["rows"] for e in s.get("entries", []))),
                s["id"] == cur,
                bool(s.get("staged", False)),
            )
            for s in m["snapshots"]
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, op string, entry_count long, total_rows long, "
            "is_current boolean, staged boolean",
        )

    def refs_df(self, spark: SparkSession) -> DataFrame:
        """Named refs as a DataFrame (Iceberg's ``.refs``)."""
        rows = [
            (name, r["type"], int(r["snapshot"]))
            for name, r in sorted(self.refs().items())
        ]
        return spark.createDataFrame(
            rows if rows else [],
            "name string, type string, snapshot long",
        )

    def vacuum(self, keep_snapshots: int = 1) -> dict:
        """Physically reclaim storage: keep the data dirs referenced by
        the CURRENT entries plus the last ``keep_snapshots`` snapshots'
        entry sets; delete every other data dir under ``data/`` and trim
        older snapshots from the history (they become un-travel-able —
        the Iceberg ``expire_snapshots`` semantic). Snapshots pointed to
        by a NAMED REF (branch or tag) are ALWAYS retained with their
        data — the Iceberg rule: expiry never invalidates a ref — as
        are unresolved staged (WAP) snapshots.

        Separate from :meth:`delete_partitions` by design: retention is
        a cheap metadata commit on the hot path; vacuum is the rare,
        heavier storage-reclaim maintenance job."""
        import shutil

        m = self._load()
        protected = {r["snapshot"] for r in m.get("refs", {}).values()}
        # the CURRENT snapshot's history record must survive even when
        # staged (WAP) records sit after it in the list and fill the
        # keep_snapshots tail
        if m.get("current_snapshot") is not None:
            protected.add(m["current_snapshot"])
        tail = m["snapshots"][-max(1, keep_snapshots):]
        tail_ids = {s["id"] for s in tail}
        kept_snaps = [
            s
            for s in m["snapshots"]
            if s["id"] in tail_ids
            or s["id"] in protected
            or s.get("staged")
        ]
        keep_paths = {e["path"] for e in m["entries"]}
        for s in kept_snaps:
            keep_paths |= {e["path"] for e in s["entries"]}
        # data dirs are dir/data/s{NNNNNN}-{hex}; entry paths may point at
        # partition subdirs — keep a data dir if ANY kept path is under it
        data_root = os.path.join(self.dir, "data")
        removed = []
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if not any(p == full or p.startswith(full + os.sep) for p in keep_paths):
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(d)
        m["snapshots"] = kept_snaps
        self._commit(m)
        return {"removed_dirs": removed, "kept_snapshots": [s["id"] for s in kept_snaps]}

    def remove_orphan_files(self, grace_seconds: float = 0.0) -> dict:
        """Iceberg ``remove_orphan_files``: delete directories under
        ``data/`` and ``deletes/`` that no retained snapshot references
        — the debris of writers that crashed AFTER materializing their
        parquet but BEFORE the manifest commit (write() is
        write-files-then-swap, so such dirs are invisible but consume
        storage), and delete-key files whose every referencing snapshot
        has been vacuumed away. ``grace_seconds`` skips young dirs (an
        in-flight writer's files look orphaned until its commit lands —
        the same race Iceberg's default 3-day grace guards against).
        Never touches anything referenced by ANY snapshot in history,
        current entries, or active delete files."""
        import shutil

        m = self._load()
        referenced = {e["path"] for e in m["entries"]}
        for s in m["snapshots"]:
            referenced |= {e["path"] for e in s.get("entries", [])}
            referenced |= {d["path"] for d in s.get("deletes", [])}
        referenced |= {d["path"] for d in m.get("deletes", [])}
        now = time.time()
        removed, kept_young = [], []
        for sub in ("data", "deletes"):
            root = os.path.join(self.dir, sub)
            if not os.path.isdir(root):
                continue
            for d in sorted(os.listdir(root)):
                full = os.path.join(root, d)
                if any(
                    p == full or p.startswith(full + os.sep)
                    for p in referenced
                ):
                    continue
                if now - os.path.getmtime(full) < grace_seconds:
                    kept_young.append(full)
                    continue
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        return {"removed": removed, "kept_young": kept_young}


# ---------------------------------------------------------------------------
# Real-Iceberg backend (drops in when iceberg-spark-runtime is present)
# ---------------------------------------------------------------------------


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergTableIO:
    """Same interface as :class:`TableIO` over a REAL Iceberg catalog —
    the production backend this sandbox cannot run (no
    iceberg-spark-runtime jar, no network; SURVEY.md §1.4).

    Maps contract -> Iceberg natively: atomic snapshot commit is
    Iceberg's own metadata swap; ``mode='dynamic'`` uses
    ``overwritePartitions()`` (dynamic partition overwrite); time travel
    via ``snapshot-id``; partition pruning is Iceberg metadata-side.
    Requires a configured catalog, e.g.::

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hadoop|hive|rest
    """

    def __init__(
        self, catalog: str, namespace: str, table: str,
        partition_by: list[str] | None = None,
    ):
        self.identifier = f"{catalog}.{namespace}.{table}"
        self.partition_by = partition_by or []

    def _require(self, spark: SparkSession) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime is not on the classpath; use "
                "TableIO (the Iceberg-contract parquet layer) here, or "
                "add the runtime jar + a spark.sql.catalog.<name> config "
                "on the cluster."
            )

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        assert mode in ("overwrite", "append", "dynamic")
        self._require(df.sparkSession)
        w = df.writeTo(self.identifier)
        if mode == "overwrite":
            w = w.using("iceberg")
            if self.partition_by:
                w = w.partitionedBy(*[F.col(c) for c in self.partition_by])
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:
            w.overwritePartitions()

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        self._require(spark)
        if snapshot is not None:
            return (
                spark.read.format("iceberg")
                .option("snapshot-id", snapshot)
                .load(self.identifier)
            )
        return spark.table(self.identifier)

    def snapshots(self, spark: SparkSession) -> DataFrame:
        """Snapshot history (the `.snapshots` metadata table)."""
        self._require(spark)
        return spark.sql(f"SELECT * FROM {self.identifier}.snapshots")

    def snapshot_ids(self, spark: SparkSession) -> list:
        """Snapshot ids, oldest first — the backend-agnostic face of
        :meth:`snapshots` (mirrors ``TableIO.snapshot_ids``)."""
        rows = (
            self.snapshots(spark)
            .orderBy("committed_at")
            .select("snapshot_id")
            .collect()
        )
        return [r.snapshot_id for r in rows]

    def exists(self, spark: SparkSession) -> bool:
        self._require(spark)
        return spark.catalog.tableExists(self.identifier)


def open_table(
    spark: SparkSession,
    root: str,
    table: str,
    partition_by: list[str] | None = None,
    backend: str = "auto",
    catalog: str | None = None,
    namespace: str = "default",
    **tableio_kwargs,
):
    """The SURVEY §1.4 backend switch: one constructor for the engine's
    table layer that delegates to a REAL Iceberg catalog when one is
    configured and the runtime jar is present, and to :class:`TableIO`
    (the Iceberg-contract parquet + manifest layer) otherwise — nothing
    above this call changes between the sandbox and a production
    cluster.

    ``backend='auto'`` activates Iceberg iff ALL of: a catalog name is
    given (argument, or the ``spark.dtaidistance.catalog`` conf), that
    catalog has a ``spark.sql.catalog.<name>`` implementation
    configured, and ``iceberg_available(spark)`` (the runtime jar is on
    the classpath).  ``backend='iceberg'`` forces the real catalog and
    fails fast with guidance when the jar is absent;
    ``backend='parquet'`` forces the contract layer.
    """
    assert backend in ("auto", "iceberg", "parquet")
    if backend == "auto":
        cat = catalog
        if cat is None:
            try:
                cat = spark.conf.get("spark.dtaidistance.catalog", None)
            except Exception:
                cat = None
        impl = None
        if cat is not None:
            try:
                impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
            except Exception:
                impl = None
        if cat and impl and iceberg_available(spark):
            backend, catalog = "iceberg", cat
        else:
            backend = "parquet"
    if backend == "iceberg":
        if catalog is None:
            raise ValueError("backend='iceberg' requires a catalog name")
        io = IcebergTableIO(
            catalog, namespace, table, partition_by=partition_by
        )
        io._require(spark)  # fail fast with guidance when jar absent
        return io
    return TableIO(
        root, table, partition_by=partition_by, **tableio_kwargs
    )
