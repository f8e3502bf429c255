"""Continuous aggregates (SURVEY §2 R14): incrementally-maintained
rollup tier tables over the Iceberg-contract :class:`TableIO` layer.

Semantics (TimescaleDB-style continuous aggregate, re-expressed for
batch Spark):

- each tier is a materialized table ``{name}_{tier}`` partitioned by
  ``p_day``; tier 0 aggregates the source table, tier i aggregates
  tier i−1 (the retention cascade);
- a refresh diffs the upstream manifest against the snapshot recorded
  in the tier's properties (``upstream_snapshot``) — only partitions
  whose file set changed are re-aggregated, via manifest-side partition
  pruning, then swapped in with a dynamic partition overwrite;
- **exactness**: DBA barycenters are not incrementally mergeable, so an
  affected partition is recomputed from ALL of its upstream rows (the
  invalidation-window model), never merged — tier contents are always
  bit-identical to a from-scratch rollup (gated in tests);
- **resume**: the watermark property is committed only after the tier's
  data commit; a crash between the two replays that tier's overwrite,
  which is idempotent because the kernel is deterministic. A rerun
  after any crash therefore converges to the clean-run result, and
  tiers already committed are skipped as no-ops (checkpoint resume);
- per-refresh, per-tier metrics rows (input/output rows, affected
  partitions, wall ms) append to ``{name}_metrics``; per-partition row
  counts + order-insensitive checksums live in each tier's manifest
  lineage (written by TableIO).

At 10^12-sequence scale the unit of incremental work is the upstream
*partition*, so refresh cost tracks data arrival rate, not table size;
all heavy work stays in the one-shuffle ``dba_rollup`` plan.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtaidistance_spark.operators import rollup as R
from dtaidistance_spark.sources.tableio import TableIO

TIER_SLUG = {"1 minute": "1m", "1 hour": "1h", "1 day": "1d"}


def _slug(tier: str) -> str:
    return TIER_SLUG.get(tier, tier.replace(" ", ""))


def ingest(df: DataFrame, io: TableIO, mode: str = "append") -> int:
    """Write a batch of the token table into a p_day-partitioned source
    table (the entry point of the pipeline)."""
    out = df.withColumn("p_day", F.date_format("ts", "yyyy-MM-dd"))
    return io.write(out, mode=mode)


class ContinuousAggregate:
    def __init__(
        self,
        root: str,
        name: str = "rollup",
        tiers: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
        rollup_kw: dict | None = None,
    ):
        self.root = root
        self.name = name
        self.tiers = tiers
        self.rollup_kw = rollup_kw or {}
        self.tier_io = {
            t: TableIO(root, f"{name}_{_slug(t)}", partition_by=["p_day"])
            for t in tiers
        }
        self.metrics_io = TableIO(root, f"{name}_metrics")

    # ------------------------------------------------------------------
    def _changed_partitions(self, upstream: TableIO, since: int | None):
        """Invalidation scan: (changed_days, removed_days, full).

        A day is *changed* when its current (path, checksum) entry SET
        differs from the set at snapshot ``since`` — this covers
        appends, rewrites (GDPR-style row deletion via dynamic
        overwrite), AND partial entry removal within a surviving day.
        A day is *removed* when it existed at ``since`` but has no
        current entries at all (retention expiry) — the tier must drop
        it, not just skip it, or expired source days would live on in
        every downstream rollup."""
        cur_entries = upstream.entries()
        if since is None:
            return (
                sorted({e["partition"].get("p_day") for e in cur_entries}),
                [],
                True,
            )
        old_entries = [
            e
            for s in upstream.snapshots()
            if s["id"] == since
            for e in s["entries"]
        ]

        def by_day(entries):
            m: dict = {}
            for e in entries:
                m.setdefault(e["partition"].get("p_day"), set()).add(
                    (e["path"], e["checksum"])
                )
            return m

        cur_m, old_m = by_day(cur_entries), by_day(old_entries)
        changed = [d for d in cur_m if cur_m[d] != old_m.get(d, set())]
        removed = [d for d in old_m if d not in cur_m]
        return sorted(changed), sorted(removed), False

    def _tier_input(self, spark: SparkSession, tier_idx: int, days: list[str]) -> DataFrame:
        """Upstream rows for the affected days, mapped to the rollup
        input schema (source, ts, tokens, doc_id)."""
        pred = lambda p: p.get("p_day") in days  # noqa: E731
        if tier_idx == 0:
            return self.source_io.read(spark, partition_filter=pred)
        up = self.tier_io[self.tiers[tier_idx - 1]].read(spark, partition_filter=pred)
        return up.select(
            F.col("key").alias("source"),
            F.col("window_start").alias("ts"),
            F.col("barycenter").alias("tokens"),
            F.concat(F.col("key"), F.lit("@"), F.col("window_start").cast("string")).alias("doc_id"),
        )

    def refresh(
        self,
        spark: SparkSession,
        source: TableIO,
        fail_after_tier: int | None = None,
    ) -> dict:
        """Incrementally refresh every tier. Returns a per-tier report.

        ``fail_after_tier`` injects a crash after that tier's commit —
        test hook for the checkpoint-resume gate."""
        self.source_io = source
        run_id = uuid.uuid4().hex[:12]
        report: dict[str, dict] = {}
        metrics_rows = []
        upstreams = [source] + [self.tier_io[t] for t in self.tiers[:-1]]
        for i, tier in enumerate(self.tiers):
            io = self.tier_io[tier]
            up = upstreams[i]
            t0 = time.time()
            since = io.properties().get("upstream_snapshot")
            cur = up._load()["current_snapshot"]
            if cur is None:
                report[tier] = {"status": "empty-upstream"}
                continue
            if since is not None and since == cur:
                report[tier] = {"status": "noop", "upstream_snapshot": cur}
                continue
            days, removed, full = self._changed_partitions(up, since)
            days = [d for d in days if d is not None]
            removed = [d for d in removed if d is not None]
            if removed and io.exists():
                # propagate retention: drop the tier's partitions for
                # expired upstream days (a metadata-only commit; the
                # delete's snapshot is what the NEXT tier's invalidation
                # scan sees, so expiry cascades down the whole chain).
                # Idempotent under crash-replay: a re-run finds no
                # matching entries and delete_partitions no-ops.
                rm = set(removed)
                io.delete_partitions(lambda p: p.get("p_day") in rm)
            if not days:
                io.set_property("upstream_snapshot", cur)
                report[tier] = {
                    "status": "retention-only" if removed else "noop",
                    "upstream_snapshot": cur,
                    "removed_days": removed,
                }
                continue
            inp = self._tier_input(spark, i, days)
            rolled = R.dba_rollup(inp, tier=tier, **self.rollup_kw).withColumn(
                "p_day", F.date_format("window_start", "yyyy-MM-dd")
            )
            in_rows = sum(
                e["rows"] for e in up.entries() if e["partition"].get("p_day") in days
            )
            snap = io.write(rolled, mode="dynamic" if io.exists() and not full else "overwrite")
            out_rows = sum(
                e["rows"] for e in io.entries() if e["partition"].get("p_day") in days
            )
            # watermark AFTER the data commit: crash in between replays an
            # idempotent overwrite (deterministic kernel), never loses data
            io.set_property("upstream_snapshot", cur)
            wall_ms = int((time.time() - t0) * 1000)
            report[tier] = {
                "status": "refreshed",
                "days": days,
                "removed_days": removed,
                "input_rows": in_rows,
                "output_rows": out_rows,
                "snapshot": snap,
                "wall_ms": wall_ms,
            }
            metrics_rows.append(
                (run_id, tier, ",".join(days), in_rows, out_rows, wall_ms)
            )
            if fail_after_tier is not None and i == fail_after_tier:
                raise RuntimeError(f"injected failure after tier {tier}")
        if metrics_rows:
            mdf = spark.createDataFrame(
                metrics_rows,
                "run_id string, tier string, days string, input_rows long, "
                "output_rows long, wall_ms long",
            ).withColumn("committed_at", F.current_timestamp())
            self.metrics_io.write(mdf, mode="append" if self.metrics_io.exists() else "overwrite")
        return report

    def read_tier(self, spark: SparkSession, tier: str, **kw) -> DataFrame:
        return self.tier_io[tier].read(spark, **kw)
