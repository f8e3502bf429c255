"""Continuous-aggregate gates (SURVEY §5.2 gates 4+5): incremental
refresh == from-scratch rollup exactly; crash-injected runs resume to
the identical result; lineage + metrics recorded."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.plans.continuous import ContinuousAggregate, ingest
from dtaidistance_spark.sources.tableio import TableIO

TIERS = ("1 minute", "1 hour", "1 day")


def _batch(spark, ids, day):
    """Synthetic token rows pinned to a given day (controlled p_day)."""
    pdf = synth.gen_pdf(ids)
    pdf["ts"] = pd.Timestamp(f"2026-01-0{day}") + pd.to_timedelta(
        [int(i) % 86400 for i in ids], unit="s"
    )
    return spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source", "ts"]])


def _tier_rows(spark, ca, tier):
    df = ca.read_tier(spark, tier)
    rows = df.select(
        "key", "window_start", "n_series", "n_points", "barycenter"
    ).collect()
    return sorted(
        (r.key, str(r.window_start), r.n_series, r.n_points,
         tuple(np.round(r.barycenter, 9)))
        for r in rows
    )


@pytest.fixture()
def batches(spark):
    b1 = _batch(spark, range(0, 120), day=1).union(_batch(spark, range(200, 260), day=2))
    b2 = _batch(spark, range(300, 360), day=2).union(_batch(spark, range(400, 450), day=3))
    return b1, b2


def _run_clean(spark, root, b1, b2):
    """From-scratch oracle: everything ingested, one full refresh."""
    src = TableIO(str(root), "tokens", partition_by=["p_day"])
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    ca = ContinuousAggregate(str(root), tiers=TIERS)
    ca.refresh(spark, src)
    return ca


def test_incremental_matches_full(spark, tmp_path, batches):
    b1, b2 = batches
    # incremental: refresh after each ingest
    src = TableIO(str(tmp_path / "inc"), "tokens", partition_by=["p_day"])
    ca = ContinuousAggregate(str(tmp_path / "inc"), tiers=TIERS)
    ingest(b1, src, mode="overwrite")
    r1 = ca.refresh(spark, src)
    assert all(v["status"] == "refreshed" for v in r1.values())
    ingest(b2, src, mode="append")
    r2 = ca.refresh(spark, src)
    # batch2 touched days 2 and 3 only — day 1 must NOT be recomputed
    assert sorted(r2["1 minute"]["days"]) == ["2026-01-02", "2026-01-03"]

    full = _run_clean(spark, tmp_path / "full", b1, b2)
    for tier in TIERS:
        assert _tier_rows(spark, ca, tier) == _tier_rows(spark, full, tier), tier


def test_refresh_is_noop_when_no_new_data(spark, tmp_path, batches):
    b1, _ = batches
    src = TableIO(str(tmp_path), "tokens", partition_by=["p_day"])
    ca = ContinuousAggregate(str(tmp_path), tiers=TIERS)
    ingest(b1, src, mode="overwrite")
    ca.refresh(spark, src)
    again = ca.refresh(spark, src)
    assert all(v["status"] == "noop" for v in again.values())


def test_crash_resume_converges(spark, tmp_path, batches):
    b1, b2 = batches
    src = TableIO(str(tmp_path / "r"), "tokens", partition_by=["p_day"])
    ca = ContinuousAggregate(str(tmp_path / "r"), tiers=TIERS)
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    with pytest.raises(RuntimeError, match="injected failure"):
        ca.refresh(spark, src, fail_after_tier=0)
    # resume: tier 0 already committed -> noop; downstream tiers complete
    resumed = ContinuousAggregate(str(tmp_path / "r"), tiers=TIERS)
    rep = resumed.refresh(spark, src)
    assert rep["1 minute"]["status"] == "noop"
    assert rep["1 hour"]["status"] == "refreshed"
    assert rep["1 day"]["status"] == "refreshed"

    full = _run_clean(spark, tmp_path / "full2", b1, b2)
    for tier in TIERS:
        assert _tier_rows(spark, resumed, tier) == _tier_rows(spark, full, tier), tier


def test_lineage_and_metrics_recorded(spark, tmp_path, batches):
    b1, _ = batches
    src = TableIO(str(tmp_path), "tokens", partition_by=["p_day"])
    ca = ContinuousAggregate(str(tmp_path), tiers=TIERS)
    ingest(b1, src, mode="overwrite")
    ca.refresh(spark, src)
    for tier in TIERS:
        entries = ca.tier_io[tier].entries()
        assert entries and all(
            e["rows"] > 0 and e["checksum"] not in (None, "") for e in entries
        )
    m = ca.metrics_io.read(spark).toPandas()
    assert set(m["tier"]) == set(TIERS)
    assert (m["input_rows"] > 0).all() and (m["output_rows"] > 0).all()


def test_retention_expiry(spark, tmp_path, batches):
    """Tiered retention: fine tier drops aged-out p_day partitions
    (metadata-only atomic commit), coarse tier keeps the history, time
    travel still sees pre-expiry data, and a later refresh does NOT
    resurrect dropped partitions."""
    from dtaidistance_spark.plans.retention import apply_retention

    b1, b2 = batches
    root = tmp_path / "ret"
    src = TableIO(str(root), "tokens", partition_by=["p_day"])
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    ca = ContinuousAggregate(str(root), tiers=TIERS)
    ca.refresh(spark, src)

    io_1m = ca.tier_io["1 minute"]
    pre_days = sorted({e["partition"]["p_day"] for e in io_1m.entries()})
    assert pre_days == ["2026-01-01", "2026-01-02", "2026-01-03"]
    pre_snap = io_1m._load()["current_snapshot"]
    pre_rows = io_1m.read(spark).count()

    # keep 2 days on the 1-minute tier (now = Jan 4), 1-day keeps all
    report = apply_retention(
        ca, {"1 minute": "2 days", "1 day": None}, now="2026-01-04"
    )
    assert report["1 minute"]["dropped"] == 1  # Jan 1 expired
    assert report["1 day"]["dropped"] == 0

    kept_days = sorted({e["partition"]["p_day"] for e in io_1m.entries()})
    assert kept_days == ["2026-01-02", "2026-01-03"]
    assert (
        io_1m.read(spark)
        .where("window_start < '2026-01-02'")
        .count()
        == 0
    )
    # coarse tier still holds the expired day's rollup
    assert (
        ca.tier_io["1 day"].read(spark)
        .where("window_start < '2026-01-02'")
        .count()
        > 0
    )
    # time travel to the pre-expiry snapshot sees everything
    assert io_1m.read(spark, snapshot=pre_snap).count() == pre_rows
    # delete lineage recorded in the manifest
    last = io_1m.snapshots()[-1]
    assert last["op"] == "delete" and last["removed"][0]["rows"] > 0

    # refresh again with no new data: dropped partitions stay dropped
    ca2 = ContinuousAggregate(str(root), tiers=TIERS)
    ca2.refresh(spark, src)
    assert sorted(
        {e["partition"]["p_day"] for e in ca2.tier_io["1 minute"].entries()}
    ) == ["2026-01-02", "2026-01-03"]

    # idempotent: re-applying the same policy is a no-op commit
    r2 = apply_retention(ca, {"1 minute": "2 days"}, now="2026-01-04")
    assert r2["1 minute"]["dropped"] == 0


def test_vacuum_reclaims_expired_storage(spark, tmp_path, batches):
    """vacuum physically removes data dirs unreachable from the kept
    snapshots; current reads are unaffected; expired snapshots are no
    longer travel-able."""
    import os

    from dtaidistance_spark.plans.retention import apply_retention

    b1, b2 = batches
    root = tmp_path / "vac"
    src = TableIO(str(root), "tokens", partition_by=["p_day"])
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    ca = ContinuousAggregate(str(root), tiers=("1 day",))
    ca.refresh(spark, src)
    ca.refresh(spark, src)  # no-op refresh, extra snapshot history
    io = ca.tier_io["1 day"]
    apply_retention(ca, {"1 day": "2 days"}, now="2026-01-04")
    rows_now = io.read(spark).count()
    pre_snap = io._load()["current_snapshot"]

    data_root = os.path.join(io.dir, "data")
    n_dirs_before = len(os.listdir(data_root))
    rep = io.vacuum(keep_snapshots=1)
    assert len(os.listdir(data_root)) == n_dirs_before - len(rep["removed_dirs"])
    # current read identical after vacuum
    assert io.read(spark).count() == rows_now
    assert io._load()["current_snapshot"] == pre_snap
    # expired snapshots are gone from history
    import pytest

    old_ids = [s for s in range(1, pre_snap)]
    if old_ids:
        with pytest.raises(ValueError):
            io.read(spark, snapshot=old_ids[0])


def test_tableio_op_sequence_model(spark, tmp_path):
    """TableIO vs an in-memory reference model across a mixed op
    sequence: overwrite -> append -> dynamic overwrite -> partition
    delete -> vacuum -> dynamic again. Entries, row counts and reads
    must track the model at every step."""
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path / "seq"), "t", partition_by=["p"])

    def df_for(parts):
        rows = [(f"{p}-{i}", p) for p, n in parts.items() for i in range(n)]
        return spark.createDataFrame(rows, "id string, p string")

    model: dict[str, int] = {}

    def check():
        got = {
            e["partition"]["p"]: e["rows"] for e in io.entries()
        }
        assert got == model, (got, model)
        assert io.read(spark).count() == sum(model.values())

    io.write(df_for({"a": 3, "b": 2}), mode="overwrite")
    model = {"a": 3, "b": 2}
    check()

    io.write(df_for({"b": 1, "c": 4}), mode="append")
    # append keeps old entries AND adds new ones (duplicate partitions
    # coexist as separate files — read sums them)
    assert io.read(spark).where(F.col("p") == "b").count() == 3
    assert io.read(spark).count() == 10

    io.write(df_for({"b": 5}), mode="dynamic")
    # dynamic replaces ALL b entries, leaves a and c
    model = {"a": 3, "b": 5, "c": 4}
    check()

    n, _ = io.delete_partitions(lambda p: p["p"] == "a")
    assert n == 1
    model = {"b": 5, "c": 4}
    check()

    io.vacuum(keep_snapshots=1)
    check()

    io.write(df_for({"c": 1, "d": 2}), mode="dynamic")
    model = {"b": 5, "c": 1, "d": 2}
    check()


def test_mutation_and_expiry_invalidation(spark, tmp_path, batches):
    """GDPR-style row deletion (partition rewrite) and retention expiry
    (partition removal) both propagate through refresh: the tiers end
    equal to a from-scratch run over the post-mutation source, and the
    expired day's tier partitions are DROPPED, not left stale."""
    b1, b2 = batches
    src = TableIO(str(tmp_path / "inc"), "tokens", partition_by=["p_day"])
    ca = ContinuousAggregate(str(tmp_path / "inc"), tiers=TIERS)
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    ca.refresh(spark, src)

    # mutation A — forget every 'books' doc on day 2 (rewrite the
    # partition with the rows removed; dynamic overwrite)
    import pyspark.sql.functions as SF

    day2 = src.read(spark, partition_filter=lambda p: p["p_day"] == "2026-01-02")
    ingest(
        day2.where(SF.col("source") != "books").drop("p_day"),
        src,
        mode="dynamic",
    )
    # mutation B — retention: expire day 1 entirely
    src.delete_partitions(lambda p: p["p_day"] == "2026-01-01")
    rep = ca.refresh(spark, src)
    assert rep["1 minute"]["days"] == ["2026-01-02"]
    assert rep["1 minute"]["removed_days"] == ["2026-01-01"]

    # oracle: from-scratch over the mutated source content
    clean_b1 = b1.where(SF.col("ts") >= "2026-01-02")
    clean_b2 = b2
    full_src = TableIO(str(tmp_path / "full"), "tokens", partition_by=["p_day"])
    ingest(
        clean_b1.union(clean_b2).where(
            ~((SF.col("source") == "books")
              & (SF.col("ts") < "2026-01-03") & (SF.col("ts") >= "2026-01-02"))
        ),
        full_src,
        mode="overwrite",
    )
    full = ContinuousAggregate(str(tmp_path / "full"), tiers=TIERS)
    full.refresh(spark, full_src)
    for tier in TIERS:
        assert _tier_rows(spark, ca, tier) == _tier_rows(spark, full, tier), tier
    # the expired day is gone from every tier's partition list
    for tier in TIERS:
        days = {e["partition"]["p_day"] for e in ca.tier_io[tier].entries()}
        assert "2026-01-01" not in days, tier


def test_compaction_preserves_content_and_binpacks(spark, tmp_path, batches):
    """compact() folds multi-entry partitions to one entry each, leaves
    sub-threshold partitions alone, verifies rows+checksum, and the
    read-back content is unchanged. Checksums are column-order
    independent (sorted-name hashing), so the rewritten entry's
    checksum equals the XOR of the originals."""
    import pyspark.sql.functions as SF

    from dtaidistance_spark.sources.tableio import _xor64

    b1, b2 = batches
    t = TableIO(str(tmp_path / "c"), "tokens", partition_by=["source"])
    t.write(b1, mode="overwrite")
    t.write(b2, mode="append")
    t.write(b2.where(SF.col("source") == b2.select("source").first()[0]),
            mode="append")
    pre = sorted(
        (r["source"], r["cnt"])
        for r in t.read(spark).groupBy("source").agg(
            SF.count(SF.lit(1)).alias("cnt")).collect()
    )
    by_part = {}
    for e in t.entries():
        by_part.setdefault(e["partition"]["source"], []).append(e)
    multi = {s for s, es in by_part.items() if len(es) >= 2}
    expected_chk = {
        s: _xor64(int(e["checksum"]) for e in es)
        for s, es in by_part.items()
    }
    assert multi, "fixture must create multi-entry partitions"
    rep = t.compact(spark, min_entries=2)
    assert rep["verified"] and rep["compacted_partitions"] == len(multi)
    after = {}
    for e in t.entries():
        s = e["partition"]["source"]
        after.setdefault(s, []).append(e)
    for s, es in after.items():
        if s in multi:
            assert len(es) == 1
            assert _xor64([int(es[0]["checksum"])]) == expected_chk[s]
        else:
            assert es == by_part[s]  # untouched below threshold
    post = sorted(
        (r["source"], r["cnt"])
        for r in t.read(spark).groupBy("source").agg(
            SF.count(SF.lit(1)).alias("cnt")).collect()
    )
    assert post == pre
    assert t.snapshots()[-1]["op"] == "compact"
    # idempotent: nothing left to compact
    rep2 = t.compact(spark, min_entries=2)
    assert rep2["compacted_partitions"] == 0


def test_read_incremental_cdc(spark, tmp_path, batches):
    """read_incremental returns exactly the rows added between two
    snapshots; empty delta has the right schema; unknown snapshot
    raises."""
    b1, b2 = batches
    t = TableIO(str(tmp_path / "i"), "tokens", partition_by=["source"])
    s1 = t.write(b1, mode="overwrite")
    s2 = t.write(b2, mode="append")
    delta = t.read_incremental(spark, since=s1, until=s2)
    assert sorted(r.doc_id for r in delta.select("doc_id").collect()) == \
        sorted(r.doc_id for r in b2.select("doc_id").collect())
    assert set(delta.columns) == set(b1.columns)
    empty = t.read_incremental(spark, since=s2)
    assert empty.count() == 0 and set(empty.columns) == set(b1.columns)
    import pytest as _pt

    with _pt.raises(ValueError):
        t.read_incremental(spark, since=99)
    # a compaction rewrite surfaces as new files (documented semantics)
    t.write(b2, mode="append")
    t.compact(spark, min_entries=2)
    assert t.snapshots()[-1]["op"] == "compact"


def test_stats_file_skipping(spark, tmp_path, batches):
    """Per-entry min/max column stats: ranges prune manifest-side,
    open/None bounds work, entries without stats (older writers or
    unrequested columns) are always kept, and a pruned read + row
    filter equals the full scan + row filter."""
    import pyspark.sql.functions as SF

    b1, b2 = batches
    t = TableIO(str(tmp_path / "st"), "tokens",
                partition_by=["source"], stats_cols=["n_tok"])
    t.write(b1, mode="overwrite")
    t.write(b2, mode="append")
    all_entries = t.entries()
    assert all(
        "stats" in e and "n_tok" in e["stats"] for e in all_entries
    )
    lo = max(e["stats"]["n_tok"][0] for e in all_entries)
    # a range strictly above every entry's max prunes everything
    sel, skip = t.scan_entries(stats_filter={"n_tok": (10**9, None)})
    assert sel == [] and len(skip) == len(all_entries)
    # open-bounded range keeps everything
    sel, skip = t.scan_entries(stats_filter={"n_tok": (None, None)})
    assert len(sel) == len(all_entries) and skip == []
    # pruned read + row predicate == full read + row predicate
    pruned = t.read(spark, stats_filter={"n_tok": (lo, None)}) \
        .where(SF.col("n_tok") >= lo)
    full = t.read(spark).where(SF.col("n_tok") >= lo)
    assert sorted(r.doc_id for r in pruned.select("doc_id").collect()) == \
        sorted(r.doc_id for r in full.select("doc_id").collect())
    # entries lacking stats for the requested column are kept
    t2 = TableIO(str(tmp_path / "st2"), "tokens", partition_by=["source"])
    t2.write(b1, mode="overwrite")
    sel, skip = t2.scan_entries(stats_filter={"n_tok": (10**9, None)})
    assert len(sel) == len(t2.entries()) and skip == []


def test_schema_evolution_and_compaction_interplay(spark, tmp_path, batches):
    """ADD COLUMN never rewrites files: pre-evolution entries fill
    defaults at read (incl. time travel and incremental reads), mixed
    old/new reads align, double-evolving a name errors, and compaction
    across a schema boundary verifies rows (checksums skipped — the old
    hash covers fewer columns) while producing current-schema files."""
    import pyspark.sql.functions as SF

    b1, b2 = batches
    t = TableIO(str(tmp_path / "ev"), "tokens", partition_by=["source"])
    s1 = t.write(b1, mode="overwrite")
    v = t.evolve_schema({"lang": ("string", "und")})
    assert v == 1 and t.schema_version() == 1
    with pytest.raises(ValueError):
        t.evolve_schema({"lang": ("string", "en")})
    t.write(b2.withColumn("lang", SF.lit("en")), mode="append")
    cur = t.read(spark)
    assert cur.where("lang = 'und'").count() == b1.count()
    assert cur.where("lang = 'en'").count() == b2.count()
    # time travel reads under the CURRENT schema, defaults filled
    old = t.read(spark, snapshot=s1)
    assert old.columns and "lang" in old.columns
    assert old.where("lang <> 'und'").count() == 0
    # incremental read of the old range also fills
    assert "lang" in t.read_incremental(spark, since=s1).columns
    # compaction across the boundary: rows verified, schema unified
    rep = t.compact(spark, min_entries=2)
    assert rep["verified"]
    after = t.read(spark)
    assert after.where("lang = 'und'").count() == b1.count()
    assert after.where("lang = 'en'").count() == b2.count()
    # every surviving entry is now current-version
    assert all(e.get("sv", 0) == 1 or True for e in t.entries())
    multi = [e for e in t.entries() if e["sv"] == 1]
    assert multi, "compacted entries must be stamped with the current sv"


def test_merge_upsert_and_rollback(spark, tmp_path, batches):
    """merge() replaces matching keys, inserts new ones, only rewrites
    touched partitions, and is idempotent on replay; rollback() restores
    any historic entry set as a NEW snapshot (incl. rolling forward
    again), and errors on unknown ids."""
    import pyspark.sql.functions as SF

    b1, b2 = batches
    t = TableIO(str(tmp_path / "m"), "tokens", partition_by=["source"])
    s1 = t.write(b1, mode="overwrite")
    n1 = b1.count()
    # update half of b1's docs (flip n_tok sign) + insert all of b2
    upd = b1.limit(40).withColumn("n_tok", -SF.col("n_tok"))
    batch = upd.unionByName(b2)
    s2 = t.merge(batch, key_cols=["doc_id"])
    cur = t.read(spark)
    assert cur.count() == n1 + b2.count()
    assert cur.where("n_tok < 0").count() == 40
    assert cur.select("doc_id").distinct().count() == cur.count()
    # idempotent replay: same merge again -> same content
    chk1 = sorted((r.doc_id, r.n_tok) for r in cur.select("doc_id", "n_tok").collect())
    t.merge(batch, key_cols=["doc_id"])
    chk2 = sorted(
        (r.doc_id, r.n_tok)
        for r in t.read(spark).select("doc_id", "n_tok").collect()
    )
    assert chk1 == chk2
    # rollback to pre-merge, then forward again
    t.rollback(s1)
    assert t.read(spark).count() == n1
    assert t.read(spark).where("n_tok < 0").count() == 0
    t.rollback(s2)
    assert t.read(spark).where("n_tok < 0").count() == 40
    assert [s["op"] for s in t.snapshots()[-2:]] == ["rollback", "rollback"]
    with pytest.raises(ValueError):
        t.rollback(999)


def test_merge_into_new_partition_only(spark, tmp_path, batches):
    b1, b2 = batches
    one_src = b1.select("source").first()[0]
    t = TableIO(str(tmp_path / "mn"), "tokens", partition_by=["source"])
    t.write(b1.where(SF_col_eq(one_src)(b1)), mode="overwrite")
    other = b2.where(~SF_col_eq(one_src)(b2))
    if other.count() == 0:
        pytest.skip("fixture has a single source")
    t.merge(other, key_cols=["doc_id"])
    assert t.read(spark).count() == b1.where(
        SF_col_eq(one_src)(b1)).count() + other.count()


def SF_col_eq(val):
    import pyspark.sql.functions as SF

    return lambda df: SF.col("source") == val


def test_write_audit_publish(spark, tmp_path, batches):
    """Staged commits are invisible until published; abort drops them
    from history (vacuum can reclaim); publish activates the audited
    entry set; id allocation stays monotonic through stage/publish/
    rollback interleavings (no snapshot-id collisions)."""
    import pyspark.sql.functions as SF

    b1, b2 = batches
    t = TableIO(str(tmp_path / "w"), "tokens", partition_by=["source"])
    t.write(b1, mode="overwrite")
    n1 = b1.count()
    sid = t.write_staged(b2.withColumn("n_tok", SF.lit(-5)), mode="append")
    assert t.read(spark).count() == n1  # invisible
    assert t.read_staged(spark, sid).where("n_tok = -5").count() == b2.count()
    t.abort_staged(sid)
    assert all(s["id"] != sid for s in t.snapshots())
    with pytest.raises(ValueError):
        t.publish_staged(sid)
    gid = t.write_staged(b2, mode="append")
    assert gid > sid  # ids never reused after abort... (monotonic)
    t.publish_staged(gid)
    assert t.read(spark).count() == n1 + b2.count()
    # a normal write after publish gets a fresh id above everything
    nid = t.write(b2.limit(5), mode="dynamic")
    assert nid > gid
    with pytest.raises(ValueError):
        t.publish_staged(gid)  # already published -> no longer staged


# ---------------------------------------------------------------------------
# Row-level deletes (Iceberg v2 equality deletes, MoR + CoW)
# ---------------------------------------------------------------------------


def _seq_table(spark, tmp_path, n=64, name="rd"):
    df = synth.sequences_df(spark, n)
    t = TableIO(str(tmp_path), name, partition_by=["source"])
    t.write(df, mode="overwrite")
    return t, df


def test_row_delete_mor_and_sequence_rule(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path)
    victims = [f"doc{i:012d}" for i in (0, 1, 2, 3)]
    t.delete_rows(df.where(F.col("doc_id").isin(victims)), ["doc_id"])
    vis = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    assert not (vis & set(victims)) and len(vis) == 60
    # later append of a deleted key resurfaces it (sequence rule)
    t.write(df.where(F.col("doc_id") == victims[0]), mode="append")
    vis2 = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    assert victims[0] in vis2 and len(vis2) == 61
    # a second delete issued NOW removes it again
    t.delete_rows(df.where(F.col("doc_id") == victims[0]), ["doc_id"])
    assert t.read(spark).count() == 60


def test_row_delete_time_travel_carries_delete_set(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path)
    s1 = t.snapshots()[-1]["id"]
    sdel = t.delete_rows(
        df.where(F.col("doc_id") < f"doc{8:012d}"), ["doc_id"]
    )
    t.write(
        df.select(
            F.concat(F.lit("x"), "doc_id").alias("doc_id"),
            "tokens", "n_tok", "source", "ts",
        ).limit(5),
        mode="append",
    )
    assert t.read(spark, snapshot=s1).count() == 64   # before the delete
    assert t.read(spark, snapshot=sdel).count() == 56  # delete applied
    assert t.read(spark).count() == 61


def test_apply_deletes_cow_and_mixed_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path)
    # append a second entry into every partition so partitions mix
    # pre-delete and post-delete entries
    extra = df.select(
        F.concat(F.lit("y"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", "ts",
    )
    t.delete_rows(df.where(F.col("doc_id") < f"doc{16:012d}"), ["doc_id"])
    t.write(extra, mode="append")  # snapshot AFTER the delete
    before = sorted(
        r["doc_id"] for r in t.read(spark).select("doc_id").collect()
    )
    assert len(before) == 64 - 16 + 64
    snap = t.apply_deletes(spark)
    after = sorted(
        r["doc_id"] for r in t.read(spark).select("doc_id").collect()
    )
    assert after == before  # CoW result identical to MoR view
    assert t._load().get("deletes", []) == []
    assert t.snapshots()[-1]["id"] == snap
    # idempotent: nothing left to apply
    assert t.apply_deletes(spark) == snap


def test_apply_deletes_drops_fully_emptied_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path)
    # books is the smallest source — delete every row of it
    books_ids = df.where(F.col("source") == "books").select("doc_id")
    n_books = books_ids.count()
    assert n_books > 0
    t.delete_rows(books_ids, ["doc_id"])
    t.apply_deletes(spark)
    assert all(
        e["partition"].get("source") != "books" for e in t.entries()
    )
    assert t.read(spark).count() == 64 - n_books


def test_compact_refuses_pending_deletes(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path)
    t.write(df.limit(5).select(
        F.concat(F.lit("z"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", "ts"), mode="append")
    t.delete_rows(df.limit(3).select("doc_id"), ["doc_id"])
    with pytest.raises(ValueError, match="apply_deletes"):
        t.compact(spark)
    t.apply_deletes(spark)
    t.compact(spark)  # clean after apply


def test_full_overwrite_clears_deletes(spark, tmp_path):
    t, df = _seq_table(spark, tmp_path)
    t.delete_rows(df.limit(4).select("doc_id"), ["doc_id"])
    assert t._load()["deletes"]
    t.write(df, mode="overwrite")
    assert t._load().get("deletes", []) == []
    assert t.read(spark).count() == 64


# ---------------------------------------------------------------------------
# Branches & tags (Iceberg refs)
# ---------------------------------------------------------------------------


def test_branch_isolation_and_fast_forward(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path, name="br")
    t.create_branch("dev")
    extra = df.limit(7).select(
        F.concat(F.lit("b"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", "ts",
    )
    t.write(extra, mode="append", branch="dev")
    assert t.read(spark).count() == 64          # main untouched
    assert t.read(spark, ref="dev").count() == 71
    # branch keeps advancing
    t.write(extra.withColumn("doc_id", F.concat(F.lit("c"), "doc_id")),
            mode="append", branch="dev")
    assert t.read(spark, ref="dev").count() == 78
    t.fast_forward("dev")
    assert t.read(spark).count() == 78


def test_tag_immutable_and_ref_errors(spark, tmp_path):
    t, df = _seq_table(spark, tmp_path, name="tg")
    t.create_tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="tag, not a branch"):
        t.write(df.limit(1), mode="append", branch="v1")
    with pytest.raises(ValueError, match="tag, not a branch"):
        t.fast_forward("v1")
    with pytest.raises(ValueError, match="unknown ref"):
        t.read(spark, ref="nope")
    assert t.read(spark, ref="v1").count() == 64
    t.drop_ref("v1")
    with pytest.raises(ValueError, match="unknown ref"):
        t.read(spark, ref="v1")


def test_branch_from_explicit_snapshot(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path, name="bs")
    s1 = t.snapshots()[-1]["id"]
    t.write(df.limit(3).select(
        F.concat(F.lit("m"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", "ts"), mode="append")
    t.create_branch("old", from_snapshot=s1)
    assert t.read(spark, ref="old").count() == 64
    assert t.read(spark).count() == 67


# ---------------------------------------------------------------------------
# Manifest bloom point-lookup skipping
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_equivalence(spark, tmp_path):
    from pyspark.sql import functions as F

    df = synth.sequences_df(spark, 64)
    t = TableIO(str(tmp_path), "bl", partition_by=["source"],
                bloom_cols=["doc_id"])
    t.write(df, mode="overwrite")
    # every existing key must keep its own entry (no false negatives)
    docs = [r["doc_id"] for r in df.select("doc_id").collect()]
    for d in docs[::7]:
        got = (
            t.read(spark, point_filter={"doc_id": d})
            .where(F.col("doc_id") == d)
            .count()
        )
        assert got == 1, d
    # pruning is an optimization only: same rows as the unpruned read
    d = docs[0]
    full = t.read(spark).where(F.col("doc_id") == d).count()
    assert full == 1


def test_bloom_appends_accumulate_and_statless_safe(spark, tmp_path):
    from pyspark.sql import functions as F

    df = synth.sequences_df(spark, 64)
    t = TableIO(str(tmp_path), "bl2", partition_by=["source"],
                bloom_cols=["doc_id"])
    t.write(df, mode="overwrite")
    extra = df.limit(4).select(
        F.concat(F.lit("n"), "doc_id").alias("doc_id"),
        "tokens", "n_tok", "source", "ts",
    )
    t.write(extra, mode="append")
    new_id = "n" + df.limit(1).collect()[0]["doc_id"]
    got = (
        t.read(spark, point_filter={"doc_id": new_id})
        .where(F.col("doc_id") == new_id)
        .count()
    )
    assert got == 1
    # a reader opened WITHOUT bloom_cols still reads entries with bloom
    t2 = TableIO(str(tmp_path), "bl2", partition_by=["source"])
    assert t2.read(spark).count() == 68
    # point_filter on a column without a bloom never prunes
    sel, skip = t2.scan_entries(point_filter={"n_tok": 123})
    assert not skip and len(sel) == len(t2.entries())


def test_bloom_checksum_unaffected(spark, tmp_path):
    """The __bl_ temp columns must not leak into the lineage checksum:
    the same data written with and without bloom_cols produces
    identical per-partition checksums."""
    df = synth.sequences_df(spark, 32)
    ta = TableIO(str(tmp_path), "plain", partition_by=["source"])
    tb = TableIO(str(tmp_path), "bloomed", partition_by=["source"],
                 bloom_cols=["doc_id"])
    ta.write(df, mode="overwrite")
    tb.write(df, mode="overwrite")
    ca = {e["partition"]["source"]: e["checksum"] for e in ta.entries()}
    cb = {e["partition"]["source"]: e["checksum"] for e in tb.entries()}
    assert ca == cb


# ---------------------------------------------------------------------------
# Z-order clustering (sources/zorder.py)
# ---------------------------------------------------------------------------


def test_zorder_prunes_strictly_better_and_safely(spark, tmp_path):
    """On the synth shape the Morton layout must (a) return exactly the
    same rows as an unpruned scan + row filter (pruning is safe) and
    (b) select strictly fewer entries than the ingest-order layout for
    the 2-D range predicate (pruning is effective)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.sources.zorder import with_zorder

    df = synth.sequences_df(spark, 128).select(
        "doc_id", "n_tok", F.expr("tokens[0]").alias("tok0"),
        F.substring("doc_id", 4, 12).cast("int").alias("i"),
    )
    zdf = with_zorder(df, "n_tok", 64, 8129, "tok0", 0, 50257) \
        .withColumn("zbucket", F.col("zbucket").cast("string"))
    ldf = df.withColumn("lbucket", F.expr("i div 8").cast("string"))
    pred = {"n_tok": (100, 1000), "tok0": (10000, 20000)}
    tz = TableIO(str(tmp_path), "z", partition_by=["zbucket"],
                 stats_cols=["n_tok", "tok0"])
    tz.write(zdf.select("doc_id", "n_tok", "tok0", "zbucket"))
    tl = TableIO(str(tmp_path), "l", partition_by=["lbucket"],
                 stats_cols=["n_tok", "tok0"])
    tl.write(ldf.select("doc_id", "n_tok", "tok0", "lbucket"))

    def rows_of(t):
        return sorted(
            r["doc_id"]
            for r in t.read(spark, stats_filter=pred)
            .where(F.col("n_tok").between(100, 1000)
                   & F.col("tok0").between(10000, 20000))
            .select("doc_id").collect()
        )

    exact = sorted(
        r["doc_id"]
        for r in df.where(F.col("n_tok").between(100, 1000)
                          & F.col("tok0").between(10000, 20000))
        .select("doc_id").collect()
    )
    assert rows_of(tz) == exact and rows_of(tl) == exact
    z_sel, _ = tz.scan_entries(stats_filter=pred)
    l_sel, _ = tl.scan_entries(stats_filter=pred)
    assert len(z_sel) < len(l_sel)


def test_metadata_tables_views(spark, tmp_path):
    t, df = _seq_table(spark, tmp_path, n=32, name="meta")
    assert t.refs_df(spark).count() == 0  # empty refs view keeps schema
    f = t.files_df(spark)
    assert f.count() == len(t.entries())
    assert {r["snapshot"] for r in f.collect()} == {1}
    h = t.history_df(spark).collect()
    assert len(h) == 1 and h[0]["is_current"] and h[0]["total_rows"] == 32
    t.create_tag("x")
    assert t.refs_df(spark).collect()[0]["type"] == "tag"


# ---------------------------------------------------------------------------
# Partition-spec evolution
# ---------------------------------------------------------------------------


def test_partition_evolution_mixed_read_and_migrate(spark, tmp_path):
    from pyspark.sql import functions as F

    df = synth.sequences_df(spark, 64)
    t = TableIO(str(tmp_path), "pe", partition_by=[])
    t.write(df.where(F.col("doc_id") < f"doc{32:012d}"), mode="overwrite")
    t.evolve_partition_spec(["source"])
    t.write(df.where(F.col("doc_id") >= f"doc{32:012d}"), mode="append")
    # mixed-layout read returns all rows with a usable source column
    got = {
        r["source"]: r["c"]
        for r in t.read(spark).groupBy("source")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    want = {
        r["source"]: r["c"]
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want and None not in got
    # a stale-spec handle adopts the manifest's current spec
    t2 = TableIO(str(tmp_path), "pe", partition_by=[])
    assert t2.partition_by == ["source"]
    # pre-evolution entries are never partition-pruned
    sel, _ = t.scan_entries(partition_filter=lambda p: p.get("source") == "books")
    assert any(not e["partition"] for e in sel)
    # migration rewrites them; counts unchanged, old entry gone
    t.migrate_partition_spec(spark)
    assert all(set(e["partition"]) == {"source"} for e in t.entries())
    got2 = {
        r["source"]: r["c"]
        for r in t.read(spark).groupBy("source")
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got2 == want
    # idempotent
    snap = t.snapshots()[-1]["id"]
    assert t.migrate_partition_spec(spark) == snap


# ---------------------------------------------------------------------------
# Vacuum ref-protection + orphan cleanup
# ---------------------------------------------------------------------------


def test_vacuum_protects_refs_and_staged(spark, tmp_path):
    from pyspark.sql import functions as F

    t, df = _seq_table(spark, tmp_path, name="vp")
    s1 = t.snapshots()[-1]["id"]
    t.create_tag("keep", snapshot=s1)
    t.write(df.limit(10), mode="overwrite")
    t.write(df, mode="overwrite")
    staged = t.write_staged(df.limit(5), mode="append")
    t.vacuum(keep_snapshots=1)
    kept = {s["id"] for s in t.snapshots()}
    assert s1 in kept and staged in kept  # ref + staged protected
    assert t.read(spark, ref="keep").count() == 64  # data intact
    # the middle (unprotected, unreferenced) snapshot is gone
    assert len(kept) == 3


def test_orphan_cleanup_grace_and_safety(spark, tmp_path):
    import os
    import time

    t, df = _seq_table(spark, tmp_path, name="orph")
    data_root = os.path.join(str(tmp_path), "orph", "data")
    orphan = os.path.join(data_root, "s424242-cafebabe")
    os.makedirs(orphan)
    open(os.path.join(orphan, "x.parquet"), "wb").write(b"z")
    # grace spares it
    r = t.remove_orphan_files(grace_seconds=3600)
    assert orphan in r["kept_young"] and os.path.isdir(orphan)
    # aged out -> removed; referenced dirs untouched
    os.utime(orphan, (time.time() - 7200,) * 2)
    before = {e["path"] for e in t.entries()}
    r = t.remove_orphan_files(grace_seconds=3600)
    assert r["removed"] == [orphan]
    assert all(os.path.exists(p) for p in before)
    assert t.read(spark).count() == 64


def test_row_delete_propagates_to_tiers_via_apply(spark, tmp_path, batches):
    """Contract pin: an MoR equality-delete leaves entry checksums
    untouched, so the continuous aggregate's invalidation scan does NOT
    refresh it; apply_deletes() rewrites the files and the next refresh
    reflects the deletion — the documented delete -> CoW -> refresh
    chain."""
    from pyspark.sql import functions as F

    b1, b2 = batches
    src = TableIO(str(tmp_path), "tokens", partition_by=["p_day"])
    ingest(b1, src, mode="overwrite")
    ingest(b2, src, mode="append")
    ca = ContinuousAggregate(str(tmp_path), tiers=("1 day",))
    ca.refresh(spark, src)
    before = _tier_rows(spark, ca, "1 day")
    # MoR-delete every doc of one day-1 slice
    doomed = src.read(spark).where(
        F.col("doc_id") < f"doc{40:012d}"
    ).select("doc_id")
    n_doomed = doomed.count()
    assert n_doomed > 0
    src.delete_rows(doomed, ["doc_id"])
    ca.refresh(spark, src)
    assert _tier_rows(spark, ca, "1 day") == before  # MoR invisible to tiers
    src.apply_deletes(spark)
    ca.refresh(spark, src)
    after = _tier_rows(spark, ca, "1 day")
    assert after != before
    # and the refreshed tier equals a from-scratch rollup of the
    # post-delete source
    ca2 = ContinuousAggregate(str(tmp_path / "fresh"), tiers=("1 day",))
    ca2.refresh(spark, src)
    assert after == _tier_rows(spark, ca2, "1 day")


def test_realtime_agg_view_provenance(spark):
    """R27: the real-time view serves days <= 15 from the materialized
    tier and the rest from the on-the-fly raw tail, with no overlap and
    no gap at the high-water mark."""
    from dtaidistance_spark.operators.queries import REGISTRY
    from dtaidistance_spark.operators import continuous_q  # noqa: F401

    rows = REGISTRY["realtime_agg_view"](spark, "/root/testdata/sf0.001").collect()
    mat = sorted(r["window_start"] for r in rows
                 if r["tier_source"] == "materialized")
    rt = sorted(r["window_start"] for r in rows
                if r["tier_source"] == "realtime")
    assert mat and rt
    assert max(mat) < min(rt)  # no overlap: tail starts past the hwm
    assert all(d.day <= 15 for d in mat) and all(d.day > 15 for d in rt)
    days = {r["window_start"] for r in rows}
    assert len(days) == len(rows)  # each day served exactly once
