"""Physical-plan inspection gates (SURVEY §4 / BASELINE.md):

- predicate pushdown + column pruning reach the parquet scan
  (``PushedFilters`` populated, ``ReadSchema`` pruned to the projection);
- dimension joins broadcast (no shuffle of the small side);
- whole-stage codegen spans exist on SQL stages;
- zero row-wise Python anywhere: every Python boundary is an Arrow
  batch node (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas),
  never ``BatchEvalPython``.

These are the properties that decide whether the same plan survives a
100x scale-up — asserted, not assumed.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_pushdown_and_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag", "l_quantity"
    )
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # ReadSchema pruned: payload columns we did not select must be absent
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    from __spark_entry__ import queries

    plan = _plan(queries()["revenue_per_nation"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # customer, nation
    # the small sides must not hash-shuffle
    assert "BroadcastExchange" in plan


def test_whole_stage_codegen_spans(spark, sf_dir):
    from __spark_entry__ import queries

    df = queries()["pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan only on execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans; both agg stages
    # (partial + final) must be inside codegen
    assert "*(1)" in executed and "*(2)" in executed, executed


def test_no_rowwise_python_across_pipelines(spark, sf_dir):
    """Every Python-touching pipeline crosses the JVM boundary only via
    Arrow-batched nodes (north rule)."""
    from __spark_entry__ import queries

    reg = queries()
    for name in [
        "events_daily_profile",  # DBA rollup (applyInPandas-equivalent)
        "dtw_pairs_threshold",   # pair join + batched kernel
        "gorilla_roundtrip",     # encode/decode mapInPandas
        "minhash_lsh_neardups",  # pure SQL — no Python at all
        "ann_ivf_topk",          # pandas_udf assignment
        "ann_ivfpq_topk",        # PQ encode + ADC pandas_udfs
        "unigram_logprob",       # pure SQL curation op
        "gopher_repetition",     # pure SQL curation op
        "dsir_weights",          # pure SQL curation op
        "sequence_packing",      # window SQL packing
        "neardup_components",    # iterative join rounds
        "decontaminate",         # gram explode + broadcast semi join
        "domain_mixing_sample",  # pure SQL hash sampling
        "train_split_assign",    # pure SQL hash split
        "bloom_dedup_check",     # bloom probe pandas_udf
        "c4_quality_filters",    # pure SQL rule gate
        "pii_redact",            # JVM regex count + mask
        "bm25_topk",             # explode + broadcast df/idf + window rank
        "counter_rate",          # window lag/cumsum per user
        "minmax_downsample",     # window ranks per bucket
        "sax_symbols",           # HOF aggregates, zero shuffles
        "dtw_diag_pairs",        # diag-oracle pairs (Arrow kernel only)
        "events_percentiles",    # exact percentile agg
        "session_windows",       # native session_window agg
        "semdedup",              # quantizer pandas_udf + cluster join
        "cms_heavy_hitters",     # sketch aggregate + broadcast probe
        "stratified_sample",     # hash-rank window
        "token_pmi",             # bigram explode + broadcast unigrams
        "lttb_downsample",       # per-series Arrow kernel
        "substring_dedup_spans", # gram explode + island merge, pure SQL
        "matrix_profile_self",   # zero-shuffle blocked-BLAS mapInPandas
        "matrix_profile_znorm",  # znorm twin, same shape
        "mp_ab_profile",         # broadcast query windows into the scan
        "contamination_screen",  # AB profile + window rank
        "acf_per_series",        # HOF lag products, zero shuffles
        "ewma_smooth",           # left-fold HOF, zero shuffles
        "cusum_changepoint",     # one window sort per series
        "seasonal_anomaly",      # broadcast baseline + global top-k
        "kmv_distinct",          # distinct + per-key bottom-k
        "holt_smooth",           # array-state fold, zero shuffles
        "time_weighted_avg",     # one window sort per user
        "heartbeat_agg",         # one window sort per user
        "m4_downsample",         # four ranks, one partitioning
        "pla_blocks",            # block explode + HOF OLS, zero shuffles
        "robust_outliers",       # sort-in-row median/MAD, zero shuffles
        "ccf_pairs",             # broadcast pair join + HOF lag sums
        "goertzel_power",        # list-state folds, zero shuffles
        "funnel_analysis",       # min-ts stage chaining
        "cohort_retention",      # distinct + two aggs
        "interval_overlap_join", # bucketed interval join (no cartesian)
        "sdt_downsample",        # per-series Arrow kernel
    ]:
        plan = _plan(reg[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name


def test_rollup_shuffle_is_single_exchange(spark):
    """The 1-minute DBA rollup plan contains exactly ONE hash exchange
    (the groupBy key shuffle) before the Arrow kernel — no accidental
    extra repartition/sort shuffles on the hot path."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators import rollup as R

    import re

    seq = synth.sequences_df(spark, 64)
    plan = _plan(R.dba_rollup(seq, tier="1 minute"))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, plan


def test_bucketed_join_has_no_exchange(spark):
    """Co-located join: a table bucketed+sorted on doc_id self-joins
    with ZERO Exchange nodes — the scans are pre-partitioned and
    pre-sorted (SMJ straight off disk). Broadcast is disabled for the
    probe so the planner cannot sidestep the bucketed path."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.sources import bucketing as BK

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        BK.drop_bucketed(spark, "t_bkt_gate")
        BK.write_bucketed(
            synth.sequences_df(spark, 256), "t_bkt_gate", buckets=4, key="doc_id"
        )
        t = BK.read_bucketed(spark, "t_bkt_gate")
        j = (
            t.alias("a")
            .join(t.alias("b"), "doc_id")
            .selectExpr("doc_id", "a.n_tok AS na", "b.n_tok AS nb")
        )
        assert j.count() == 256
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "Bucketed: true" in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        BK.drop_bucketed(spark, "t_bkt_gate")


def test_sax_is_shuffle_free(spark, sf_dir):
    """S5 claim: SAX symbolization is a scan-side codegen projection —
    ZERO Exchange nodes in the executed plan."""
    import re

    from __spark_entry__ import queries

    plan = _plan(queries()["sax_symbols"](spark, sf_dir))
    assert not re.findall(r"Exchange hashpartitioning", plan), plan


def test_counter_rate_single_user_shuffle(spark, sf_dir):
    """R17 claim: lag + cumulative reset base + first/last all share
    ONE hash exchange on user_id (a second exchange appears only for
    the final aggregate's partials, which AQE coalesces)."""
    import re

    from __spark_entry__ import queries

    plan = _plan(queries()["counter_rate"](spark, sf_dir))
    n = len(re.findall(r"Exchange hashpartitioning\(user_id", plan))
    assert n <= 2, plan


def _walk_jvm_plan(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_jvm_plan(ch.apply(i))


def test_global_topk_is_take_ordered_not_window(spark, sf_dir):
    """Round-3 gate (VERDICT round-2 'What's wrong' #1): the six global
    top-k queries must plan as TakeOrderedAndProject (bounded heaps),
    and NO query in the set may contain a partition-less Window node —
    the single-partition full-sort anti-pattern Spark itself warns
    about ('No Partition Defined for Window operation')."""
    from __spark_entry__ import queries

    reg = queries()
    for name in [
        "seasonal_anomaly",
        "bm25_topk",
        "cms_heavy_hitters",
        "token_pmi",
        "corpus_discords",
        "corpus_motifs",
    ]:
        df = reg[name](spark, sf_dir)
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan, name
        opt = df._jdf.queryExecution().optimizedPlan()
        for n in _walk_jvm_plan(opt):
            if n.getClass().getSimpleName() == "Window":
                assert n.partitionSpec().size() > 0, (
                    f"{name}: partition-less Window node in optimized plan"
                )


def test_no_global_window_in_source():
    """Static registry-wide guarantee: no ``Window.orderBy(...)``
    (i.e. a window spec with no partitionBy) anywhere in the package —
    global top-k must go through qutil.global_topk."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "dtaidistance_spark"
    hits = [
        str(p)
        for p in sorted(pkg.rglob("*.py"))
        if re.search(r"Window\s*\.\s*orderBy", p.read_text())
    ]
    assert hits == [], hits


def test_round3b_plan_shapes(spark, sf_dir):
    """Round-3b plan gates: the new TS family keeps its documented
    exchange budget — Kalman/Theil-Sen are pure scan-side projections,
    Hampel's two frame windows share one user_id exchange, and both
    changepoint queries ride a single doc_id exchange (binseg with NO
    join: the winner spread is a full-partition window)."""
    from __spark_entry__ import queries

    reg = queries()
    budget = {
        "kalman_filter": 0,
        "theil_sen_slope": 0,
        "theil_sen_scaled": 0,
        "hampel_filter": 1,
        "best_split_changepoint": 1,
        "binseg_changepoints": 1,
    }
    for name, n_ex in budget.items():
        plan = (
            reg[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == n_ex, (
            name,
            plan.count("Exchange hashpartitioning"),
        )
        if name == "binseg_changepoints":
            assert "Join" not in plan, name


def test_asof_scaled_is_joinless_single_exchange(spark, sf_dir):
    """R29: the union-merge as-of plans as ONE user-keyed exchange with
    no join operator, and returns exactly asof_join's rows."""
    from __spark_entry__ import queries

    reg = queries()
    df = reg["asof_join_scaled"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    a = df.toPandas().sort_values("event_id").reset_index(drop=True)
    b = (
        reg["asof_join"](spark, sf_dir)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.equals(b[a.columns])


def test_hof_battery_compiles_and_sustains_at_8192_cap(spark):
    """Round-3 verdict item #4: the HOF-heavy unitroot battery
    (Phillips–Perron residual-autocovariance folds + AR(4)
    Levinson–Durbin + Inclán–Tiao cleared scan — the deepest nested
    ``aggregate()`` chains in the repo) at a RAISED 8,192-token tier.

    Three claims gated: (a) with ``spark.sql.codegen.fallback=false``
    the whole battery still EXECUTES — a whole-stage codegen compile
    failure (the giant-generated-method risk that grows with the
    token cap) would surface as an error here instead of a silent
    interpreted fallback; (b) the plan stays one-exchange (only the
    single-row partial-aggregate combine — the PLANS.md contract);
    (c) throughput holds a conservative floor (warm min-of-2
    ≥ 0.3 M tokens/sec; measured 7.8 M on this VM — 25× headroom
    against host noise, tight enough to catch an accidental
    quadratic re-evaluation)."""
    import time

    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import arforecast_q as AR
    from dtaidistance_spark.operators import inclantiao_q as IT
    from dtaidistance_spark.operators import phillipsperron_q as PP
    from dtaidistance_spark.operators import stationarity_q as ST

    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        ndoc, nt = 64, 8192
        sub = spark.range(ndoc).selectExpr(
            "CAST(id AS STRING) AS doc_id",
            f"CAST({nt} AS BIGINT) AS n",
            f"CAST({nt} - 1 AS BIGINT) AS m",
            f"CAST(floor(0.8 * {nt}) AS BIGINT) AS m0",
            f"transform(sequence(1, {nt}),"
            " j -> pmod(id * 31 + j * 17, 50257)) AS v",
        )
        d = sub
        for k, x in ST._df_folds("spark").items():
            d = d.withColumn(k, F.expr(x))
        for k, x in ST._DF_ABC.items():
            d = d.withColumn(k, F.expr(f"CAST({x} AS BIGINT)"))
        d = d.withColumn("rho", F.expr(PP._RHO)).withColumn(
            "alpha", F.expr(PP._ALPHA)
        )
        for k, x in PP._gamma_folds("spark").items():
            d = d.withColumn(k, F.expr(x))
        d = d.withColumn(
            "mu", F.expr(AR._train_folds("spark")["sy"])
        ).withColumn(
            "mu", F.expr("CAST(mu AS DOUBLE) / CAST(m0 AS DOUBLE)")
        )
        for k, x in AR._cov_folds("spark").items():
            d = d.withColumn(k, F.expr(x))
        d = d.withColumn("qm", F.expr(IT._qm_fold("spark")))
        chk = d.selectExpr(
            f"sum(CASE WHEN {PP._ZPP} < -2.86 THEN 1 ELSE 0 END)"
            " AS pp_rejects",
            "sum(CASE WHEN r1 / r0 < 0 THEN 1 ELSE 0 END)"
            " AS antipersistent",
            "sum(qm) AS qm_total",
        )
        plan = chk._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan  # single-row combine
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = chk.collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        assert rows[0].qm_total == 323230836544  # deterministic input
        assert ndoc * nt / best >= 0.3e6, f"{ndoc * nt / best:.0f} tok/s"
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_kmeans_assign_step_plan(spark):
    """Round-4 verdict item #6 (C1 iteration hygiene, plan side): the
    per-iteration assignment is ONE Arrow-batched map over the
    persisted corpus — zero exchanges (centers ride an explicit Spark
    broadcast, not a join; the LB-pruned argmin happens inside the
    kernel), zero row-wise Python."""
    import numpy as np

    from dtaidistance_spark import synth
    from dtaidistance_spark.clustering import kmeans as KM

    df = synth.sequences_df(spark, 16).select("doc_id", "tokens")
    centers = np.zeros((3, 32))
    plan = _plan(KM.assign_step(df, centers, length=32, window=4))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_kmeans_flat_plan_depth_20_iterations(spark):
    """Round-4 verdict item #6 (the cc_star lesson applied to C1): a
    20-iteration k-means run completes with a FLAT logical plan —
    each iteration's centers are collected to the driver, so iteration
    20's assignment plan is the same shape (and same explain depth) as
    iteration 1's, never a 20-deep lineage that OOMs AQE rendering."""
    import re

    from dtaidistance_spark import synth
    from dtaidistance_spark.clustering import kmeans as KM

    df = synth.sequences_df(spark, 24).select("doc_id", "tokens")

    def depth(max_it):
        assigned, centers = KM.dtw_kmeans(
            df, k=2, max_it=max_it, length=32, window=4
        )
        plan = _plan(assigned)
        # strip node ids so the comparison is structural
        return len(
            [ln for ln in plan.splitlines() if ln.strip()]
        ), re.sub(r"#\d+", "#x", plan.split("\n\n")[0])

    d1, p1 = depth(1)
    d20, p20 = depth(20)
    assert d20 == d1, (d1, d20)
    assert p20 == p1
