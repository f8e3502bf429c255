"""Driver-facing query registry: every operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string over the same parquet tables.

Conventions (driver contract):
- every computed column aliased identically in Spark and SQL;
- every float output rounded (4 dp; 2 dp for large money sums) in BOTH
  engines so order-of-accumulation float noise can't break value hashes;
- deterministic ordering keys inside window functions (ties broken by id).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# R2/A4 — scan + filter + aggregate (TPC-H Q1 shape; Catalyst pushes the
# filter and prunes columns into the parquet scan)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                AS sum_qty,
           round(sum(l_extendedprice), 2)                           AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           round(avg(l_quantity), 4)                                AS avg_qty,
           round(avg(l_discount), 4)                                AS avg_disc,
           count(*)                                                 AS count_order
    FROM lineitem
    WHERE l_discount > 0.01
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.01)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# R3 — multi-way equi-join with broadcast dims (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@register(
    "revenue_per_nation",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey)                        AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def revenue_per_nation(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# R5 — top-k (TakeOrderedAndProject)
# ---------------------------------------------------------------------------


@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# R6 — set ops
# ---------------------------------------------------------------------------


@register(
    "set_ops_users",
    oracle="""
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_ops_users(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    u = lambda t: ev.where(F.col("event_type") == t).select("user_id").distinct()
    return u("purchase").intersect(u("click")).exceptAll(u("error"))


# ---------------------------------------------------------------------------
# R7 — rollup / cube grouping sets
# ---------------------------------------------------------------------------


@register(
    "rollup_lang_source",
    oracle="""
    SELECT lang, source, count(*) AS n, round(sum(n_chars), 2) AS chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def rollup_lang_source(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("n_chars").cast("double"), 2).alias("chars"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# R8 — window functions
# ---------------------------------------------------------------------------


@register(
    "window_running",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w                          AS rn,
           round(lag(value) OVER w, 4)                  AS prev_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                                                        AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_running(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.sum("value").over(wr), 2).alias("running_sum"),
    )


# ---------------------------------------------------------------------------
# A4/R14 base — hourly continuous-aggregate rollup (classic stats)
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*)                  AS n,
           round(sum(value), 2)      AS sum_value,
           round(avg(value), 4)      AS avg_value,
           round(min(value), 2)      AS min_value,
           round(max(value), 2)      AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# R11 — gap-fill LOCF over an hourly grid
# ---------------------------------------------------------------------------

_GAPFILL_BASE_SQL = """
    WITH base AS (
        SELECT user_id, date_trunc('hour', ts) AS h, round(avg(value), 4) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM base),
    grid AS (
        SELECT u.user_id, g.h
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
            FROM bounds
        ) g
    ),
    j AS (
        SELECT grid.user_id, grid.h, base.v
        FROM grid LEFT JOIN base ON grid.user_id = base.user_id AND grid.h = base.h
    )
"""


@register(
    "gapfill_locf",
    oracle=_GAPFILL_BASE_SQL
    + """
    SELECT user_id, h AS hour,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_locf
    FROM j
    """,
)
def gapfill_locf(spark, sf_dir):
    j = _gapfill_grid(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hour",
        F.round(F.last("v", ignorenulls=True).over(w), 4).alias("v_locf"),
    )


def _gapfill_grid(spark, sf_dir):
    """(user_id × hourly grid) left-joined with hourly means — shared by
    LOCF and linear interpolation. The grid is built with sequence()+
    explode (JVM-side, no Python)."""
    ev = T(spark, sf_dir, "events")
    base = (
        ev.groupBy(F.col("user_id"), F.date_trunc("hour", "ts").alias("h"))
        .agg(F.round(F.avg("value"), 4).alias("v"))
        .select(
            F.col("user_id").alias("b_user"), F.col("h").alias("b_hour"), "v"
        )
    )
    bounds = base.agg(F.min("b_hour").alias("mn"), F.max("b_hour").alias("mx"))
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    return grid.join(
        base,
        (grid.user_id == base.b_user) & (grid.hour == base.b_hour),
        "left",
    ).select("user_id", "hour", "v")


@register(
    "gapfill_linear",
    oracle=_GAPFILL_BASE_SQL
    + """
    , f AS (
        SELECT user_id, h, v,
            last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_prev,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_prev,
            first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS v_next,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS t_next
        FROM j
    )
    SELECT user_id, h AS hour,
        round(CASE
            WHEN v IS NOT NULL THEN v
            WHEN v_prev IS NOT NULL AND v_next IS NOT NULL THEN
                v_prev + (v_next - v_prev)
                * ((epoch(h) - epoch(t_prev)) / (epoch(t_next) - epoch(t_prev)))
            ELSE v_prev
        END + 1e-9, 4) AS v_lin
    FROM f
    """,
    # + 1e-9: linear interp between 2-dp values at 1/2^k fractions lands on
    # exact decimal halves; Spark rounds the decimal repr, DuckDB the binary
    # value — nudge both off the boundary identically.
)
def gapfill_linear(spark, sf_dir):
    j = _gapfill_grid(spark, sf_dir)
    wp = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_known = F.when(F.col("v").isNotNull(), F.col("hour"))
    f = j.select(
        "user_id",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("v_prev"),
        F.last(t_known, ignorenulls=True).over(wp).alias("t_prev"),
        F.first("v", ignorenulls=True).over(wn).alias("v_next"),
        F.first(t_known, ignorenulls=True).over(wn).alias("t_next"),
    )
    frac = (F.col("hour").cast("double") - F.col("t_prev").cast("double")) / (
        F.col("t_next").cast("double") - F.col("t_prev").cast("double")
    )
    v_lin = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("v_prev").isNotNull() & F.col("v_next").isNotNull(),
            F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * frac,
        )
        .otherwise(F.col("v_prev"))
    )
    return f.select(
        "user_id", "hour", F.round(v_lin + 1e-9, 4).alias("v_lin")
    )


# ---------------------------------------------------------------------------
# R4 — as-of join (event -> most recent order of that customer)
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    oracle="""
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           round(o_totalprice, 2) AS last_order_total
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def asof_join(spark, sf_dir):
    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = T(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    j = ev.join(
        F.broadcast(o),
        (o.o_custkey == ev.user_id) & (o.o_orderdate <= ev.ts),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc_nulls_last("o_orderdate"), F.desc_nulls_last("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("o_orderkey").alias("last_orderkey"),
            F.round("o_totalprice", 2).alias("last_order_total"),
        )
    )


# ---------------------------------------------------------------------------
# R10 — explode / posexplode
# ---------------------------------------------------------------------------


@register(
    "explode_positions",
    oracle="""
    SELECT vec_id, CAST(pos AS INT) AS pos, round(val, 4) AS val
    FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1     AS pos,
               unnest(CAST(embedding AS DOUBLE[]))       AS val
        FROM embeddings WHERE vec_id < 10
    )
    """,
)
def explode_positions(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    return e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).select("vec_id", "pos", F.round("v", 4).alias("val"))


# ---------------------------------------------------------------------------
# K4/K6 — Euclidean distance as pure SQL over array columns + top-k
# neighbors (brute-force similarity-search baseline)
# ---------------------------------------------------------------------------

_EUCLID = (
    "sqrt(aggregate(zip_with(a_emb, b_emb, (x, y) -> (x - y) * (x - y)), "
    "0D, (acc, v) -> acc + v))"
)


@register(
    "euclidean_knn",
    oracle="""
    SELECT vec_id, nn_id, CAST(rank AS INT) AS rank, dist
    FROM (
        SELECT a.vec_id, b.vec_id AS nn_id,
               round(list_distance(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) AS dist,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_distance(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                            b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 120 AND b.vec_id < 120
    ) WHERE rank <= 3
    """,
)
def euclidean_knn(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120)
    a = e.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("a_emb")
    )
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").cast("array<double>").alias("b_emb"),
    )
    pairs = a.join(F.broadcast(b), F.col("vec_id") != F.col("nn_id"))
    pairs = pairs.withColumn("d_raw", F.expr(_EUCLID))
    w = Window.partitionBy("vec_id").orderBy("d_raw", "nn_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("vec_id", "nn_id", "rank", F.round("d_raw", 4).alias("dist"))
    )


@register(
    "cosine_topk",
    oracle="""
    SELECT vec_id, nn_id, CAST(rank AS INT) AS rank, cos_sim
    FROM (
        SELECT a.vec_id, b.vec_id AS nn_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])) DESC,
                            b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 120 AND b.vec_id < 120
    ) WHERE rank <= 3
    """,
)
def cosine_topk(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120)
    a = e.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("a_emb")
    )
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").cast("array<double>").alias("b_emb"),
    )
    # norms hoisted to once per row (interpreted HOFs — see ann.py note)
    a = a.withColumn(
        "_an", F.expr("sqrt(aggregate(a_emb, 0D, (acc, v) -> acc + v * v))")
    )
    b = b.withColumn(
        "_bn", F.expr("sqrt(aggregate(b_emb, 0D, (acc, v) -> acc + v * v))")
    )
    dot = "aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    pairs = a.join(F.broadcast(b), F.col("vec_id") != F.col("nn_id")).withColumn(
        "c_raw", F.expr(f"({dot})") / (F.col("_an") * F.col("_bn"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_raw"), F.asc("nn_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("vec_id", "nn_id", "rank", F.round("c_raw", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# M7 — distance -> similarity transforms (pure SQL)
# ---------------------------------------------------------------------------


@register(
    "dist_to_similarity",
    oracle="""
    SELECT vec_id, nn_id,
           round(exp(-dist / 10.0), 4)                  AS sim_exp,
           round(exp(-(dist * dist) / 200.0), 4)        AS sim_gauss,
           round(1.0 / (1.0 + dist), 4)                 AS sim_recip
    FROM (
        SELECT a.vec_id, b.vec_id AS nn_id,
               list_distance(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) AS dist
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 60 AND b.vec_id < 60
    )
    """,
)
def dist_to_similarity(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 60)
    a = e.select("vec_id", F.col("embedding").cast("array<double>").alias("a_emb"))
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").cast("array<double>").alias("b_emb"),
    )
    pairs = a.join(F.broadcast(b), F.col("vec_id") < F.col("nn_id")).withColumn(
        "dist", F.expr(_EUCLID)
    )
    return pairs.select(
        "vec_id",
        "nn_id",
        F.round(F.exp(-F.col("dist") / 10.0), 4).alias("sim_exp"),
        F.round(F.exp(-(F.col("dist") ** 2) / 200.0), 4).alias("sim_gauss"),
        F.round(1.0 / (1.0 + F.col("dist")), 4).alias("sim_recip"),
    )


# ---------------------------------------------------------------------------
# K5 — LB_Kim lower bound, pure SQL (cheapest cascade stage)
# ---------------------------------------------------------------------------


@register(
    "lb_kim_pairs",
    oracle="""
    SELECT a.vec_id, b.vec_id AS nn_id,
           round(greatest(
               abs(a.embedding[1] - b.embedding[1]),
               abs(a.embedding[len(a.embedding)] - b.embedding[len(b.embedding)]),
               abs(list_min(a.embedding) - list_min(b.embedding)),
               abs(list_max(a.embedding) - list_max(b.embedding))
           ), 4) AS lb_kim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 60 AND b.vec_id < 60
    """,
)
def lb_kim_pairs(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings").where(F.col("vec_id") < 60)
    a = e.select("vec_id", F.col("embedding").cast("array<double>").alias("a_emb"))
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").cast("array<double>").alias("b_emb"),
    )
    lb = (
        "greatest("
        "abs(element_at(a_emb, 1) - element_at(b_emb, 1)), "
        "abs(element_at(a_emb, -1) - element_at(b_emb, -1)), "
        "abs(array_min(a_emb) - array_min(b_emb)), "
        "abs(array_max(a_emb) - array_max(b_emb)))"
    )
    return (
        a.join(F.broadcast(b), F.col("vec_id") < F.col("nn_id"))
        .withColumn("lb_kim", F.round(F.expr(lb), 4))
        .select("vec_id", "nn_id", "lb_kim")
    )


# ---------------------------------------------------------------------------
# S1/S3 — differencing + z-normalization as array SQL
# ---------------------------------------------------------------------------


@register(
    "znorm_stats",
    oracle="""
    SELECT vec_id,
           round(mu, 4)  AS mean_val,
           round(sigma, 4) AS std_val,
           round((CAST(embedding[1] AS DOUBLE) - mu) / sigma, 4) AS z0
    FROM (
        SELECT vec_id, embedding,
               list_sum(CAST(embedding AS DOUBLE[])) / len(embedding) AS mu,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                    x -> (x - list_sum(CAST(embedding AS DOUBLE[])) / len(embedding)) ^ 2))
                    / len(embedding)) AS sigma
        FROM embeddings WHERE vec_id < 100
    )
    """,
)
def znorm_stats(spark, sf_dir):
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    e = e.withColumn(
        "mu", F.expr("aggregate(emb, 0D, (a, x) -> a + x) / size(emb)")
    ).withColumn(
        "sigma",
        F.expr("sqrt(aggregate(emb, 0D, (a, x) -> a + (x - mu) * (x - mu)) / size(emb))"),
    )
    return e.select(
        "vec_id",
        F.round("mu", 4).alias("mean_val"),
        F.round("sigma", 4).alias("std_val"),
        F.round((F.expr("element_at(emb, 1)") - F.col("mu")) / F.col("sigma"), 4).alias(
            "z0"
        ),
    )


@register(
    "differencing",
    oracle="""
    SELECT vec_id,
           round(list_sum(list_transform(range(2, len(embedding) + 1),
                 i -> abs(CAST(embedding[i] AS DOUBLE) - CAST(embedding[i-1] AS DOUBLE)))), 4)
                 AS sum_abs_diff,
           round(CAST(embedding[2] AS DOUBLE) - CAST(embedding[1] AS DOUBLE), 4) AS d0
    FROM embeddings WHERE vec_id < 100
    """,
)
def differencing(spark, sf_dir):
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    diff = (
        "aggregate(zip_with(slice(emb, 2, size(emb) - 1), "
        "slice(emb, 1, size(emb) - 1), (x, y) -> abs(x - y)), 0D, (a, v) -> a + v)"
    )
    return e.select(
        "vec_id",
        F.round(F.expr(diff), 4).alias("sum_abs_diff"),
        F.round(
            F.expr("element_at(emb, 2) - element_at(emb, 1)"), 4
        ).alias("d0"),
    )


# ---------------------------------------------------------------------------
# R33 — semi-structured JSON extraction (schema-on-read over the raw
# `props` string column)
# ---------------------------------------------------------------------------


@register(
    "props_json_rollup",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
             AS n_distinct_k,
           round(sum(value), 6) AS sum_value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
)
def props_json_rollup(spark, sf_dir):
    """R33: schema-on-read over the raw JSON `props` column — extract
    $.k, bucket it, and roll up counts / int sums / distincts / value
    sums per (event_type, bucket). Spark parses with get_json_object
    inside codegen (no UDF); at scale the parse rides the scan
    projection and the only exchange is the map-side-combined rollup.
    Int64 throughout except the round-6 value sum."""
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.where(k.isNotNull())
        .groupBy(
            "event_type",
            F.expr(
                "CAST(get_json_object(props, '$.k') AS BIGINT) DIV 10"
            ).alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            F.countDistinct(k).alias("n_distinct_k"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# R35 — TPC-H Q17 shape: correlated scalar subquery decorrelated into a
# per-key aggregate join (small-quantity-order revenue)
# ---------------------------------------------------------------------------


@register(
    "small_qty_revenue",
    oracle="""
    WITH thresh AS (
      SELECT l_partkey,
             CAST(0.2 AS DOUBLE) * (sum(l_quantity) / count(*)) AS t,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           count(*) AS n_small,
           round(sum(l.l_extendedprice), 4) AS small_revenue,
           round(sum(l.l_extendedprice) / CAST(7 AS DOUBLE), 4)
             AS avg_yearly
    FROM lineitem l
    JOIN thresh th ON th.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < th.t
    GROUP BY p.p_brand
    """,
)
def small_qty_revenue(spark, sf_dir):
    """R35 (TPC-H Q17 shape): revenue locked in unusually small orders —
    the classic correlated scalar subquery (`l_quantity < 0.2 * avg per
    part`) written DECORRELATED: one map-side-combined per-part
    aggregate joined back (Catalyst plans the same decorrelation for
    the subquery form; stating it explicitly keeps the plan stable and
    the threshold reusable), then a broadcast part-dim join for the
    brand rollup. avg spelled sum/count so both engines build the
    identical float tree; round-4 outputs."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    thresh = li.groupBy("l_partkey").agg(
        (
            F.expr("CAST(0.2 AS DOUBLE)")
            * (F.sum("l_quantity") / F.count(F.lit(1)))
        ).alias("t")
    )
    return (
        li.join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("t"))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice"), 4).alias("small_revenue"),
            F.round(
                F.sum("l_extendedprice") / F.expr("CAST(7 AS DOUBLE)"), 4
            ).alias("avg_yearly"),
        )
    )
