"""R39/TS50 — two completions of existing families:

R39 ``revenue_grouping_sets``: arbitrary GROUPING SETS — the one
multi-dimensional aggregation shape the inventory lacked next to R7's
ROLLUP and CUBE (rollup = prefixes, cube = all subsets; GROUPING SETS
= an explicit, non-hierarchical list).  Sets: (nation, year), (year),
(nation), () over order revenue.  Spark's SQL ``GROUPING SETS`` and
DuckDB's agree on the NULL-marker convention; ``grouping_id()`` is
emitted so all-rows and NULL-key rows are distinguishable.  Money
round(2); one shuffle (Expand feeds a single hash aggregate).

TS50 ``markov_entropy_rate``: the entropy rate of the R34 event-type
Markov chain — H = −Σ_s π_s Σ_t p(t|s)·ln p(t|s), the
bits-per-transition compressibility of user behavior (Shannon; cover
standard).  All transition counts int64 (the R34 machinery); each
state's inner Σ is an ORDER-PINNED fold over its (target-sorted)
count array, and the outer Σ over states is a second order-pinned
fold over the state-sorted array — no float aggregate anywhere, so
the result is bit-exact (floor-1e6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "revenue_grouping_sets",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           CAST(grouping(n.n_name) * 2 + grouping(year(o.o_orderdate))
             AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY GROUPING SETS ((n.n_name, year(o.o_orderdate)),
                            (year(o.o_orderdate)), (n.n_name), ())
    """,
)
def revenue_grouping_sets(spark, sf_dir):
    """R39: explicit GROUPING SETS aggregation (module header) — four
    declared sets in ONE pass (Expand + single hash aggregate),
    grouping_id distinguishes marker NULLs, dims broadcast."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr0"),
            "o_totalprice",
        )
    )
    j.createOrReplaceTempView("_gs_rev")
    return spark.sql(
        """
        SELECT nation,
               CAST(yr0 AS BIGINT) AS yr,
               CAST(grouping(nation) * 2 + grouping(yr0) AS BIGINT)
                 AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM _gs_rev
        GROUP BY GROUPING SETS ((nation, yr0), (yr0), (nation), ())
        """
    )


# ---------------------------------------------------------------------------
# TS50 — Markov-chain entropy rate over event-type transitions
# ---------------------------------------------------------------------------


def _fold_sum(eng: str, arr: str, body: str) -> str:
    """Order-pinned double fold Σ over elements z of ``arr``."""
    if eng == "spark":
        return (
            f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, z) ->"
            f" acc + ({body}))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform({arr}, z -> ({body}))), (acc, x) -> acc + x)"
    )


# per-transition term inside a state: z = (tt, c); cs is the state total
_H_TERM = (
    "CASE WHEN {c} > 0 THEN -(CAST({c} AS DOUBLE) / CAST(cs AS DOUBLE))"
    " * ln(CAST({c} AS DOUBLE) / CAST(cs AS DOUBLE))"
    " ELSE CAST(0 AS DOUBLE) END"
)

# outer term: z = (s, cs, h); n_total is the grand transition count
_RATE_TERM = (
    "(CAST({cs} AS DOUBLE) / CAST(n_total AS DOUBLE)) * {h}"
)


@register(
    "markov_entropy_rate",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
      FROM events
    ),
    o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY tu, event_id) AS nxt
      FROM s
    ),
    tr AS (
      SELECT event_type AS src, nxt AS dst,
             CAST(count(*) AS BIGINT) AS c
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    st AS (
      SELECT src, CAST(sum(c) AS BIGINT) AS cs,
             list(c ORDER BY dst) AS cl
      FROM tr GROUP BY src
    ),
    hs AS (
      SELECT src, cs,
             """
    + _fold_sum("duck", "cl", _H_TERM.format(c="z"))
    + """ AS h_raw
      FROM st
    ),
    packed AS (
      SELECT CAST(sum(cs) AS BIGINT) AS n_total,
             list(cs ORDER BY src) AS csl,
             list(h_raw ORDER BY src) AS hl,
             list(src ORDER BY src) AS sl
      FROM hs
    ),
    rate AS (
      SELECT n_total,
             """
    + _fold_sum(
        "duck",
        "list_transform(range(len(csl)), k -> [CAST(csl[k + 1] AS DOUBLE), hl[k + 1]])",
        _RATE_TERM.format(cs="z[1]", h="z[2]"),
    )
    + """ AS rate_raw
      FROM packed
    )
    SELECT hs.src, hs.cs,
           """
    + f"{_F6.format(x='hs.h_raw')} AS h_state,"
    + f" rate.n_total, {_F6.format(x='rate.rate_raw')} AS entropy_rate"
    + """
    FROM hs, rate
    """,
)
def markov_entropy_rate(spark, sf_dir):
    """TS50: entropy rate of the event-type Markov chain (module
    header) — transition counts int64 under the (tu, event_id) total
    order, per-state entropy as an order-pinned fold over the
    target-sorted count array, the π-weighted rate as a second
    order-pinned fold over the state-sorted arrays; floor-1e6."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tu"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    o = ev.withColumn("nxt", F.lead("event_type").over(w))
    tr = (
        o.where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    st = tr.groupBy("src").agg(
        F.sum("c").cast("long").alias("cs"),
        F.expr(
            "transform(array_sort(collect_list(struct(dst, c AS cc))),"
            " z -> z.cc)"
        ).alias("cl"),
    )
    hs = st.select(
        "src",
        "cs",
        F.expr(
            _fold_sum("spark", "cl", _H_TERM.format(c="z"))
        ).alias("h_raw"),
    )
    packed = hs.groupBy().agg(
        F.sum("cs").cast("long").alias("n_total"),
        F.expr(
            "transform(array_sort(collect_list("
            "struct(src, cs AS c1, h_raw AS h1))),"
            " z -> array(CAST(z.c1 AS DOUBLE), z.h1))"
        ).alias("pl"),
    )
    rate = packed.select(
        "n_total",
        F.expr(
            _fold_sum(
                "spark",
                "pl",
                _RATE_TERM.format(
                    c="z", cs="element_at(z, 1)", h="element_at(z, 2)"
                ),
            )
        ).alias("rate_raw"),
    )
    return hs.crossJoin(F.broadcast(rate)).select(
        "src",
        "cs",
        F.expr(_F6.format(x="h_raw")).alias("h_state"),
        "n_total",
        F.expr(_F6.format(x="rate_raw")).alias("entropy_rate"),
    )
