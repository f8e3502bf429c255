"""TS99 — Population Stability Index between the first and second
half-month of event values, per event type (the banking/ML-ops
standard drift metric; symmetrized KL on binned distributions —
Kullback–Leibler'51 in the B-vs-A + A-vs-B sum the scorecard
literature canonized; thresholds 0.10/0.25 per Siddiqi'06): the
drift dial a serving pipeline reads per feature per window —
TS97 asks whether arrival TIMING is Poisson; PSI asks whether the
VALUE distribution an hour/model was calibrated on is still the
distribution arriving now.

    PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)   ≥ 0,

p = first-half proportions, q = second-half, over the 10 DECILE
bins of the FULL-month per-type cents distribution (bin edges =
exact order statistics b_k = sorted[⌈k·n/10⌉], the T43 positional
convention — approx_percentile is the declared scale path, exact
order stats the verification tier), bin = 1 + Σ_k [cents > b_k];
the calendar split is min-day + 15 days (declared); every bin
enters the sum with counts floored at 0.5 (the standard PSI
zero-cell guard, declared) so empty-vs-occupied still scores.

Exactness: cents, bin assignments, and per-half bin counts are
exact INT64 end to end (ties merge duplicate edges into fewer
occupied bins — declared, the floor handles the vacated ones);
the 10-term PSI sum folds in pinned bin order as ONE shared
double tree of ln's; floor-1e6; verdict 0/1/2 at the canonical
0.10/0.25 lines.

Honest (gated) reading — measured at BOTH scales, and the
small-sample half is the textbook trap demonstrated live: at
sf0.01 (~1000/half) all five types read stable (PSI 0.0076–0.0379
vs a null floor (B−1)(1/n₁+1/n₂) ≈ 0.018; verdict 0 across the
board — no drift, said quietly), but at sf0.001 (~100/half) the
SAME generator fires verdict 1–2 on four of five types (PSI
0.071–0.388) purely from sampling noise — exactly as the emitted
`psi_null_floor` predicts (≈ 0.18 there): the canonical 0.10/0.25
lines sit INSIDE the noise floor at n = 100, which is why the
floor is an output column and why PSI without a sample-size check
is an alarm that pages on healthy streams.  Both scale readings
gated; the discriminating controls live in pytest: a planted
second-half mean shift crosses 0.25 decisively at large n, and
the LCG split-half null sits at the predicted floor across n.

Scale shape: one map-side-combined (type, bin, half) count after a
broadcast of the 9-edge-per-type table; the exact-decile edge
derivation is the declared small-collect verification tier
(per-type sorted array), replaced by approx_percentile at corpus
scale with identical downstream algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_BINS = 10

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# per-bin floored proportions and the PSI fold (pinned bin order);
# c1_<b>/c2_<b> are the per-bin half counts, t1/t2 the half totals
_TERM = (
    "((greatest({c1}, CAST(0.5 AS DOUBLE)) / {t1}"
    " - greatest({c2}, CAST(0.5 AS DOUBLE)) / {t2})"
    " * ln((greatest({c1}, CAST(0.5 AS DOUBLE)) / {t1})"
    " / (greatest({c2}, CAST(0.5 AS DOUBLE)) / {t2})))"
)


def _psi_expr() -> str:
    terms = [
        _TERM.format(
            c1=_D(f"c1_{b}"), c2=_D(f"c2_{b}"),
            t1=_D("t1"), t2=_D("t2"),
        )
        for b in range(1, _BINS + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def _bin_cols() -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN bin = {b} AND half = 1 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c1_{b},"
        f" CAST(SUM(CASE WHEN bin = {b} AND half = 2 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c2_{b}"
        for b in range(1, _BINS + 1)
    )


# E[PSI | no drift] ~ (B-1)(1/n1 + 1/n2) (the chi2 expectation of the
# symmetrized divergence) - emitted so the reader can see when the
# canonical 0.10/0.25 lines are INSIDE the sampling-noise floor
_NULL_PSI = (
    f"(CAST({_BINS} - 1 AS DOUBLE)"
    f" * (CAST(1 AS DOUBLE) / {_D('t1')}"
    f" + CAST(1 AS DOUBLE) / {_D('t2')}))"
)

_VERDICT = (
    f"CAST(CASE WHEN {{psi}} > 0.25 THEN 2"
    f" WHEN {{psi}} > 0.10 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "psi_value_drift",
    oracle=f"""
    WITH mid AS (
      SELECT date_trunc('day', min(ts)) + INTERVAL 15 DAY AS m
      FROM events
    ),
    ev AS (
      SELECT event_type,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents,
             CASE WHEN ts < (SELECT m FROM mid) THEN 1 ELSE 2 END
               AS half
      FROM events
    ),
    edges AS (
      SELECT event_type, list_sort(list(cents)) AS sv,
             CAST(count(*) AS BIGINT) AS n
      FROM ev GROUP BY event_type
    ),
    bp AS (
      SELECT event_type,
             list_transform(range(1, {_BINS}),
               k -> sv[CAST(ceil(k * n / {_BINS}.0) AS BIGINT)]) AS b
      FROM edges
    ),
    binned AS (
      SELECT ev.event_type, ev.half,
             1 + list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(bp.b, e ->
                     CASE WHEN ev.cents > e THEN CAST(1 AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END)),
                   (a, x) -> a + x) AS bin
      FROM ev JOIN bp ON ev.event_type = bp.event_type
    ),
    counted AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS t1,
             CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS t2,
             {_bin_cols()}
      FROM binned GROUP BY event_type
    )
    SELECT event_type, t1, t2,
           {_F6.format(x=_psi_expr())} AS psi,
           {_F6.format(x=_NULL_PSI)} AS psi_null_floor,
           {_VERDICT.format(psi=_psi_expr())} AS drift_verdict
    FROM counted
    """,
)
def psi_value_drift(spark, sf_dir):
    """TS99: PSI between half-months over full-month decile bins per
    event type (module header) — exact positional edges, int64 bin
    counts, pinned-order 10-term ln tree, floor-1e6."""
    ev_raw = T(spark, sf_dir, "events")
    mid = ev_raw.agg(
        F.expr(
            "date_trunc('day', min(ts)) + INTERVAL 15 DAY"
        ).alias("m")
    )
    ev = ev_raw.crossJoin(F.broadcast(mid)).selectExpr(
        "event_type",
        "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents",
        "CASE WHEN ts < m THEN 1 ELSE 2 END AS half",
    )
    bp = (
        ev.groupBy("event_type")
        .agg(
            F.expr("array_sort(collect_list(cents))").alias("sv"),
            F.count("*").cast("long").alias("n"),
        )
        .selectExpr(
            "event_type",
            f"transform(sequence(1, {_BINS - 1}), k ->"
            f" element_at(sv, CAST(ceil(k * n / {_BINS}.0) AS INT)))"
            " AS b",
        )
    )
    binned = ev.join(F.broadcast(bp), "event_type").selectExpr(
        "event_type",
        "half",
        "1 + aggregate(transform(b, e -> CASE WHEN cents > e THEN"
        " CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (a, x) -> a + x) AS bin",
    )
    counted = binned.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("t1"),
        F.expr(
            "CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("t2"),
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN bin = {b} AND half = {h}"
                f" THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"c{h}_{b}")
            for b in range(1, _BINS + 1)
            for h in (1, 2)
        ],
    )
    return counted.selectExpr(
        "event_type",
        "t1",
        "t2",
        _F6.format(x=_psi_expr()) + " AS psi",
        _F6.format(x=_NULL_PSI) + " AS psi_null_floor",
        _VERDICT.format(psi=_psi_expr()) + " AS drift_verdict",
    )
