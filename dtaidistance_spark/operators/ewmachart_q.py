"""TS51 — EWMA control chart (Roberts Technometrics'59;
Lucas-Saccucci'90 — the small-shift SPC detector every monitoring
stack ships next to CUSUM): per event type, the daily-mean series
monitored with z_t = λ·x_t + (1−λ)·z_{t−1}, z₀ = μ₀, against the
time-varying limits μ₀ ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})) at λ = 1/4,
L = 3.  Complements TS38/TS49 (forecast accuracy/intervals) with the
monitoring verdict: WHICH days are out of control.

Exactness: daily means floored first (the TS38 precedent); each
type's series is collected into ONE day-sorted array, so every
downstream number — μ₀ and σ (population, from order-pinned Σ/Σx²
folds), the EWMA sequence (computed per position t by a direct
O(t) fold of β^{t−k} terms — n ≤ 60 days, so O(n²) is bounded), and
the limit trees — is an order-pinned per-row computation with NO
float aggregate anywhere.  λ = 1/4 and β = 3/4 are exact in binary;
β^k via pow under the libm-ulp precedent.  All floats floor-1e6,
verdicts integer.

Scale shape: one (event_type) exchange for the collect; everything
after is per-row HOFs over ≤ 60-element arrays — per-key state
bounded by the chart window, the SPC deployment shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_LAM = "CAST(0.25 AS DOUBLE)"
_BET = "CAST(0.75 AS DOUBLE)"
_L = "CAST(3 AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.siz = "size" if self.sp else "len"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        return f"sequence(0, ({n}) - 1)" if self.sp else f"range({n})"

    def ffold(self, arr: str) -> str:
        if self.sp:
            return (
                f"aggregate({arr}, CAST(0 AS DOUBLE), (a, x) -> a + x)"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {arr}),"
            f" (a, x) -> a + x)"
        )


def _stats(e: _E) -> dict[str, str]:
    n = f"{e.siz}(xs)"
    s = e.ffold("xs")
    q = e.ffold(f"{e.tr}(xs, x -> x * x)")
    return {
        "n_days": f"CAST({n} AS BIGINT)",
        "mu": f"({s}) / CAST({n} AS DOUBLE)",
        "sigma": (
            f"sqrt(greatest(({q}) / CAST({n} AS DOUBLE)"
            f" - (({s}) / CAST({n} AS DOUBLE))"
            f" * (({s}) / CAST({n} AS DOUBLE)), CAST(0 AS DOUBLE)))"
        ),
    }


def _z_arr(e: _E) -> str:
    """EWMA sequence: z_t = β^(t+1)·μ + λ·Σ_{k=0..t} β^(t−k)·x_{k+1}
    (0-based positions; z before any data is μ)."""
    inner = e.ffold(
        f"{e.tr}({e.seq0('t + 1')}, k ->"
        f" pow({_BET}, CAST(t - k AS DOUBLE))"
        f" * {e.el('xs', 'k + 1')})"
    )
    return (
        f"{e.tr}({e.seq0(f'{e.siz}(xs)')}, t ->"
        f" pow({_BET}, CAST(t + 1 AS DOUBLE)) * mu"
        f" + {_LAM} * ({inner}))"
    )


def _lim(e: _E, sign: str) -> str:
    """UCL/LCL array at each position t."""
    half = (
        f"{_L} * sigma * sqrt({_LAM} / (CAST(2 AS DOUBLE) - {_LAM})"
        f" * (CAST(1 AS DOUBLE)"
        f" - pow({_BET}, CAST(2 * (t + 1) AS DOUBLE))))"
    )
    return (
        f"{e.tr}({e.seq0(f'{e.siz}(xs)')}, t -> mu {sign} {half})"
    )


@register(
    "ewma_control_chart",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             {_F6.format(x="(sum(value) / CAST(count(*) AS DOUBLE))")}
               AS dm
      FROM events GROUP BY 1, 2
    ),
    packed AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(dm ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    st AS (
      SELECT event_type, days, xs,
             {", ".join(f"{x} AS {k}" for k, x in _stats(_E('duck')).items())}
      FROM packed
    ),
    zz AS (
      SELECT event_type, days, xs, n_days, mu, sigma,
             {_z_arr(_E('duck'))} AS zs,
             {_lim(_E('duck'), '+')} AS ucls,
             {_lim(_E('duck'), '-')} AS lcls
      FROM st
    ),
    ex AS (
      SELECT event_type, n_days, t.i AS idx,
             days[t.i + 1] AS day, xs[t.i + 1] AS dm,
             zs[t.i + 1] AS z, ucls[t.i + 1] AS ucl,
             lcls[t.i + 1] AS lcl
      FROM zz, unnest(range(len(xs))) AS t(i)
    )
    SELECT event_type, CAST(day AS BIGINT) AS day, n_days, dm,
           {_F6.format(x="z")} AS z,
           {_F6.format(x="ucl")} AS ucl,
           {_F6.format(x="lcl")} AS lcl,
           CAST(CASE WHEN z > ucl OR z < lcl THEN 1 ELSE 0 END
             AS BIGINT) AS oob
    FROM ex
    """,
)
def ewma_control_chart(spark, sf_dir):
    """TS51: EWMA control chart per event type (module header) —
    day-sorted array collect, order-pinned μ/σ folds, the EWMA
    sequence by bounded O(n²) per-position folds, ±3σ_z(t) limits,
    integer out-of-control verdicts; floats floor-1e6."""
    e = _E("spark")
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            ).alias("day"),
        )
        .agg(
            F.expr(
                _F6.format(x="(sum(value) / CAST(count(1) AS DOUBLE))")
            ).alias("dm")
        )
    )
    packed = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, dm))),"
            " p -> p.day)"
        ).alias("days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, dm))),"
            " p -> p.dm)"
        ).alias("xs"),
    )
    st = packed.select(
        "event_type",
        "days",
        "xs",
        *[F.expr(x).alias(k) for k, x in _stats(e).items()],
    )
    zz = st.select(
        "event_type",
        "days",
        "xs",
        "n_days",
        "mu",
        "sigma",
        F.expr(_z_arr(e)).alias("zs"),
        F.expr(_lim(e, "+")).alias("ucls"),
        F.expr(_lim(e, "-")).alias("lcls"),
    )
    ex = zz.select(
        "event_type",
        "n_days",
        F.posexplode("xs").alias("idx", "dm"),
        "days",
        "zs",
        "ucls",
        "lcls",
    ).select(
        "event_type",
        "n_days",
        F.expr("CAST(element_at(days, idx + 1) AS BIGINT)").alias("day"),
        "dm",
        F.expr("element_at(zs, idx + 1)").alias("z0"),
        F.expr("element_at(ucls, idx + 1)").alias("ucl0"),
        F.expr("element_at(lcls, idx + 1)").alias("lcl0"),
    )
    return ex.select(
        "event_type",
        "day",
        "n_days",
        "dm",
        F.expr(_F6.format(x="z0")).alias("z"),
        F.expr(_F6.format(x="ucl0")).alias("ucl"),
        F.expr(_F6.format(x="lcl0")).alias("lcl"),
        F.expr(
            "CAST(CASE WHEN z0 > ucl0 OR z0 < lcl0 THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("oob"),
    )
