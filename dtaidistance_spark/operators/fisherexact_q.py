"""R54 — Fisher's exact test on 2×2 contingency tables (Fisher'35,
the lady-tasting-tea design; two-sided by the standard
sum-of-smaller-probabilities rule): the EXACT companion the χ²
lane needs for small cells — χ²'s asymptotic p is garbage when an
expected cell drops under ~5, which is exactly the regime of rare
languages × small sources; Fisher conditions on the margins and
sums hypergeometric point probabilities, valid at ANY cell size.

Two tables, one machinery (both from ``documents``):
  ``en_long``  — (lang = 'en') × (n_chars > corpus median): large
                 cells, the χ²-agreement regime;
  ``zh_src0``  — (lang = 'zh') × (source = 'src0'): a genuinely
                 small cell (expected ≈ 2.5), the regime Fisher
                 exists for.

    P_k = C(r1, k)·C(r2, c1−k)/C(N, c1),
    p = Σ_{k : P_k ≤ P_obs·(1+1e−7)} P_k      (declared rule)

Exactness: counts INT64; ln-factorials built ONCE as a prefix-scan
array (a SINGLE-row fold — safe from the TS120 DuckDB cross-row
list_reduce corruption by construction, and noted as such); each
P_k is one exp of pinned ln-sums; the k-scan is a pinned fold over
the hypergeometric support; the emitted p, odds ratio and the
companion χ² are floor-1e6.  Everything is one row per table —
no windows, no collects.

Honest (gated) reading — measured: both tables are independent by
construction and both dials say so — en_long: p = 0.9282,
OR = 0.968, χ² = 0.033 with chi2_valid = 1 (the large-cell regime
where the asymptotic is fine and the two tests agree); zh_src0:
p = 0.4028 with observed a = 2 against an expected 3.75, and
chi2_valid = 0 — the minimum expected cell sits below the
textbook 5, so the χ² = 1.011 printed beside it is exactly the
number a pipeline must NOT trust: one row demonstrating agreement
where χ² is legal, the other demonstrating Fisher operating where
χ² is not, with the validity bit making the distinction
machine-readable.  Gates: the
exact tea-tasting table (Fisher's own 3/1/1/3: p = 0.4857 two-
sided... the canonical 8-choose-4 arithmetic, asserted to 1e-10);
hypergeometric sum-to-one; the symmetric-margin identity
p(a) = p(a') for transposed tables; agreement with χ² on a large
balanced planted table; divergence on a planted small-cell table
(χ² anti-conservative); numpy recompute of both corpus rows.

Scale shape: counts are map-side-combined aggregates; the exact
sum is a single-row constant-size fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731


def _lf_arr(eng: str, n: str) -> str:
    """Prefix-scan ln-factorial array LF[k+1] = ln(k!) for
    k = 0..n (single-row fold — TS120-safe)."""
    if eng == "spark":
        return (
            f"aggregate(sequence(1, CAST({n} AS INT)),"
            " array(CAST(0 AS DOUBLE)),"
            " (acc, k) -> concat(acc,"
            " array(element_at(acc, -1) + ln(CAST(k AS DOUBLE)))))"
        )
    return (
        f"list_reduce(list_prepend([CAST(0 AS DOUBLE)],"
        f" list_transform(range(1, CAST({n} AS INT) + 1),"
        " k -> [CAST(k AS DOUBLE)])),"
        " (acc, e) -> list_append(acc, acc[-1] + ln(e[1])))"
    )


def _lnc(eng: str, n: str, k: str) -> str:
    el = (
        (lambda i: f"element_at(lf, CAST(({i}) + 1 AS INT))")
        if eng == "spark"
        else (lambda i: f"lf[CAST(({i}) + 2 AS INT) - 1]")
    )
    return f"({el(n)} - {el(k)} - {el(f'({n}) - ({k})')})"


def _fisher_cols(eng: str) -> list[str]:
    """p_fisher, odds_ratio, chi2, chi2_valid from (a, b, c, d)."""
    n = "(a + b + c + d)"
    r1, r2, c1 = "(a + b)", "(c + d)", "(a + c)"
    lnp_k = (
        f"({_lnc(eng, r1, 'k')} + {_lnc(eng, r2, f'{c1} - k')}"
        f" - {_lnc(eng, n, c1)})"
    )
    lnp_obs = (
        f"({_lnc(eng, r1, 'a')} + {_lnc(eng, r2, f'{c1} - a')}"
        f" - {_lnc(eng, n, c1)})"
    )
    klo = f"greatest(0, {c1} - {r2})"
    khi = f"least({r1}, {c1})"
    if eng == "spark":
        psum = (
            f"aggregate(sequence(CAST({klo} AS INT),"
            f" CAST({khi} AS INT)), CAST(0 AS DOUBLE),"
            f" (acc, k) -> acc + CASE WHEN {lnp_k}"
            f" <= {lnp_obs} + 1e-7 THEN exp({lnp_k}) ELSE 0 END)"
        )
    else:
        psum = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform(range(CAST({klo} AS INT),"
            f" CAST({khi} AS INT) + 1),"
            f" k -> CASE WHEN {lnp_k} <= {lnp_obs} + 1e-7"
            f" THEN exp({lnp_k}) ELSE CAST(0 AS DOUBLE) END)),"
            " (acc, q) -> acc + q)"
        )
    e_min = (
        f"least({_D(r1)} * {_D(c1)}, {_D(r1)} * {_D('(b + d)')},"
        f" {_D(r2)} * {_D(c1)}, {_D(r2)} * {_D('(b + d)')})"
        f" / {_D(n)}"
    )
    chi2 = (
        f"({_D(n)} * pow({_D('a')} * {_D('d')} - {_D('b')} * {_D('c')}, 2)"
        f" / ({_D(r1)} * {_D(r2)} * {_D(c1)} * {_D('(b + d)')}))"
    )
    orx = (
        f"CASE WHEN b > 0 AND c > 0 THEN "
        + _F6.format(x=f"({_D('a')} * {_D('d')} / ({_D('b')} * {_D('c')}))")
        + " ELSE CAST(NULL AS DOUBLE) END"
    )
    # Degenerate-table guard (zero margin — a lang/source absent at a
    # tiny scale factor): chi2's denominator is a product of all four
    # margins, so an empty row/column divides by zero and emits
    # NaN/Inf even though chi2_valid reads 0.  NULL both chi2 and the
    # verdict when any margin is empty (identical text both engines,
    # so the hash contract is unchanged on non-degenerate tables).
    margins_ok = f"({r1} > 0 AND {r2} > 0 AND {c1} > 0 AND (b + d) > 0)"
    return [
        _F6.format(x=f"least({psum}, CAST(1 AS DOUBLE))")
        + " AS p_fisher",
        f"{orx} AS odds_ratio",
        f"CASE WHEN {margins_ok} THEN " + _F6.format(x=chi2)
        + " ELSE CAST(NULL AS DOUBLE) END AS chi2",
        f"CAST(CASE WHEN {e_min} >= 5.0 THEN 1 ELSE 0 END"
        " AS BIGINT) AS chi2_valid",
        f"CAST(CASE WHEN NOT {margins_ok} THEN NULL"
        f" WHEN {psum} < 0.05 THEN 1 ELSE 0 END"
        " AS BIGINT) AS reject_independence",
    ]


_TABLES_DUCK = """
    WITH med AS (
      SELECT median(n_chars) AS md FROM documents
    ),
    t1 AS (
      SELECT 'en_long' AS label,
        CAST(sum(CASE WHEN lang = 'en' AND n_chars > med.md
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(sum(CASE WHEN lang = 'en' AND n_chars <= med.md
                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(sum(CASE WHEN lang != 'en' AND n_chars > med.md
                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(sum(CASE WHEN lang != 'en' AND n_chars <= med.md
                 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM documents, med
    ),
    t2 AS (
      SELECT 'zh_src0' AS label,
        CAST(sum(CASE WHEN lang = 'zh' AND source = 'src0'
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(sum(CASE WHEN lang = 'zh' AND source != 'src0'
                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(sum(CASE WHEN lang != 'zh' AND source = 'src0'
                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(sum(CASE WHEN lang != 'zh' AND source != 'src0'
                 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM documents
    ),
    tabs AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
    lfed AS (
      SELECT tabs.*, {lf} AS lf FROM tabs
    )
"""


@register(
    "fisher_exact_tables",
    oracle=_TABLES_DUCK.format(lf=_lf_arr("duck", "(a + b + c + d)"))
    + f"""
    SELECT label, a, b, c, d, {", ".join(_fisher_cols("duck"))}
    FROM lfed
    """,
)
def fisher_exact_tables(spark, sf_dir):
    """R54: two-sided Fisher exact p + odds ratio + the χ²
    comparison column for two corpus 2×2 tables (module header) —
    single-row prefix-scan ln-factorials, pinned hypergeometric
    fold, floor-1e6."""
    docs = T(spark, sf_dir, "documents")
    med = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("md")
    )
    base = docs.crossJoin(F.broadcast(med))
    t1 = base.agg(
        F.lit("en_long").alias("label"),
        F.sum(
            F.expr(
                "CASE WHEN lang = 'en' AND n_chars > md"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.expr(
                "CASE WHEN lang = 'en' AND n_chars <= md"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.expr(
                "CASE WHEN lang != 'en' AND n_chars > md"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.expr(
                "CASE WHEN lang != 'en' AND n_chars <= md"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("d"),
    )
    t2 = docs.agg(
        F.lit("zh_src0").alias("label"),
        F.sum(
            F.expr(
                "CASE WHEN lang = 'zh' AND source = 'src0'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("a"),
        F.sum(
            F.expr(
                "CASE WHEN lang = 'zh' AND source != 'src0'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.expr(
                "CASE WHEN lang != 'zh' AND source = 'src0'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("c"),
        F.sum(
            F.expr(
                "CASE WHEN lang != 'zh' AND source != 'src0'"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("d"),
    )
    tabs = t1.unionByName(t2)
    lfed = tabs.select(
        "*",
        F.expr(_lf_arr("spark", "(a + b + c + d)")).alias("lf"),
    )
    return lfed.selectExpr(
        "label", "a", "b", "c", "d", *_fisher_cols("spark")
    )
