"""T72 — BLEU / ROUGE-N n-gram overlap scoring between token
sequences (Papineni ACL'02; Lin WAS'04): the standard
machine-translation / summarization overlap metrics, which in a
training-data pipeline serve as the GRADED contamination screen next
to the binary ones — MinHash finds near-copies, winnowing shared
spans, the AB matrix profile shared shapes; BLEU/ROUGE quantify
partial n-gram leakage between a candidate and a reference.

Two row kinds per query (128 rows total):
  * ``self_mut`` — candidate = the SAME doc with every 8th token
    deterministically bumped ((x+1) mod V): the positive control with
    known overlap structure (p₁ = 56/64 exactly; higher n decay as
    each mutation kills up to n grams).
  * ``cross`` — candidate = the consecutive doc: the null control;
    with V = 50257 and 64-token windows, cross-doc n-gram leakage is
    near zero (the honest corpus reading — synthetic docs don't leak).

Exactness: both sequences capped at L = 64.  n-grams (n ∈ {1, 2, 4})
pack into INT64 by base-V positional encoding (max 50257⁴ − 1 ≈
6.4e18 < 2⁶³ — the reason base is V, not 2¹⁶).  The CLIPPED overlap
Σ_g min(count_cand(g), count_ref(g)) is computed by the
occurrence-rank identity

    ov = Σ_i 1[ rank_i ≤ count_ref(g_i) ] ,
    rank_i = #{j ≤ i : g_j = g_i}

— for a gram with c_c candidate occurrences exactly the first
min(c_c, c_r) ranks pass — so every count is an int64 HOF
size(filter(...)) and no per-pair GROUP BY ever shuffles.  O(L²·3)
work per row, bounded by the cap.

BLEU here is the 3-gram-set variant exp(mean ln p_n), n ∈ {1,2,4}
(declared; the standard 4-mean needs p₃ too — omitted to keep the
tree small), × the brevity penalty (≡ 1 at equal caps, kept in the
tree and gated).  Standard convention: BLEU = 0 when any p_n = 0.
ROUGE-N recall shares the clipped numerator over reference gram
counts.  All floats ONE shared tree, floor-1e6.

Scale shape: ZERO exchanges beyond the broadcast consecutive-doc zip
join; per-row HOFs bounded by the 64 cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # 64 pairs → 128 rows (self_mut + cross per even doc)
_CAP = 64
_V = 50257

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _grams(eng: str, arr: str, n: int) -> str:
    """Packed n-gram array of ``arr`` (1-indexed, length _CAP)."""
    sp = eng == "spark"
    el = (lambda i: f"element_at({arr}, {i})") if sp else (
        lambda i: f"{arr}[{i}]"
    )
    packed = el("i")
    for k in range(1, n):
        packed = f"({packed}) * {_V} + {el(f'i + {k}')}"
    rng = (
        f"sequence(1, {_CAP - n + 1})"
        if sp
        else f"range(1, {_CAP - n + 2})"
    )
    tr = "transform" if sp else "list_transform"
    return f"{tr}({rng}, i -> CAST({packed} AS BIGINT))"


def _clip_ov(eng: str, gc: str, gr: str) -> str:
    """Σ_g min(c_cand, c_ref) via the occurrence-rank identity."""
    sp = eng == "spark"
    if sp:
        rank = (
            f"size(filter(slice({gc}, 1, i),"
            f" g -> g = element_at({gc}, i)))"
        )
        cref = f"size(filter({gr}, g -> g = element_at({gc}, i)))"
        return (
            f"aggregate(sequence(1, size({gc})), CAST(0 AS BIGINT),"
            f" (a, i) -> a + (CASE WHEN {rank} <= {cref}"
            f" THEN 1 ELSE 0 END))"
        )
    rank = f"len(list_filter(list_slice({gc}, 1, i), g -> g = {gc}[i]))"
    cref = f"len(list_filter({gr}, g -> g = {gc}[i]))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, len({gc}) + 1),"
        f" i -> CAST(CASE WHEN {rank} <= {cref}"
        f" THEN 1 ELSE 0 END AS BIGINT))), (a, q) -> a + q)"
    )


def _mut(eng: str, arr: str) -> str:
    """Every 8th token bumped: (x + 1) mod V at 1-indexed pos % 8 = 0."""
    if eng == "spark":
        return (
            f"transform({arr}, (x, j) -> CASE WHEN (j + 1) % 8 = 0"
            f" THEN (x + 1) % {_V} ELSE x END)"
        )
    return (
        f"list_transform(range(1, {_CAP} + 1),"
        f" j -> CASE WHEN j % 8 = 0"
        f" THEN ({arr}[j] + 1) % {_V} ELSE {arr}[j] END)"
    )


_DENS = {1: _CAP, 2: _CAP - 1, 4: _CAP - 3}

_P = {n: f"(CAST(ov{n} AS DOUBLE) / {float(_DENS[n])})" for n in (1, 2, 4)}

# equal caps ⇒ bp ≡ 1, kept for form (lc = lr = _CAP literals)
_BP = "(CASE WHEN 1.0 >= 1.0 THEN 1.0 ELSE exp(1.0 - 1.0) END)"

_BLEU = (
    "CASE WHEN ov1 > 0 AND ov2 > 0 AND ov4 > 0 THEN"
    f" exp((ln({_P[1]}) + ln({_P[2]}) + ln({_P[4]})) / 3.0) * {_BP}"
    " ELSE 0.0 END"
)


def _sql_tail() -> str:
    return (
        ", ".join(f"ov{n}" for n in (1, 2, 4))
        + ", "
        + ", ".join(
            _F6.format(x=_P[n]) + f" AS p{n}" for n in (1, 2, 4)
        )
        + f", {_F6.format(x=_P[1])} AS rouge1"
        + f", {_F6.format(x=_P[2])} AS rouge2"
        + f", {_F6.format(x=_BLEU)} AS bleu"
    )


@register(
    "bleu_rouge_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id, 'self_mut' AS kind,
             {_mut("duck", "a.v")} AS vc, a.v AS vr
      FROM docs a WHERE a.i % 2 = 0
      UNION ALL
      SELECT a.doc_id, 'cross' AS kind, b.v AS vc, a.v AS vr
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    ),
    gr AS (
      SELECT doc_id, kind,
             {", ".join(f"{_grams('duck', s, n)} AS g{s[1]}{n}"
                        for s in ("vc", "vr") for n in (1, 2, 4))}
      FROM prs
    ),
    ov AS (
      SELECT doc_id, kind,
             {", ".join(
                 f"CAST({_clip_ov('duck', f'gc{n}', f'gr{n}')}"
                 f" AS BIGINT) AS ov{n}"
                 for n in (1, 2, 4))}
      FROM gr
    )
    SELECT doc_id, kind, {_sql_tail()}
    FROM ov
    """,
)
def bleu_rouge_pairs(spark, sf_dir):
    """T72: clipped BLEU/ROUGE n-gram overlap, self-mutation positive
    control + cross-doc null control (module header) — base-V packed
    int64 grams, occurrence-rank clipping (no per-pair GROUP BY),
    shared float trees, floor-1e6."""
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}),"
            f" x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    a = docs.where(F.col("i") % 2 == 0)
    self_mut = a.selectExpr(
        "doc_id",
        "'self_mut' AS kind",
        f"{_mut('spark', 'v')} AS vc",
        "v AS vr",
    )
    b = docs.select(
        (F.col("i") - 1).alias("i"),
        F.col("v").alias("vb"),
    )
    cross = (
        a.join(F.broadcast(b), "i")
        .selectExpr("doc_id", "'cross' AS kind", "vb AS vc", "v AS vr")
    )
    prs = self_mut.unionByName(cross)
    gr = prs.select(
        "doc_id",
        "kind",
        *[
            F.expr(_grams("spark", s, n)).alias(f"g{s[1]}{n}")
            for s in ("vc", "vr")
            for n in (1, 2, 4)
        ],
    )
    ov = gr.select(
        "doc_id",
        "kind",
        *[
            F.expr(_clip_ov("spark", f"gc{n}", f"gr{n}"))
            .cast("long")
            .alias(f"ov{n}")
            for n in (1, 2, 4)
        ],
    )
    return ov.select(
        "doc_id",
        "kind",
        "ov1",
        "ov2",
        "ov4",
        *[F.expr(_F6.format(x=_P[n])).alias(f"p{n}") for n in (1, 2, 4)],
        F.expr(_F6.format(x=_P[1])).alias("rouge1"),
        F.expr(_F6.format(x=_P[2])).alias("rouge2"),
        F.expr(_F6.format(x=_BLEU)).alias("bleu"),
    )
