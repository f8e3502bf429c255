"""T65 — token-stream edit distance (Levenshtein) fuzzy-dup tier: the
character-level workhorse of fuzzy deduplication (RETSim/OSCAR-style
pipelines run edit-similarity on candidate pairs) — here over token
streams rendered as strings so BOTH engines' built-in ``levenshtein``
(unit-cost insert/delete/substitute, JVM-side in Spark) computes the
IDENTICAL integer.

Rendering: each token maps to one printable char (fold 64, chr(33+f))
over the first 256 tokens — a 64-symbol alphabet keeps the fold dense
while the 256 cap bounds the O(L²) DP.  Both engines agree on chr()
for ASCII 33..96 and on Levenshtein semantics, so ``edit_dist`` is
int64-exact; ``edit_sim`` = 1 − d/max(L_a, L_b) is one floor-1e6
float.

Pair population (planted, deterministic): each of the 64 sample docs
against (a) its 8-substitution twin (positions 0..7 shifted +1 mod
vocab — edit distance ≤ 8, and = 8 whenever the fold actually moves,
asserted), and (b) its successor doc (unrelated — distance near the
string length).  The separation IS the operator's value and is gated.

Scale shape: candidate pairs come from the LSH stack at corpus scale
(this is a SCORER, like T61); the rendering is scan-side, the DP is
per-pair JVM code with zero shuffles beyond the 64-row broadcast pair
build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 64
_CAP = 256
_MOD = 64
_NEDIT = 8

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _render(eng: str, toks: str) -> str:
    if eng == "spark":
        return (
            f"concat_ws('', transform(slice({toks}, 1, {_CAP}),"
            f" t -> char(33 + t % {_MOD})))"
        )
    return (
        f"list_aggregate(list_transform(list_slice({toks}, 1, {_CAP}),"
        f" t -> chr(CAST(33 + t % {_MOD} AS INT))), 'string_agg', '')"
    )


def _twin(eng: str) -> str:
    """Tokens with positions 0..7 substituted (t+1 mod 50257)."""
    if eng == "spark":
        return (
            f"transform(sequence(0, n_tok - 1), i -> CASE WHEN i < {_NEDIT}"
            f" THEN CAST((element_at(tokens, i + 1) + 1) % 50257 AS INT)"
            f" ELSE element_at(tokens, i + 1) END)"
        )
    return (
        f"list_transform(range(n_tok), i -> CASE WHEN i < {_NEDIT}"
        f" THEN (tokens[i + 1] + 1) % 50257"
        f" ELSE tokens[i + 1] END)"
    )


_SIM = (
    "(CAST(1 AS DOUBLE) - CAST(edit_dist AS DOUBLE)"
    " / CAST(greatest(la, lb) AS DOUBLE))"
)


@register(
    "edit_distance_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , bse AS (
      SELECT doc_id, CAST(substr(doc_id, 4, 12) AS BIGINT) AS i,
             {_render('duck', 'tokens')} AS s,
             {_render('duck', _twin('duck'))} AS s_twin
      FROM synth
    ),
    prs AS (
      SELECT doc_id AS doc_a, doc_id || '_tw' AS doc_b,
             'twin' AS pair_kind, s AS sa, s_twin AS sb
      FROM bse
      UNION ALL
      SELECT a.doc_id, b.doc_id, 'unrelated', a.s, b.s
      FROM bse a JOIN bse b ON b.i = a.i + 1
    ),
    d AS (
      SELECT doc_a, doc_b, pair_kind,
             CAST(length(sa) AS BIGINT) AS la,
             CAST(length(sb) AS BIGINT) AS lb,
             CAST(levenshtein(sa, sb) AS BIGINT) AS edit_dist
      FROM prs
    )
    SELECT doc_a, doc_b, pair_kind, la, lb, edit_dist,
           {_F6.format(x=_SIM)} AS edit_sim
    FROM d
    """,
)
def edit_distance_pairs(spark, sf_dir):
    """T65: Levenshtein fuzzy-dup scoring over char-rendered token
    streams (module header) — built-in JVM levenshtein, int64 exact;
    twin pairs (8 substitutions) vs unrelated successor pairs, with
    the separation gated in pytest."""
    docs = synth.sequences_df(spark, _ND).select(
        "doc_id",
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "n_tok",
        "tokens",
    )
    base = docs.select(
        "doc_id",
        "i",
        F.expr(_render("spark", "tokens")).alias("s"),
        F.expr(_render("spark", _twin("spark"))).alias("s_twin"),
    )
    twins = base.select(
        F.col("doc_id").alias("doc_a"),
        F.concat(F.col("doc_id"), F.lit("_tw")).alias("doc_b"),
        F.lit("twin").alias("pair_kind"),
        F.col("s").alias("sa"),
        F.col("s_twin").alias("sb"),
    )
    b2 = base.select(
        F.col("doc_id").alias("doc_b2"),
        (F.col("i") - 1).alias("i"),
        F.col("s").alias("sb"),
    )
    unrel = (
        base.join(F.broadcast(b2), "i")
        .select(
            F.col("doc_id").alias("doc_a"),
            F.col("doc_b2").alias("doc_b"),
            F.lit("unrelated").alias("pair_kind"),
            F.col("s").alias("sa"),
            "sb",
        )
    )
    prs = twins.unionByName(unrel)
    d = prs.select(
        "doc_a",
        "doc_b",
        "pair_kind",
        F.length("sa").cast("long").alias("la"),
        F.length("sb").cast("long").alias("lb"),
        F.levenshtein("sa", "sb").cast("long").alias("edit_dist"),
    )
    return d.select(
        "*", F.expr(_F6.format(x=_SIM)).alias("edit_sim")
    )
