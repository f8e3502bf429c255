"""T97 — repetition-loop screen over token tails (the
degenerate-generation filter: neural text decoders collapse into
exact short cycles — Holtzman ICLR'20's neural text degeneration —
and synthetic/self-instruct corpora must screen generated samples
for it before training; n-gram repetition dials like T14b catch
REPEATED PHRASES anywhere, this one catches the sharper pathology of
an exactly periodic TAIL): over the LAST W = 64 tokens of each doc,
for every candidate period p = 1..63 count the mismatches

    mism(p) = |{ i ∈ [p, W) : t[i] ≠ t[i−p] }|

and emit the smallest p with mism(p) = 0 (``loop_period``, NULL when
the tail is not exactly periodic), plus the best NEAR-loop reading:
argmin_p of the mismatch RATE mism(p)/(W−p) with ties to the
smallest p, and that minimal rate.  All counts are integer HOF
filters; the rate array is doubles with argmin-by-position (both
engines match the identical double via list/array position), rate
floor-1e6.  Tail slice via the documented cross-engine idiom (Spark
``slice(v, s, 64)`` = count, DuckDB ``list_slice(v, s, e)`` =
inclusive range — hazard list #5).

Honest (gated) reading — measured: the generator is tokens =
(hm·(j+1) + 1000·sin(2πj/64 + ph)) mod 50257 with 50257 PRIME, so
an exact tail period p would require hm·p ≡ 0 (mod 50257) ⇒ hm ≡ 0,
and NO corpus doc draws hm = 0 — the organic corpus is completely
clean, and more than clean: the unplanted best_rate median is
EXACTLY 1.0 at best_period 1 (mod-50257 values virtually never
coincide by accident, so every period's mismatch rate saturates and
the argmin tie-breaks to p = 1) — rotations are not even
near-misses, precisely the separation a degeneracy screen must make
(repetition dials read these docs "repetitive"; the loop screen
correctly reads them loop-free).  The firing path is exercised IN
the artifact by the deterministic plant (the TS3/T24 precedent):
every 50th doc's window is overwritten with an exact 3-cycle of its
own first three tokens, and the screen flags exactly those 11 docs,
all at loop_period = 3.  Gates: numpy recompute per sampled doc
(plant semantics included); a planted ONE-token-broken cycle NOT
flagged but read at best_rate ≈ 1/(W−p); the flagged-set ≡
planted-set identity; short-window handling; corpus pins.

Scale shape: ZERO exchanges — bounded per-row HOF work (63 periods
× ≤ 63 checks), a pure map job over the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_W = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _exprs(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    if sp:
        tail = f"slice(tokens, CAST(greatest(1, n - {_W} + 1) AS INT), {_W})"
        # empty-guarded: Spark sequence(lo, lo-1) is the DESCENDING
        # [lo, lo-1] where DuckDB range is empty — slice to the exact
        # non-negative count so a 1-token window yields [] not [1, 0]
        seq = lambda lo, hi: (  # noqa: E731
            f"slice(sequence({lo}, greatest({hi}, {lo})),"
            f" 1, CAST(greatest(({hi}) - ({lo}) + 1, 0) AS INT))"
        )
        tr, fil, siz = "transform", "filter", "size"
        pos = lambda arr, x: f"array_position({arr}, {x})"  # noqa: E731
        amin = lambda arr: f"array_min({arr})"  # noqa: E731
    else:
        tail = f"list_slice(tokens, greatest(1, n - {_W} + 1), n)"
        seq = lambda lo, hi: f"range({lo}, ({hi}) + 1)"  # noqa: E731
        tr, fil, siz = "list_transform", "list_filter", "len"
        pos = lambda arr, x: f"list_position({arr}, {x})"  # noqa: E731
        amin = lambda arr: f"list_min({arr})"  # noqa: E731
    # deterministic in-query plant (the TS3/T24 precedent: the firing
    # path must be exercised in the driver artifact, not only in
    # pytest): every 50th doc's window is overwritten with an exact
    # 3-cycle of its own first three tokens
    if sp:
        inj = (
            "CASE WHEN CAST(substr(doc_id, 4, 12) AS INT) % 50 = 0 THEN"
            " transform(slice(sequence(0, greatest(size(w) - 1, 0)),"
            " 1, size(w)),"
            " i -> element_at(w, pmod(i, 3) + 1)) ELSE w END"
        )
    else:
        inj = (
            "CASE WHEN CAST(substr(doc_id, 4, 12) AS INT) % 50 = 0 THEN"
            " list_transform(range(0, len(w)),"
            " i -> w[(i % 3) + 1]) ELSE w END"
        )
    ln = "size(w)" if sp else "len(w)"
    mism = (
        f"{siz}({fil}({seq('p', f'{ln} - 1')},"
        f" i -> {el('w', 'i + 1')} != {el('w', 'i - p + 1')}))"
    )
    marr = f"{tr}({seq('1', f'{ln} - 1')}, p -> CAST({mism} AS BIGINT))"
    rarr = (
        f"{tr}({seq('1', f'{ln} - 1')}, p -> CAST({mism} AS DOUBLE)"
        f" / CAST({ln} - p AS DOUBLE))"
    )
    lp = pos("marr", "CAST(0 AS BIGINT)")
    bp = pos("rarr", amin("rarr"))
    return {
        "tail": tail,
        "inject": inj,
        "marr": marr,
        "rarr": rarr,
        "loop_period": (
            f"CASE WHEN {lp} > 0 THEN CAST({lp} AS BIGINT)"
            " ELSE CAST(NULL AS BIGINT) END"
        ),
        "best_period": f"CAST({bp} AS BIGINT)",
        "best_rate": _F6.format(x=f"{amin('rarr')}"),
        "n_win": ln,
    }


def _duck_oracle() -> str:
    e = _exprs("duck")
    return (
        synth_sql(_N)
        + f"""
    , s0 AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform({e["tail"]}, x -> CAST(x AS BIGINT)) AS w
      FROM (SELECT doc_id, tokens, n_tok,
                   CAST(n_tok AS BIGINT) AS n FROM synth)
    ),
    si AS (
      SELECT doc_id, {e["inject"]} AS w FROM s0
    ),
    s1 AS (
      SELECT doc_id, CAST({e["n_win"]} AS BIGINT) AS n_win,
             {e["marr"]} AS marr, {e["rarr"]} AS rarr
      FROM si
    )
    SELECT doc_id, n_win,
           CAST(CASE WHEN CAST(substr(doc_id, 4, 12) AS INT) % 50 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS planted,
           {e["loop_period"]} AS loop_period,
           {e["best_period"]} AS best_period,
           {e["best_rate"]} AS best_rate,
           CAST(CASE WHEN {e["loop_period"]} IS NOT NULL
                THEN 1 ELSE 0 END AS BIGINT) AS is_degenerate
    FROM s1
    """
    )


@register("repetition_loop_screen", oracle=_duck_oracle())
def repetition_loop_screen(spark, sf_dir):
    """T97: exact/near periodic-tail screen (module header) — integer
    mismatch HOFs over all 63 candidate periods of the last-64-token
    window; zero exchanges."""
    e = _exprs("spark")
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id", "tokens", "CAST(n_tok AS BIGINT) AS n"
    )
    s0 = docs.selectExpr(
        "doc_id",
        "n",
        f"transform({e['tail']}, x -> CAST(x AS BIGINT)) AS w",
    )
    si = s0.selectExpr("doc_id", f"{e['inject']} AS w")
    s1 = si.selectExpr(
        "doc_id",
        f"CAST({e['n_win']} AS BIGINT) AS n_win",
        f"{e['marr']} AS marr",
        f"{e['rarr']} AS rarr",
    )
    return s1.selectExpr(
        "doc_id",
        "n_win",
        "CAST(CASE WHEN CAST(substr(doc_id, 4, 12) AS INT) % 50 = 0 THEN 1 ELSE 0 END AS BIGINT)"
        " AS planted",
        f"{e['loop_period']} AS loop_period",
        f"{e['best_period']} AS best_period",
        f"{e['best_rate']} AS best_rate",
        f"CAST(CASE WHEN {e['loop_period']} IS NOT NULL"
        " THEN 1 ELSE 0 END AS BIGINT) AS is_degenerate",
    )
