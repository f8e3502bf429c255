"""T91 — classic readability indices per document (Flesch'48
Reading Ease; Kincaid et al.'75 grade level; Coleman–Liau'75;
Senter–Smith ARI'67): the four standard "how hard is this text"
dials a curation pipeline screens on — FRE/FKGL from words,
sentences and a syllable heuristic (maximal [aeiouy]+ groups per
word, floor 1 — the standard dictionary-free approximation,
declared), CL/ARI from character counts (their design point: no
syllables needed).

    FRE  = 206.835 − 1.015·W/S − 84.6·Syl/W
    FKGL = 0.39·W/S + 11.8·Syl/W − 15.59
    CL   = 0.0588·L₁₀₀ − 0.296·S₁₀₀ − 15.8   (per-100-word rates)
    ARI  = 4.71·C/W + 0.5·W/S − 21.43        (C = letters+digits)

Exactness: words = whitespace split (empties dropped), sentences =
max(1, count of [.!?]+ runs), letters/digits/syllable counts all
INT64 regexp counts computed identically in both engines; each
index is ONE float tree, floor-1e6.

Honest (gated) reading — measured, and it is the classic
unsegmented-text trap made quantitative: the synthetic corpus has
ZERO sentence punctuation, so every document parses as ONE run-on
sentence (n_sentences = 1 on all 500 docs, gated) — and then
W/S = W, so FKGL is 99.4%-correlated with document length
(measured corr 0.9944, sd 9.9 grade levels against Coleman–Liau's
1.4): the dial stops measuring readability and starts measuring
LENGTH.  This is precisely what happens when readability screens
run on OCR dumps or token-joined text without sentence
segmentation, and the gate pins it so the failure mode is a
documented measurement, not a surprise.  The syllable-rate axis
stays meaningful (Syl/W median 1.43 — short common words; FRE
median 29.1, the "very difficult" band purely via the length
term), which is why CL (sentence-light) spreads 7× less than
FKGL.  Gates: hand-case paragraph with known W/S/Syl counts;
syllable heuristic on a pinned word list (per the vowel-group
rule, NOT dictionary syllables — divergences like 'queue'
documented); the single-sentence corpus degeneracy + the
corr(FKGL, length) = 0.994 trap; cross-index rank agreement
(FKGL vs ARI Spearman 0.997 — they disagree in level, agree in
order).

Scale shape: a single per-row projection — no shuffle at all; the
final DataFrame is one narrow scan whatever the corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_WS = _D("n_words")
_SS = _D("n_sentences")
_SY = _D("n_syllables")
_LL = _D("n_letters")
_CC = _D("n_chars_an")

_FRE = f"(206.835 - 1.015 * {_WS} / {_SS} - 84.6 * {_SY} / {_WS})"
_FKGL = f"(0.39 * {_WS} / {_SS} + 11.8 * {_SY} / {_WS} - 15.59)"
_CL = (
    f"(0.0588 * (100.0 * {_LL} / {_WS})"
    f" - 0.296 * (100.0 * {_SS} / {_WS}) - 15.8)"
)
_ARI = f"(4.71 * {_CC} / {_WS} + 0.5 * {_WS} / {_SS} - 21.43)"


def _out() -> list[str]:
    g = "n_words > 0"
    return [
        "CAST(n_words AS BIGINT) AS n_words",
        "CAST(n_sentences AS BIGINT) AS n_sentences",
        "CAST(n_syllables AS BIGINT) AS n_syllables",
        "CAST(n_letters AS BIGINT) AS n_letters",
        f"CASE WHEN {g} THEN {_F6.format(x=_FRE)}"
        " ELSE CAST(NULL AS DOUBLE) END AS flesch_reading_ease",
        f"CASE WHEN {g} THEN {_F6.format(x=_FKGL)}"
        " ELSE CAST(NULL AS DOUBLE) END AS fk_grade",
        f"CASE WHEN {g} THEN {_F6.format(x=_CL)}"
        " ELSE CAST(NULL AS DOUBLE) END AS coleman_liau",
        f"CASE WHEN {g} THEN {_F6.format(x=_ARI)}"
        " ELSE CAST(NULL AS DOUBLE) END AS ari",
    ]


@register(
    "readability_indices",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'),
                    w -> w != '') AS words,
        greatest(1, len(regexp_extract_all(text, '[.!?]+')))
          AS n_sentences,
        length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
          AS n_letters,
        length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
          AS n_chars_an
      FROM documents
    ),
    counts AS (
      SELECT doc_id, n_sentences, n_letters, n_chars_an,
        len(words) AS n_words,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(words, w -> CAST(greatest(1,
            len(regexp_extract_all(lower(w), '[aeiouy]+')))
            AS BIGINT))),
          (a, q) -> a + q) AS n_syllables
      FROM base
    )
    SELECT doc_id, {", ".join(_out())}
    FROM counts
    """,
)
def readability_indices(spark, sf_dir):
    """T91: FRE / FKGL / Coleman–Liau / ARI per document (module
    header) — INT64 regexp counts, vowel-group syllables, one float
    tree per index, floor-1e6."""
    base = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "filter(split(text, '\\\\s+'), w -> w != '')"
        ).alias("words"),
        F.expr(
            "greatest(1, size(regexp_extract_all(text,"
            " '[.!?]+', 0)))"
        ).alias("n_sentences"),
        F.expr(
            "length(regexp_replace(text, '[^A-Za-z]', ''))"
        ).alias("n_letters"),
        F.expr(
            "length(regexp_replace(text, '[^A-Za-z0-9]', ''))"
        ).alias("n_chars_an"),
    )
    counts = base.select(
        "doc_id",
        "n_sentences",
        "n_letters",
        "n_chars_an",
        F.expr("size(words)").alias("n_words"),
        F.expr(
            "aggregate(transform(words, w -> CAST(greatest(1,"
            " size(regexp_extract_all(lower(w), '[aeiouy]+', 0)))"
            " AS BIGINT)), CAST(0 AS BIGINT), (a, q) -> a + q)"
        ).alias("n_syllables"),
    )
    return counts.selectExpr("doc_id", *_out())
