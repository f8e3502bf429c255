"""TS82 — Lempel-Ziv LZ76 complexity per series (Lempel & Ziv IEEE
IT'76; Kaspar & Schuster PRA'87): the classic model-free
production-complexity count completing the complexity family —
permutation entropy reads ordinal structure, sample entropy amplitude
recurrence, Higuchi curve-length roughness; LZ76 counts how many NEW
phrases a self-referential copy process needs to produce the
sequence, the quantity whose n→∞ normalization is the entropy rate.

Parsing (the exhaustive-production convention): scan left to right;
the current phrase s[i:i+l] keeps EXTENDING while it occurs in
s[0:i+l−1] (overlap with its own start allowed — the LZ76 rule, which
is what lets a constant run finish in one phrase); when extension
fails, count a phrase and restart at i+l.  The final (possibly
still-copyable) phrase counts.  c_norm = c·ln(n)/(n·ln(64)) — the
n/log_64 n production bound for the fold-64 alphabet (declared; fold
64 matches the editdist/permentropy symbol convention, and makes
copy structure COMMON so the parser is genuinely exercised).

Implementation: an Arrow mapInPandas kernel — a data-dependent
sequential parse is exactly the documented kernel criterion (the
PELT/isotonic precedent); symbols render injectively to chars and the
phrase test is str.find over the growing prefix (C-speed; worst case
O(n²) char ops, ≈ms at n = 7968).  Embarrassingly parallel, ZERO
exchanges.  Rows-only in the driver artifact (a self-referential
parse is not ANSI SQL); the pytest gate is the DEFINITION — an
independent O(n³) window-comparison parser reproduces every phrase
boundary on real series — plus the literature hand case
0001101001000101 → c = 6 (Kaspar-Schuster's worked example), the
constant-run → c = 2 and alternation → c = 3 closed cases, and the
LCG-noise c_norm ≈ 1 calibration.

Honest (gated) reading — measured, and LESS compressible than the
draft guessed: median c_norm ≈ 0.80 (max 0.88, never reaching the
noise bound 1), because at fold 64 the sinusoid+ramp streams rarely
repeat exact symbol runs — only the strongly periodic minority drops
low (min 0.06, 5% quantile 0.54).  The high-bit LCG control sits in
[0.8, 1.2] as noise should (and the LOW-bit LCG control parses as
near-constant, c_norm ≈ 0.03 — the power-of-two-modulus period-2^k
pathology, kept in the gate as a cautionary case).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register

_N = 512
_ALPHA = 64


def lz76_count(s: str) -> int:
    """Exhaustive LZ76 production count (module header semantics)."""
    n = len(s)
    c = 0
    i = 0
    while i < n:
        l = 1
        while i + l <= n and s.find(s[i : i + l], 0, i + l - 1) != -1:
            l += 1
        # if we ran off the end, the loop exits with i+l = n+1: the
        # final phrase is s[i:n] and still counts
        c += 1
        i += l
    return c


@register("lz76_complexity")
def lz76_complexity(spark, sf_dir):
    """TS82: LZ76 production complexity per series (module header) —
    Arrow kernel, str.find prefix parse, fold-64 symbols, c_norm
    against the n/log_64 n bound, floor-1e6."""
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        f"transform(tokens, y -> CAST(y % {_ALPHA} AS INT)) AS v",
    )

    def kern(batches):
        f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        for pdf in batches:
            rows = []
            for doc_id, v in zip(pdf["doc_id"], pdf["v"]):
                sym = np.asarray(v, dtype=np.int64)
                n = len(sym)
                s = "".join(chr(33 + int(x)) for x in sym)
                c = lz76_count(s)
                norm = (
                    f6(c * math.log(n) / (n * math.log(_ALPHA)))
                    if n > 1
                    else None
                )
                rows.append(
                    (
                        doc_id,
                        n,
                        int(len(set(s))),
                        c,
                        norm,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "l", "n_distinct", "c_lz", "c_norm"],
            )

    return docs.mapInPandas(
        kern,
        schema=(
            "doc_id string, l long, n_distinct long, c_lz long,"
            " c_norm double"
        ),
    )
