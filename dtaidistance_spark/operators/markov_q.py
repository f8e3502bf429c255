"""TS100 — first-order Markov structure of the event-type stream
(Shannon'48 entropy rate; Anderson–Goodman Ann.Math.Stat.'57 χ²
test for Markov chains): does WHAT a user does next depend on what
they just did?  The events family reads timing (TS97), values
(TS99), and durations (TS98); this reads the SEQUENCE — the
transition matrix over the 5 event types, the G-test of
memorylessness (row distribution = column margin?), and the
conditional entropy rate H(next | current) against its iid ceiling
H(margin) — the TS95/TS96 information machinery applied to the
behavioural stream, where "is it Markov or iid?" decides whether
next-event prediction is worth a model at all.

Per user, events ordered by (ts, event_id) (microsecond ts makes
ties vanishing, the id tie-break declared); transitions never
cross users.  Over the pooled transition counts n_ij:

    G = 2·Σ_ij n_ij·ln( n_ij·N / (n_i·m_j) ) ~ χ²((k−1)²),
    H_rate = [Σ_i n_i ln n_i − Σ_ij n_ij ln n_ij]/N   (nats),
    H_iid  = ln N − Σ_j m_j ln m_j / N,

with n_i = Σ_j n_ij the FROM-margins and m_j the TO-margins (kept
distinct — the first and last event of each user differ, so the
margins genuinely differ; the identity G = 2N·(H_iid' − H_rate)
with H_iid' on the to-margin is gated).  Everything through the
margins is exact INT64 (one lag window PARTITIONED by user — no
partition-less Window — then one 25-cell aggregate); the ln trees
fold in pinned cell order; floor-1e6; verdict at χ²₀.₉₅(16) =
26.29622760486423.

Honest (gated) reading — measured: the stream is memoryless and
the dial says so cleanly — G = 13.47 at sf0.01 (vs the 26.3 line,
~its χ²(16) expectation under the null), H_rate 1.60871 vs H_iid
1.60939 nats, a gap of 6.8e-4 against the ln 5 = 1.609 ceiling: the
generator draws types independently and near-uniformly, so
next-event prediction can beat the margin by at most ~0.05% — the
"don't build the model" answer, quantified.  The planted
sticky-chain control (self-transition bias ⇒ G ≫ crit and an
H-gap worth modeling) and the deterministic-cycle chain (H_rate =
0 exactly) live in pytest.

Scale shape: one partitioned lag window + one map-side-combined
25-cell count — the corpus crosses the wire once; the G/H tree
runs over 25 integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 5

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_CHI16 = "26.29622760486423"

_TYPES = ["click", "error", "purchase", "signup", "view"]  # sorted


def _cells():
    return [(i, j) for i in range(_K) for j in range(_K)]


def _nlogn(terms):
    """Σ x ln x in pinned order over the given SQL int expressions."""
    parts = [
        f"(CASE WHEN {t} > 0 THEN CAST({t} AS DOUBLE)"
        f" * ln(CAST({t} AS DOUBLE)) ELSE CAST(0 AS DOUBLE) END)"
        for t in terms
    ]
    return "(" + " + ".join(parts) + ")"


_NIJ = [f"n_{i}_{j}" for i, j in _cells()]
_NI = [
    "(" + " + ".join(f"n_{i}_{j}" for j in range(_K)) + ")"
    for i in range(_K)
]
_MJ = [
    "(" + " + ".join(f"n_{i}_{j}" for i in range(_K)) + ")"
    for j in range(_K)
]
_N = "(" + " + ".join(_NIJ) + ")"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_JLN = _nlogn(_NIJ)
_ILN = _nlogn(_NI)
_MLN = _nlogn(_MJ)
# G = 2[Σn_ij ln n_ij + N ln N − Σn_i ln n_i − Σm_j ln m_j]
_G = (
    f"(CAST(2 AS DOUBLE) * ({_JLN} + {_D(_N)} * ln({_D(_N)})"
    f" - {_ILN} - {_MLN}))"
)
_HRATE = f"(({_ILN} - {_JLN}) / {_D(_N)})"
_HIID = f"(ln({_D(_N)}) - {_MLN} / {_D(_N)})"

_OUT = [
    f"{_N} AS n_transitions",
    f"{_F6.format(x=_G)} AS g_markov",
    f"{_F6.format(x=_HRATE)} AS h_rate",
    f"{_F6.format(x=_HIID)} AS h_iid",
    f"CAST(CASE WHEN {_G} > {_CHI16} THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_memoryless",
]


def _cell_counts(prev_col: str, cur_col: str) -> str:
    cols = []
    for i, j in _cells():
        cols.append(
            f"CAST(SUM(CASE WHEN {prev_col} = '{_TYPES[i]}'"
            f" AND {cur_col} = '{_TYPES[j]}' THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_{i}_{j}"
        )
    return ", ".join(cols)


@register(
    "markov_event_chain",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    cnt AS (
      SELECT {_cell_counts("prev", "event_type")}
      FROM seq WHERE prev IS NOT NULL
    )
    SELECT {", ".join(_OUT)}
    FROM cnt
    """,
)
def markov_event_chain(spark, sf_dir):
    """TS100: pooled 5×5 event-type transition test (module header)
    — partitioned lag window, one 25-cell int64 aggregate, pinned
    ln trees, floor-1e6."""
    ev = T(spark, sf_dir, "events")
    seq = ev.selectExpr(
        "user_id",
        "event_type",
        "lag(event_type) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS prev",
    ).where(F.col("prev").isNotNull())
    cnt = seq.agg(
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN prev = '{_TYPES[i]}'"
                f" AND event_type = '{_TYPES[j]}' THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"n_{i}_{j}")
            for i, j in _cells()
        ]
    )
    return cnt.selectExpr(*_OUT)
