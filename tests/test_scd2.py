"""Semantic gates for scd2_q (R55): pandas recompute of every run,
planted stable stream, the SCD2 invariants (tiling, alternation,
current-uniqueness), and the churn-rate corpus pin."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.scd2_q import (
    _HI,
    _LO,
    scd2_user_tiers,
)


def _tier(n):
    return "LOW" if n < _LO else ("MID" if n < _HI else "HIGH")


def _runs_ref(raw):
    raw = raw.copy()
    raw["week"] = (raw.ts.dt.day - 1) // 7
    wk = (
        raw.groupby(["user_id", "week"])
        .size()
        .reset_index(name="n_ev")
    )
    wk["tier"] = wk.n_ev.map(_tier)
    mw = wk.week.max()
    rows = []
    for uid, sub in wk.sort_values("week").groupby("user_id"):
        run = None
        prev_week = None
        for r in sub.itertuples():
            if (
                run is None
                or r.tier != run[1]
                or r.week != prev_week + 1
            ):
                if run:
                    rows.append(run)
                run = [uid, r.tier, r.week, r.week]
            else:
                run[3] = r.week
            prev_week = r.week
        rows.append(run)
    out = pd.DataFrame(
        rows, columns=["user_id", "tier", "eff_from", "eff_to"]
    )
    out["n_weeks"] = out.eff_to - out.eff_from + 1
    out["is_current"] = (out.eff_to == mw).astype(int)
    return out, wk


def test_matches_pandas(spark, sf_dir):
    out = (
        scd2_user_tiers(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "eff_from"])
        .reset_index(drop=True)
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    ref, _ = _runs_ref(raw)
    ref = ref.sort_values(["user_id", "eff_from"]).reset_index(
        drop=True
    )
    assert len(out) == len(ref)
    for col in ("user_id", "tier", "eff_from", "eff_to", "n_weeks",
                "is_current"):
        assert (out[col].values == ref[col].values).all(), col


def test_invariants(spark, sf_dir):
    out = scd2_user_tiers(spark, sf_dir).toPandas()
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    _, wk = _runs_ref(raw)
    # tiling: runs cover each user's observed weeks exactly
    assert out.n_weeks.sum() == len(wk)
    # alternation: consecutive-in-time runs of a user never share a
    # tier (a shared tier would have merged) unless separated by a gap
    for uid, sub in out.sort_values("eff_from").groupby("user_id"):
        rows = sub.itertuples()
        prev = next(rows)
        for r in rows:
            if r.eff_from == prev.eff_to + 1:
                assert r.tier != prev.tier
            prev = r
    # ≤ 1 is_current per user, and only for users active last week
    cur = out[out.is_current == 1]
    assert cur.user_id.is_unique


def test_planted_stable_user():
    ts = pd.to_datetime(
        [f"2026-01-{d:02d} 12:00:00" for d in range(1, 29)]
        * 15
    )
    raw = pd.DataFrame({"user_id": 1, "ts": ts})
    # 15 events/day × 7 days = 105/week → HIGH every week → ONE row
    ref, _ = _runs_ref(raw)
    assert len(ref) == 1
    assert ref.iloc[0].tier == "HIGH"
    assert ref.iloc[0].n_weeks == 4


def test_honest_churn_pin(spark):
    out = scd2_user_tiers(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) == 555
    assert out.user_id.nunique() == 150
    assert abs(out.n_weeks.mean() - 1.3495) < 1e-3
    assert int(out.is_current.sum()) == 149  # one user absent at end
    # all three tiers genuinely populated
    assert set(out.tier.unique()) == {"LOW", "MID", "HIGH"}


def test_streaming_twin_bit_identical(spark, sf_dir):
    """R56: the streamed dimension equals the batch dimension
    row-for-row (modulo the batch-only is_current decoration) —
    cross-batch state merges exercised by the file-by-file replay."""
    from dtaidistance_spark.operators.scd2_q import stream_scd2_tiers_q

    batch = (
        scd2_user_tiers(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "eff_from"])
        .reset_index(drop=True)
    )
    streamed = (
        stream_scd2_tiers_q(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "eff_from"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch)
    for col in ("user_id", "tier", "eff_from", "eff_to", "n_weeks"):
        assert (streamed[col].values == batch[col].values).all(), col


def test_pit_join_totals_and_uniqueness(spark, sf_dir):
    """R57: the point-in-time join matches every purchase to EXACTLY
    one run (the R55 tiling invariant in action) — totals conserve."""
    import numpy as np

    from dtaidistance_spark.operators.scd2_q import revenue_by_tier_pit

    out = revenue_by_tier_pit(spark, sf_dir).toPandas()
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    purch = raw[raw.event_type == "purchase"]
    cents = np.floor(100.0 * purch.value + 0.5).astype(np.int64)
    # conservation: every purchase lands in exactly one tier bucket
    assert int(out.n_purchases.sum()) == len(purch)
    assert int(out.revenue_cents.sum()) == int(cents.sum())
    assert set(out.tier) <= {"LOW", "MID", "HIGH"}
