"""Semantic gates for chisq_q (T68): pandas contingency recompute +
test structure."""

import math

import pandas as pd
import pytest

from dtaidistance_spark.operators.chisq_q import chisq_homogeneity

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return chisq_homogeneity(spark, sf_dir).toPandas()


def test_matches_pandas(spark, sf_dir, out):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day_part"] = pd.DatetimeIndex(ev.ts).hour // 6
    tab = (
        ev.groupby(["event_type", "day_part"]).size().reset_index(
            name="o"
        )
    )
    n = tab.o.sum()
    r = tab.groupby("event_type").o.sum()
    c = tab.groupby("day_part").o.sum()
    chi2 = 0.0
    terms = {}
    for row in tab.sort_values(["event_type", "day_part"]).itertuples():
        e = r[row.event_type] * c[row.day_part] / n
        t = (row.o - e) ** 2 / e
        terms[(row.event_type, row.day_part)] = t
        chi2 += t
    got = out.set_index(["event_type", "day_part"])
    assert len(got) == len(terms)
    for k, t in terms.items():
        g = got.loc[k]
        assert g.o == tab.set_index(["event_type", "day_part"]).o[k]
        assert g.term == pytest.approx(f6(t), abs=2e-6)
        assert g.chi2 == pytest.approx(chi2, abs=1e-4)
        assert g.n == n
    want_rej = 1 if chi2 > 21.026 else 0
    assert (out["reject_homogeneous"] == want_rej).all()


def test_structure(out):
    """Marginals consistent per row; dof cells complete (R*C);
    nonnegative terms summing to chi2."""
    assert (out["term"] >= 0).all()
    assert out["n_cells"].iloc[0] == len(out)
    assert out.groupby("event_type")["o"].sum().equals(
        out.groupby("event_type")["r"].first()
    )
    s = out["term"].sum()
    assert s == pytest.approx(out["chi2"].iloc[0], abs=1e-3)
