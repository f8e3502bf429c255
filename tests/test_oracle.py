"""Every registry query with an oracle must match DuckDB at sf0.001 —
the local replica of the driver's CORRECTNESS gate."""

import pytest

from dtaidistance_spark.operators import (  # noqa: F401 — registers
    alignment_q,
    ann_q,
    clustering_q,
    continuous_q,
    corpusops_q,
    dedup_q,
    embedlinalg_q,
    diag_q,
    encoding_q,
    flagship,
    layout_q,
    motif_q,
    multimodal_q,
    sampling_q,
    saxindex,
    sketch_q,
    streaming_q,
    synth_q,
    text_q,
    tokenstats_q,
    tsanalytics_q,
    tshyper_q,
    tsops_q,
    tsrobust_q,
    tswin_q,
)
from dtaidistance_spark.operators.queries import ORACLE, REGISTRY
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = REGISTRY[name](spark, sf_dir)
    compare(df, con, ORACLE[name], name=name)


def test_every_query_runs(spark, sf_dir):
    for name, fn in REGISTRY.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
