"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (DBA daily-profile rollup over
sf0.001 events). ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2; SQL-expressible ones carry a DuckDB oracle,
DTW/DBA kernels are rows-only here and exact-gated in ``tests/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    # importing the operator modules populates the registry
    from dtaidistance_spark.operators import (  # noqa: F401
        aligncheck_q,
        alignment_q,
        allanvar_q,
        anova_q,
        ansari_q,
        archlm_q,
        arforecast_q,
        auc_q,
        ann_q,
        benford_q,
        bartlett_q,
        bleu_q,
        bpe_q,
        brownforsythe_q,
        burrows_q,
        burstiness_q,
        cdc_q,
        chatterjee_q,
        chisq_q,
        chow_q,
        clustering_q,
        cochranq_q,
        coherence_q,
        cointegration_q,
        compressq_q,
        conformal_q,
        containment_q,
        continuous_q,
        contrast_q,
        corpusops_q,
        cramersv_q,
        croston_q,
        csvio_q,
        custdist_q,
        dbscan_q,
        dcca_q,
        dedup_q,
        editdist_q,
        elastic_q,
        embedlinalg_q,
        dfa_q,
        diag_q,
        dieboldmariano_q,
        dispersion_q,
        encoding_q,
        ewmachart_q,
        fdr_q,
        fisherg_q,
        flagship,
        friedman_q,
        gini_q,
        goodturing_q,
        gpdtail_q,
        granger_q,
        groupsets_q,
        hetero_q,
        higuchi_q,
        hoeffding_q,
        hill_q,
        hjorth_q,
        holt_q,
        holtwinters_q,
        hpfilter_q,
        hubness_q,
        intenc_q,
        intrinsicdim_q,
        isotonic_q,
        itemset_q,
        jarquebera_q,
        jl_q,
        jonckheere_q,
        jsonl_q,
        kaplanmeier_q,
        kappa_q,
        kcenter_q,
        keyness_q,
        kendall_q,
        kendallw_q,
        knlm_q,
        knnloo_q,
        kuiper_q,
        kstest_q,
        layout_q,
        lmoments_q,
        lof_q,
        logrank_q,
        lombscargle_q,
        longestrun_q,
        lz76_q,
        mannwhitney_q,
        markov_q,
        mcnemar_q,
        mmd_q,
        motif_q,
        mtld_q,
        mpdist_q,
        multimodal_q,
        nbclassifier_q,
        nelsonaalen_q,
        neweywest_q,
        novelty_q,
        olstrend_q,
        pacf_q,
        pagerank_q,
        pca_q,
        pagetrend_q,
        randtests_q,
        pelt_q,
        permentropy_q,
        pettitt_q,
        pii_q,
        phillipsperron_q,
        procrustes_q,
        psi_q,
        queries,
        rayleigh_q,
        readability_q,
        records_q,
        richness_q,
        rqa_q,
        runstest_q,
        sampling_q,
        saxindex,
        seasonalmk_q,
        seasonstrength_q,
        ses_q,
        shesd_q,
        silhouette_q,
        symbolicmi_q,
        sketch_q,
        stationarity_q,
        snippets_q,
        specdiag_q,
        streaming_q,
        streamses_q,
        streamsketch_q,
        synth_q,
        tailvr_q,
        tempsample_q,
        text_q,
        tfidf_q,
        theilu_q,
        theta_q,
        tokenstats_q,
        tpch4_q,
        tpch8_q,
        tpch_q,
        tpchmore_q,
        tpchpred_q,
        transferentropy_q,
        trev_q,
        triangles_q,
        turningpoints_q,
        tsanalytics_q,
        tscomplexity_q,
        tsfeatures_q,
        tshyper_q,
        tsrobust_q,
        tswin_q,
        tsops_q,
        vendi_q,
        vonneumann_q,
        wavelet_q,
        wasserstein_q,
        welch_q,
        wilcoxon_q,
        xcorr_q,
    )
    from dtaidistance_spark.operators.queries import ORACLE, REGISTRY

    return REGISTRY, ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry, _ = _registry()
    return registry["events_daily_profile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry, _ = _registry()
    return dict(registry)


def oracle_sql() -> dict[str, str]:
    _, oracle = _registry()
    return dict(oracle)
