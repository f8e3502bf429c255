"""Annotation-integrity gate (round-5 verdict item #3): with 465
registry queries the SURVEY.md / COVERAGE.md oracle asterisks are past
hand-auditing, and round 4 proved they can drift silently
(`embed_whiten_identity_check` was refactored to rows-only while
SURVEY §2 kept its `*`).  Three machine checks so the docs cannot lie
about the registry again:

1. every `name*` token in SURVEY.md / COVERAGE.md names a real
   `queries()` entry that HAS a DuckDB oracle in `oracle_sql()`;
2. every rows-only registry entry (in `queries()` but not
   `oracle_sql()`) appears in the curated TWINS map below, and its
   declared evidence actually exists — the oracled twin is in
   `oracle_sql()` and/or the pytest gate file is on disk;
3. the TWINS map carries no stale keys (a rows-only query that gained
   an oracle, or was renamed, must be removed here — keeps the map an
   exact mirror of the registry, not a historical append-log).

The scan covers markdown TABLE rows only (prose uses `*` as italics
and C-pointer/glob notation); star tokens that are not registry names
must be on the explicit _PROSE_STARS allowlist, so a renamed query
surfaces as an unknown-name assertion, not silent acceptance.  First
run of this gate found six real drifts in SURVEY §2 (rows naming
`asap_smooth_params`/`stats_moments`/`hampel_despike`/`theil_sen`/
`realtime_agg_check`/`pairwise_coherence` instead of the registry's
`asap_smooth`/`stats_moments_agg`/`hampel_filter`/`theil_sen_slope`/
`realtime_agg_view`/`coherence_pairs`) on top of the verdict's one.
"""

from __future__ import annotations

import os
import re

import __spark_entry__ as entrymod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# rows-only name -> (oracled twin query | None, pytest gate file | None).
# At least one of the two must be present; both are verified to exist.
TWINS: dict[str, tuple[str | None, str | None]] = {
    "ann_ivf_recall": ("ann_ivf_recall_check", "tests/test_pipeline_ops.py"),
    "ann_ivf_topk": ("ann_ivf_recall_check", "tests/test_pipeline_ops.py"),
    "ann_ivfpq_recall": ("ann_ivfpq_recall_check", "tests/test_pipeline_ops.py"),
    "ann_ivfpq_topk": ("ann_ivfpq_recall_check", "tests/test_pipeline_ops.py"),
    "ann_lsh_mp_topk": ("ann_lsh_mp_recall_check", "tests/test_pipeline_ops.py"),
    "ann_lsh_recall": ("ann_lsh_recall_check", "tests/test_pipeline_ops.py"),
    "ann_lsh_topk": ("ann_lsh_recall_check", "tests/test_pipeline_ops.py"),
    "audio_resample": ("audio_resample_check", "tests/test_pipeline_ops.py"),
    "dtw_knn_seq": ("dtw_knn_check", "tests/test_pairs.py"),
    "dtw_ndim_pairs": ("dtw_ndim_check", "tests/test_alignment.py"),
    "dtw_pairs_threshold": ("dtw_pairs_check", "tests/test_pairs.py"),
    "embed_mahalanobis": ("embed_gram_check", "tests/test_embedlinalg.py"),
    "embed_whiten_identity_check": (
        "embed_gram_check",
        "tests/test_embedlinalg.py",
    ),
    "events_daily_profile": (None, "tests/test_plans.py"),
    "garch_grid_fit": ("garch_inputs_check", "tests/test_garch.py"),
    "gorilla_compression": ("gorilla_compression_check", "tests/test_gorilla.py"),
    "gorilla_tier_blocks": (None, "tests/test_gorilla.py"),
    "hierarchical_dtw": ("linkage_check", "tests/test_clustering.py"),
    "hierarchical_dtw_scaled": (
        "hierarchical_scaled_check",
        "tests/test_clustering.py",
    ),
    "holt_winters_eval": (None, "tests/test_holtwinters.py"),
    "hp_filter": (None, "tests/test_hpfilter.py"),
    "image_resize": ("image_resize_check", "tests/test_pipeline_ops.py"),
    "isotonic_fit": (None, "tests/test_isotonic.py"),
    "kmeans_centers": ("kmeans_check", "tests/test_clustering.py"),
    "kmeans_dtw": ("kmeans_check", "tests/test_clustering.py"),
    "kmedoids_dtw": ("medoid_diag", "tests/test_clustering.py"),
    "lang_id_ngram": ("lang_id_ngram_check", "tests/test_pipeline_ops.py"),
    "linkage_tree": ("linkage_check", "tests/test_clustering.py"),
    "local_concurrences_seq": (
        "local_concurrences_check",
        "tests/test_alignment.py",
    ),
    "lttb_downsample": ("lttb_check", "tests/test_tswin.py"),
    "lz76_complexity": (None, "tests/test_lz76.py"),
    "medoid_per_source": ("medoid_diag", "tests/test_clustering.py"),
    "minhash_twin_recall": (
        "minhash_twin_recall_check",
        "tests/test_dedup.py",
    ),
    "mtld_diversity": (None, "tests/test_mtld.py"),
    "multimodal_features": (
        "multimodal_features_check",
        "tests/test_pipeline_ops.py",
    ),
    "needleman_wunsch_docs": ("nw_diag", "tests/test_alignment.py"),
    "pca_embeddings": ("embed_gram_check", "tests/test_embedlinalg.py"),
    "pca_power_topcomp": ("embed_gram_check", "tests/test_embedlinalg.py"),
    "pelt_changepoints": (None, "tests/test_pelt.py"),
    "procrustes_align": (None, "tests/test_procrustes.py"),
    "rollup_dba_salted": (
        "rollup_salted_identity",
        "tests/test_rollup_salted.py",
    ),
    "sdt_downsample": ("sdt_check", "tests/test_tsanalytics.py"),
    "semdedup": ("semdedup_check", "tests/test_pipeline_ops.py"),
    "seq_cascade_1d": ("rollup_diag_identity", "tests/test_rollup_e2e.py"),
    "seq_rollup_1m": ("rollup_diag_identity", "tests/test_rollup_e2e.py"),
    "shesd_anomalies": ("shesd_residuals_check", "tests/test_shesd.py"),
    "simhash_neardups": ("simhash_neardups_md5", "tests/test_pipeline_ops.py"),
    "stream_dba_rollup": ("rollup_diag_identity", "tests/test_streaming.py"),
    "stream_sdt": ("sdt_check", "tests/test_streaming.py"),
    "subsequence_search_seq": (
        "subsequence_check",
        "tests/test_alignment.py",
    ),
    "vendi_scores": ("vendi_order2_check", "tests/test_vendi.py"),
    "video_frame_sample": ("video_frames_check", "tests/test_pipeline_ops.py"),
    "warping_paths_demo": ("warping_paths_check", "tests/test_alignment.py"),
    "winnowing_overlap": ("winnowing_check", "tests/test_pipeline_ops.py"),
    "zlib_compressibility": ("zlib_input_check", "tests/test_compressq.py"),
}

# negative lookbehind/lookahead keep `**bold**` markdown out of the
# match set; the oracle-claim convention is a single trailing star
_STAR = re.compile(r"(?<!\*)\b([a-z][a-z0-9_]{2,})\*(?!\*)")

# star tokens on table rows that are NOT oracle claims: C pointer
# types, C-function globs, and module-prefix shorthands in the SURVEY
# reference columns.  Anything new lands in the unknown-name assert.
_PROSE_STARS = {
    "seq_t",  # C `seq_t*` buffer type in the data-model table
    "dtw_distances_",  # `dd_dtw_openmp.c::dtw_distances_*` glob
    "dd_dtw",  # whole-disk sweep glob `dd_dtw*`
    "dtw_barycenter",  # same sweep glob
    "dtaidistance",  # `*dtaidistance*` sweep glob
}


def _registry():
    return entrymod.queries(), entrymod.oracle_sql()


def _doc_stars(fname: str) -> set[str]:
    with open(os.path.join(_REPO, fname)) as f:
        return {
            n
            for line in f
            if line.lstrip().startswith("|")
            for n in _STAR.findall(line)
        }


def test_doc_asterisks_match_oracle_registry():
    """Every `name*` on a SURVEY.md / COVERAGE.md table row is a real
    registry query WITH a DuckDB oracle — the drift class round 4 hit."""
    queries, oracles = _registry()
    for fname in ("SURVEY.md", "COVERAGE.md"):
        stars = _doc_stars(fname) - _PROSE_STARS
        unknown = sorted(n for n in stars if n not in queries)
        assert not unknown, f"{fname}: `*` names not in queries(): {unknown}"
        unoracled = sorted(n for n in stars if n not in oracles)
        assert not unoracled, (
            f"{fname}: `*` names without an oracle_sql() entry "
            f"(rows-only marked as oracled): {unoracled}"
        )


def test_rows_only_entries_have_verified_twins():
    """Each rows-only registry entry maps to evidence that exists:
    an oracled twin query and/or a pytest gate file."""
    queries, oracles = _registry()
    rows_only = set(queries) - set(oracles)
    unmapped = sorted(rows_only - set(TWINS))
    assert not unmapped, (
        f"rows-only queries with no curated twin/gate mapping: {unmapped}"
    )
    for name in sorted(rows_only):
        twin, gate = TWINS[name]
        assert twin or gate, f"{name}: empty evidence tuple"
        if twin is not None:
            assert twin in oracles, (
                f"{name}: declared twin {twin!r} has no oracle_sql() entry"
            )
        if gate is not None:
            assert os.path.exists(os.path.join(_REPO, gate)), (
                f"{name}: declared gate file {gate!r} does not exist"
            )


def test_twin_map_carries_no_stale_keys():
    """TWINS mirrors the registry exactly: a key that gained an oracle
    or was renamed must be removed, keeping the map auditable."""
    queries, oracles = _registry()
    rows_only = set(queries) - set(oracles)
    stale = sorted(set(TWINS) - rows_only)
    assert not stale, (
        f"TWINS keys that are no longer rows-only registry queries: {stale}"
    )
