"""Plan lint: every registry query's physical plan is swept for scale
anti-patterns.  The headliner plan tests (test_analytics_plans.py) go
deep on a few queries; this goes wide across the whole driver surface:

  * CartesianProduct        -- never acceptable (unbounded pair space).
  * BatchEvalPython         -- row-at-a-time Python in the plan; all
                               Python must be Arrow-batched
                               (ArrowEvalPython / *InPandas).
  * BroadcastNestedLoopJoin -- only for a documented allowlist where
                               one side is a single-row scalar
                               aggregate, a metadata-scale spine, or an
                               intentional brute-force baseline tier.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# BNLJ is legitimate where the broadcast side is O(1) rows or the cross
# space IS the query's contract:
BNLJ_ALLOWED = {
    "llm_tfidf",            # single-row corpus-count broadcast
    "llm_mixture_weights",  # single-row total broadcast
    "v5_skew_report",       # single-row total broadcast
    "q11_important_stock",  # scalar threshold subquery (TPC-H shape)
    "q22_dormant_wealthy",  # scalar avg-balance subquery (TPC-H shape)
    "w_resample_filled",    # buckets x groups spine (metadata-scale)
    "w_gap_linear",         # buckets x groups spine (metadata-scale)
    "w_resample_locf",      # buckets x groups spine (metadata-scale)
    "llm_cosine_topk",      # brute-force exact baseline BY DESIGN
    "llm_cosine_topk_q",    # brute-force on int8 arrays (same baseline)
    "llm_embed_dup",        # brute-force exact baseline BY DESIGN
    "a14_histogram",        # single-row (min,max) stats broadcast
    "v12_psi",              # single-row bounds + totals broadcasts (histogram shape x2)
    "v13_benford",          # single-row digit-total broadcast
    "v16_chi_square_drift", # single-row totals broadcast (v13 shape)
    "a43_sketch_overlap",   # |sets|^2 sketch-row pair join (segment-scale, facts scanned once)
    "a45_mann_whitney",     # single-row rank-sum x single-row tie-correction broadcast
    "a47_assoc_rules",      # single-row n-baskets broadcast
    "v15_monitor",          # composes v12/v13 scalar-broadcast shapes; inherits their BNLJ rows
    "g12_hits",             # one-row L1-normalizer broadcast per half-iteration
    "s12_zorder_profile",   # single-row (min,max) z-range broadcast
    "s24_hilbert_profile",  # single-row (min,max) hilbert-range broadcast
    "a24_quantile_sketch",  # single-row (min,max) bounds broadcast
    "w_decayed_counts",     # single-row max-ts reference broadcast
    "llm_hard_negatives",   # brute-force exact baseline BY DESIGN
    "llm_anchor_positives", # brute-force exact baseline BY DESIGN
    "llm_negative_pairs",   # single-row id-space bound broadcast
    "llm_curriculum",       # single-row corpus-count broadcast
    "llm_vocab_coverage",   # single-row token-total broadcast
    "llm_mixture_apply",    # single-row (total, ssum) broadcast
    "j21_report_spine",     # region x priority grid (metadata-scale spine)
    "llm_mix_drift",        # single-row (ta, tb) totals broadcast
    "llm_balanced_sample",  # single-row min-class broadcast
    "llm_perplexity_buckets",  # single-row vocab-size broadcast (add-k LM smoothing)
    "llm_dataset_card",     # single-row metric blocks broadcast (datasheet rollup)
    "llm_bm25",             # single-row (n_docs, avgdl) stats broadcast
    "llm_rrf_fusion",       # single-row query-vector broadcast + bm25 stats broadcast
    "llm_mmr_diversify",    # broadcast query batch -> exact candidate pool (stage-1 tier is swappable for ANN)
    "g11_modularity",       # single-row edge-count (m) broadcast
}

# skipped: st_* execute a streaming drain inside the registry call;
# the two cluster queries run the iterative fixpoint loop eagerly
SKIP_PREFIXES = ("st_",)
SKIP = {"llm_dup_clusters", "llm_near_dedup_corpus", "llm_near_dedup_keep_best"}



def _all_query_names():
    import __spark_entry__ as entrymod

    return [
        n
        for n in sorted(entrymod.queries())
        if not n.startswith(SKIP_PREFIXES) and n not in SKIP
    ]


@pytest.mark.parametrize("name", _all_query_names())
def test_no_scale_antipatterns(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python\n{plan}"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, f"{name}: unexpected BNLJ\n{plan}"
