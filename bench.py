"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the metric
JSON {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} -- first the FULL record (also
persisted to BENCH_FULL.json), then a compact final line sized to fit
the driver's 2000-char stdout tail (slowest queries first,
"queries_omitted" counts the rest).

Headliners cover the engine's hot shapes: TPC-H-style aggregation and
multi-join analytics (q1/q3/q5), the flagship reference slice, the
shuffle-heavy deterministic dedup (d4), hash dedup + MinHash-LSH over
documents, and windowed event analytics (tumbling + session).
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINERS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_supplier",
    "flagship",
    "llm_decontaminate",
    "d4_keep_first",
    "j7_row_join",
    "llm_exact_dedup",
    "llm_minhash_lsh",
    "llm_cosine_topk_fast",
    "llm_embed_dup_lsh",
    "llm_ann_ivf",
    "llm_ann_ivfpq",
    "llm_tfidf",
    "llm_fuzzy_pairs",
    "llm_sorted_neighborhood",
    "w_tumbling",
    "w_session",
    "w_funnel",
    "st_tumbling",
    "j14_interval_join",
    "llm_line_dedup",
    "llm_rep_signals",
    "g1_pagerank",
    "pipe_pua",
    "pipe_cpa",
    "j15_skew_plain",
    "j15_skew_salted",
    "g3_triangle_count",
    "j10c_asof_nearest",
    "j16_bloom_semi",
    "llm_containment_pairs",
    "llm_jaccard_pairs",
    "llm_jaccard_prefix",
    "llm_containment_prefix",
    "llm_corpus_shuffle",
    "llm_curation_pipeline",
    "llm_c4_pipeline",
    "llm_span_corruption",
    "llm_dataset_card",
    "llm_substring_spans",
    "llm_substring_strip",
    "llm_perplexity_buckets",
    "llm_fim_transform",
    "llm_chat_render",
    "llm_chat_stats",
    "w_gap_linear",
    "sql3_exists_cte",
    "s12_zorder_profile",
    "llm_kmeans",
    "llm_semantic_dedup",
    "llm_top_ngrams",
    "llm_bigram_logprob",
    "llm_html_strip",
    "llm_url_dedup",
    "llm_quality_classifier",
    "llm_gopher_rules",
    "llm_contamination_overlap",
    "llm_boilerplate",
    "llm_trained_classifier",
    "llm_robots_filter",
    "llm_negative_pairs",
    "llm_anchor_positives_lsh",
    "llm_hard_negatives_lsh",
    "llm_vocab_coverage",
    "llm_curriculum",
    "llm_index_dedup",
    "d8_scd2",
    "j18_linkage",
    "j18b_linkage_banded",
    "j19_pit_lookup",
    "g6_bfs_hops",
    "g8_kcore",
    "g9_personalized_pr",
    "g7_shortest_paths",
    "llm_mixture_apply",
    "llm_web_pipeline",
    "w_transitions",
    "g10_adamic_adar",
    "llm_bm25",
    "llm_preference_pairs",
    "llm_rrf_fusion",
    "a38_weighted_median",
    "g11_modularity",
    "llm_unigram_train",
    "v10_reconcile",
    "w_holt",
    "w_cusum",
    "llm_mmr_diversify",
    "v12_psi",
    "llm_sentence_split",
    "mm_audio_dedup",
    "j22b_spatial_haversine",
    "j23_point_in_polygon",
    "g14_betweenness",
    "st_custom_source",
    "a48_bootstrap_ci",
    "st_interval_join_outer",
    "a43_sketch_overlap",
    "a45_mann_whitney",
    "w_twap",
    "w_resample_locf",
    "pipe_governance",
    "v16_chi_square_drift",
    "llm_mmr_ann",
    "s22_forget",
    "mm_decode_quarantine",
    "llm_minhash_lsh_md5",
    "w_wau_hll",
    "llm_simhash_md5",
    "a49_kmv_set_ops",
    "a50_skew_agg",
    "s27_bucketed_join",
    "s28_dpp_join",
    "g15_scc",
    "llm_bpe_tokenize",
    "llm_kmeans_int",
    "a51_heavy_hitters",
    "s29_join_ivm",
    "st_topk",
    "llm_nb_classifier",
    "llm_viterbi_fixed",
    "mm_decode_verify",
    "mm_gif_verify",
    # r8: the three lanes flipped to full value oracles
    "mm_features",
    "mm_resize",
    "mm_frame_sample",
    "sql4_grouping_sets",
    "w_mk_trend",
    "w_acf",
    "a52_ks_test",
    "a53_kruskal_wallis",
    "a54_brown_forsythe",
    "a55_welch_ttest",
    "llm_rouge",
    "llm_bleu",
    "llm_bleu_corpus",
    "llm_chrf",
    "llm_js_divergence",
    "llm_winnowing",
    "g16_bipartite_projection",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from uofi_payroll_etl_main_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM/scan path and the Python-worker pool once (not
    # timed): the first Arrow exchange pays worker spin-up, which is
    # session overhead, not query cost
    qs["a3_count"](spark, sf_dir).collect()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Per-query isolation: one failing headliner must not wipe the run
    # (r3 lost all 26 numbers to a single AnalysisException).  Errors are
    # recorded under "errors" and excluded from the total.
    #
    # Execution via the noop SINK, not count(): under count() Catalyst
    # prunes every column the row count doesn't need, so projection-heavy
    # queries (string reconstruction, HOF transforms) were measured at a
    # fraction of their true cost (measured: substring_strip 1.4s counted
    # vs 6.0s materialized at sf0.1).  The noop sink forces full-column
    # materialization with zero write cost.  Aggregation-shaped queries
    # are unaffected; round-5+ numbers for projection-shaped queries are
    # therefore NOT comparable with rounds <= 4.
    #
    # Best-of-N per query (default 2): this host's throughput swings
    # 2-6x between back-to-back identical runs (measured: the same
    # warm query at 1.3s and 8.0s consecutively), so a single sample
    # mostly benchmarks the neighbors, not the plan.  The min is the
    # standard noise-floor estimator; reps are sequential so a run is
    # still one session, one JVM.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINERS:
        best: float | None = None
        try:
            for _ in range(reps):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                # full execution incl. every output column, no driver
                # transfer, no disk: the noop sink
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                best = dt if best is None else min(best, dt)
            timings[name] = best
        except Exception as exc:  # noqa: BLE001 -- harness must survive any query
            if best is not None:  # a completed rep still counts
                timings[name] = best
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
    total = round(sum(timings.values()), 3)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_ok": len(timings),
        "n_err": len(errors),
        "reps": reps,
        "agg": "min",
        # round-5+ numbers use full-column noop-sink materialization;
        # rounds <= 4 used count() (Catalyst column pruning) -- the two
        # are NOT comparable for projection-heavy queries (see SCALE.md)
        "measurement": "noop-sink",
        "loadavg": list(os.getloadavg()),
    }
    if errors:
        out["errors"] = errors

    # The driver keeps only the LAST 2000 chars of stdout, and the full
    # per-query dict (109 headliners) serializes to ~4KB -- r5/r6's
    # "parsed": null was exactly this.  So: (1) persist the complete
    # record to BENCH_FULL.json next to this script, (2) print it as an
    # EARLY stdout line for the run log, (3) end with a compact final
    # line guaranteed to fit the tail window, carrying the headline
    # metric plus as many of the SLOWEST queries as the budget allows.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))

    compact = {k: out[k] for k in (
        "metric", "value", "unit", "sf", "n_ok", "n_err", "reps", "agg",
        "measurement",
    )}
    compact["queries_file"] = "BENCH_FULL.json"
    compact["queries"] = {}
    budget = 1800
    for name in sorted(timings, key=timings.get, reverse=True):
        compact["queries"][name] = timings[name]
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
