"""Correctness-gate registry: LLM-training-data + windowed-analytics
operators (north-star scope, SURVEY.md section 7.2 M4).

Exact operators (hash dedup, n-gram Jaccard, brute-force cosine,
tumbling/sliding/session windows, text stats) carry DuckDB oracles;
approximate ones (MinHash-LSH, SimHash, hyperplane-LSH ANN) and the
Pandas-UDF multimodal path are registered without oracles -> the driver
records rows-only checks, and tests/test_llm.py asserts their recall
against the exact tiers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .llm import dedup as LD
from .llm import similarity as LS
from .llm import text as LT
from .llm.multimodal import (
    extract_features,
    resize_media,
    sample_frames,
    synth_media,
)
from .streaming.streams import (
    read_event_stream,
    run_to_memory,
    streaming_dedup,
    streaming_interval_join,
    streaming_running_totals,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_static_enrich,
    streaming_tumbling_counts,
)
from .streaming.windows import (
    resample_counts_filled,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _source_tag(sf_dir: str, table: str) -> str:
    """Cache tag for tempdir copies of a source table: path + mtime +
    size, so regenerating the source invalidates the cached copy instead
    of silently serving stale data."""
    import hashlib
    import os

    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(src)
        sig = f"{src}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        sig = src
    return hashlib.md5(sig.encode()).hexdigest()[:12]


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file source over the events table.  The raw parquet
    stores TIMESTAMP(NANOS), which the streaming reader can't coerce, so
    the (tiny, metadata-scale) normalized copy is cached per sf_dir;
    a production deployment would point readStream at the landing zone."""
    import os
    import tempfile

    tag = _source_tag(sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_events_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).write.mode("overwrite").parquet(path)
    return read_event_stream(spark, path)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def llm_exact_dedup(spark, sf):
    return LD.exact_dedup_groups(_t(spark, sf, "documents"))


def llm_soft_dedup(spark, sf):
    """Soft deduplication (LD.soft_dedup_weights): 1/|cluster| sampling
    weight per document over exact normalized-content clusters --
    reweight instead of drop, each distinct content gets equal total
    mass.  Full value oracle (md5 window count in DuckDB)."""
    return LD.soft_dedup_weights(_t(spark, sf, "documents"))


def llm_zipf_fit(spark, sf):
    """Zipf-law corpus diagnostic (text.zipf_fit): OLS slope of
    log-frequency on log-rank over the unigram spectrum -- natural text
    sits near -1; templated/contaminated corpora drift.  Exact decimal
    sums of 12-dp-quantized logs, so the oracle reproduces the fit."""
    from .llm.text import zipf_fit

    return zipf_fit(_t(spark, sf, "documents"))


def llm_fingerprint_dedup(spark, sf):
    return LD.fingerprint_dedup(_t(spark, sf, "documents"))


def llm_jaccard_pairs(spark, sf):
    return LD.jaccard_pairs(_t(spark, sf, "documents"), threshold=0.4, n=3)


def llm_substring_search(spark, sf):
    """Trigram-prefiltered exact substring search: docs containing
    'fast merge', candidates narrowed to docs holding every pattern
    trigram before the contains verify.  Oracle is the plain
    contains scan -- exactness is the contract."""
    docs = _t(spark, sf, "documents")
    return LT.substring_search(docs, "fast merge").select("doc_id", "lang", "source", "n_chars")


def llm_jaccard_prefix(spark, sf):
    """Prefix-filtered exact Jaccard join (PPJoin-style): same result
    contract as llm_jaccard_pairs -- and the same DuckDB oracle, which
    is the proof the optimization is lossless -- but candidates come
    only from each doc's rarest shingles."""
    return LD.jaccard_pairs_prefix(_t(spark, sf, "documents"), threshold=0.4, n=3)


def llm_containment_pairs(spark, sf):
    """Asymmetric partial-duplicate detection: shingle containment
    |A∩B| / min(|A|,|B|) >= 0.6 -- catches short docs embedded in long
    ones that Jaccard misses."""
    return LD.containment_pairs(_t(spark, sf, "documents"), threshold=0.6, n=3)


def llm_containment_prefix(spark, sf):
    """Asymmetric-prefix containment join: same result and SAME oracle
    as llm_containment_pairs (losslessness is the contract), candidates
    from each doc's rarest-shingle prefix against the full posting
    table."""
    return LD.containment_pairs_prefix(_t(spark, sf, "documents"), threshold=0.6, n=3)


def llm_minhash_lsh(spark, sf):
    """Production MinHash-LSH tier (xxhash64 double hashing, ~8x
    cheaper per shingle than md5 lanes, bucket-size caps).  Rows-only
    by design; the banding algebra is value-checked through its md5
    twin (llm_minhash_lsh_md5), and recall/precision vs exact Jaccard
    is pytest-pinned."""
    return LD.minhash_lsh_pairs(_t(spark, sf, "documents"), threshold=0.4, n=3)


def llm_minhash_lsh_md5(spark, sf):
    """Verifiable MinHash-LSH tier (llm/dedup.minhash_lsh_pairs_md5):
    16 permutation minima as string MINs over md5 hex lanes, banded
    4x4; the DuckDB oracle re-derives signatures, buckets, and the
    exact candidate set -- the banding algebra is VALUE-checked, which
    the ~8x-cheaper xxhash64 production tiers cannot offer."""
    return LD.minhash_lsh_pairs_md5(_t(spark, sf, "documents"), n=3)


def llm_simhash_md5(spark, sf):
    """Verifiable SimHash tier (llm/dedup.simhash_md5_candidates):
    md5-nibble bit votes, 4x16 chunk banding, exact Hamming verify --
    the DuckDB oracle re-derives signatures, buckets, and the verified
    pair set (all-integer arithmetic).  Production stays on the
    xxhash64 simhash64 tier (one hash per token vs sixteen lanes)."""
    return LD.simhash_md5_candidates(_t(spark, sf, "documents"), max_hamming=3)


def llm_minhash_lsh_fast(spark, sf):
    """Arrow signature tier of MinHash-LSH (bit-identical pairs to
    llm_minhash_lsh; equality asserted in tests/test_llm_ops.py)."""
    return LD.minhash_lsh_pairs(
        _t(spark, sf, "documents"), threshold=0.4, n=3, use_arrow=True
    )


def llm_simhash(spark, sf):
    """Production SimHash tier (xxhash64: one hash per token).
    Rows-only by design; the banding+verify algebra is value-checked
    through its md5 twin (llm_simhash_md5)."""
    return LD.simhash_candidates(_t(spark, sf, "documents"), max_hamming=16)


def llm_token_stats(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        LT.token_count("text").alias("n_tokens"),
        LT.wordlike_token_count("text").alias("n_wordlike"),
        LT.en_marker_count("text").alias("n_en_markers"),
    )


def llm_language_id(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", "lang", LT.language_id("text", threshold=0.05).alias("lang_pred"))


def llm_quality(spark, sf):
    return LT.quality_features(_t(spark, sf, "documents")).drop("text")


def llm_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", LT.fingerprint("text").alias("fp"))


def llm_fuzzy_pairs(spark, sf):
    """Prefix-blocked Levenshtein near-dup pairs over normalized
    64-char heads (exact given the blocking rule -> DuckDB-oracled)."""
    return LD.fuzzy_pairs_blocked(_t(spark, sf, "documents"))


def llm_sorted_neighborhood(spark, sf):
    """Sorted-neighborhood blocking (Hernandez-Stolfo) near-dup pairs:
    one deterministic total-order sort by a 16-char normalized key
    (range-bucketed rank, NO single-partition window), each record
    verified only against its 4 sorted successors with bounded
    Levenshtein -- candidate volume exactly n*window regardless of
    block skew, the complement of llm_fuzzy_pairs' prefix blocking.
    Fully value-oracled (row_number replay + same window join)."""
    return LD.sorted_neighborhood_pairs(_t(spark, sf, "documents"))


def llm_compress_ratio(spark, sf):
    """zlib compression-ratio quality signal (Gopher-style repetition
    detector); Arrow-batched Python kernel, rows-only gate + pytest."""
    return LD.compression_ratio(_t(spark, sf, "documents"))


def llm_tfidf(spark, sf):
    """Top-3 TF-IDF terms per document (smoothed idf), term-asc
    tie-break -> fully deterministic, DuckDB-oracled."""
    return LT.tfidf_topk(_t(spark, sf, "documents"), k=3)


def llm_top_ngrams(spark, sf):
    """Corpus-wide top-20 word bigrams (count desc, gram asc)."""
    return LT.top_ngrams(_t(spark, sf, "documents"), n=2, k=20)


def llm_bigram_logprob(spark, sf):
    """Mean corpus-bigram log-probability per doc (fluency/quality
    signal; DECIMAL-summed rounded terms -> cross-engine stable)."""
    return LT.bigram_logprob(_t(spark, sf, "documents"))


def llm_mean_embedding(spark, sf):
    """Per-label mean-pooled embedding centroid, flattened to
    (label, n_vecs, dim, mv) rows for the value-hash compare (the
    engine API returns the assembled array)."""
    out = LS.mean_embedding(_t(spark, sf, "embeddings"))
    return out.select(
        "label", "n_vecs", F.posexplode("centroid").alias("dim", "mv")
    ).withColumn("dim", F.col("dim").cast("long"))


def llm_cosine_topk(spark, sf):
    return LS.cosine_topk(_t(spark, sf, "embeddings"), k=5)


def w_twap(spark, sf):
    """Time-weighted average event value per type (streaming/windows.
    time_weighted_avg): observations weighted by seconds-until-next --
    the correct mean for irregularly-sampled state series.  One key
    shuffle; DECIMAL-exact weighted sums."""
    from .streaming.windows import time_weighted_avg

    return time_weighted_avg(_t(spark, sf, "events"))


def w_resample_locf(spark, sf):
    """Gap-filled daily resample with last-observation-carried-forward
    (streaming/windows.resample_locf) of each type's latest value --
    the state-series fill policy completing zeros/linear/LOCF."""
    from .streaming.windows import resample_locf

    return resample_locf(_t(spark, sf, "events"), width="1 day")


def w_cusum(spark, sf):
    """Two-sided CUSUM drift alarm per event type over daily volume
    (streaming/windows.cusum_alerts), with a deterministic synthetic
    +50/day level shift injected from Jan 21 so the alarm math is
    exercised: peak statistics + first-crossing indices per type."""
    from .streaming.windows import cusum_alerts

    daily = (
        _t(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .withColumn(
            "v",
            F.col("v")
            + F.when(
                F.col("d") >= F.lit("2024-01-21").cast("date"), F.lit(50.0)
            ).otherwise(F.lit(0.0)),
        )
    )
    return cusum_alerts(daily, "event_type", "d", "v", slack_k=0.5, threshold_h=4.0)


def llm_mmr_diversify(spark, sf):
    """MMR-diversified retrieval (similarity.mmr_topk): per query,
    k=5 results balancing relevance against redundancy with what's
    already selected (lam=0.7) over a cosine top-20 candidate pool.
    Full value oracle: k is a fixed parameter, so the greedy UNROLLS
    into 5 CTE levels with exact-DECIMAL scoring (no recursion, no
    float rounding ambiguity); the pure-Python replica additionally
    certifies it in tests/test_retrieval_prefs.py."""
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return LS.mmr_topk(emb, queries, k=5, lam=0.7, pool=20)


def llm_mmr_ann(spark, sf):
    """MMR diversification fed by the IVF-Flat ANN tier instead of the
    exact candidate fetch -- the 100 TB wiring of llm_mmr_diversify
    made concrete: stage 1 is ivf_topk's bucketed candidate pool,
    stage 2 (greedy selection per query over <= pool rows) is
    identical.  Full value oracle: the IVF candidate SQL composes as
    the cand CTE of the unrolled exact-DECIMAL greedy; the
    pluggable-stage wiring is additionally pytest-held."""
    emb = _t(spark, sf, "embeddings")
    cands = LS.ivf_topk(emb, k=20, n_centroids=16, n_probe=4)
    return LS.mmr_topk(emb, emb, k=5, lam=0.7, candidates=cands)


def llm_cosine_topk_fast(spark, sf):
    # self-mode full-corpus queries: valid ONLY under the row-count
    # guard (gate scale); the 100 TB path is llm_cosine_topk_sliced
    return LS.cosine_topk_vectorized(_t(spark, sf, "embeddings"), k=5)


def llm_cosine_topk_q(spark, sf):
    """Int8-quantized cosine top-k (4x less vector data through the
    pair join).  Every post-quantization term is integer-valued, so the
    tier is exactly SQL-derivable and the DuckDB oracle VALUE-checks it;
    recall vs the exact float tier additionally asserted in
    tests/test_llm_ops.py."""
    return LS.cosine_topk_quantized(_t(spark, sf, "embeddings"), k=5)


def llm_cosine_topk_sliced(spark, sf):
    """Scale path for corpus-vs-corpus exact top-k: the query batch is
    deterministic hash slice 0 of 4, so the driver only ever holds a
    bounded query matrix; full coverage = 4 such jobs."""
    return LS.cosine_topk_vectorized(_t(spark, sf, "embeddings"), k=5, query_slice=(0, 4))


def llm_ann_lsh(spark, sf):
    # nbits sized so buckets hold ~2^3..2^6 vectors at gate scale (500 -
    # 5000 rows); 2^10 buckets over 500 vectors left every bucket a
    # near-singleton and recall near zero.  Sign-LSH recall is bounded by
    # the collision-probability decay at this data's moderate cosines --
    # llm_ann_ivf is the stronger scale path here.  Literal-plane
    # replay makes this a full value oracle (buckets + exact re-rank).
    return LS.lsh_topk(_t(spark, sf, "embeddings"), k=5, num_tables=4, nbits=6)


def llm_ann_ivf(spark, sf):
    """IVF-Flat ANN (similarity.ivf_topk, sampled-centroid mode):
    md5-ordered centroid sample, rounded-cosine cell assignment with
    index tie-breaks, per-cell exact re-rank.  Fully deterministic ->
    the DuckDB oracle re-derives centroids/cells/top-k and VALUE-checks
    the result; recall vs exact cosine additionally pytest-asserted."""
    return LS.ivf_topk(_t(spark, sf, "embeddings"), k=5, n_centroids=32, n_probe=8)


def llm_ann_ivfpq(spark, sf):
    """IVF-PQ ANN (similarity.ivf_pq_topk): product-quantized corpus
    codes + per-query ADC tables inside probed cells, exact-refined
    candidate re-rank.  The memory-bounded 100 TB ANN tier (corpus
    shuffles m smallint codes per vector, not the embedding); rows-only
    gate, recall floor pytest-asserted vs exact cosine."""
    return LS.ivf_pq_topk(
        _t(spark, sf, "embeddings"), k=5, n_centroids=32, n_probe=8,
        m_subvectors=8, n_codes=16, refine_factor=3,
    )


def llm_embed_dup(spark, sf):
    return LS.embed_dup_pairs(_t(spark, sf, "embeddings"), threshold=0.4)


def llm_embed_dup_lsh(spark, sf):
    """Sign-LSH embedding near-dup pairs.  The seeded hyperplanes embed
    as DOUBLE literals in the oracle, so bucketing AND the in-bucket
    exact-cosine verification replay in DuckDB -- full value oracle;
    precision-1 property additionally pytest-pinned."""
    return LS.embed_dup_lsh(_t(spark, sf, "embeddings"), threshold=0.4, num_tables=8, nbits=6)


def llm_decontaminate(spark, sf):
    """Eval-set decontamination: drop corpus docs sharing any word
    5-gram with the benchmark holdout (docs with doc_id % 97 == 0
    stand in for an eval set).  Benchmark grams broadcast; the corpus
    is never shuffled."""
    from .llm.curation import decontaminate

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=5).select("doc_id", "lang", "source", "n_chars")


def llm_contamination_rate(spark, sf):
    """Per-source eval-leak report: fraction of docs sharing any 5-gram
    with the benchmark holdout -- the scoring view of decontamination
    (run it BEFORE deciding to filter; a high rate means the source
    itself is suspect)."""
    from .llm.curation import contaminated_ids

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    contam = contaminated_ids(docs, bench, n=5).withColumn("__c", F.lit(1))
    return (
        docs.join(F.broadcast(contam), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("__c"), F.lit(0))).cast("long").alias("n_contaminated"),
            (F.sum(F.coalesce(F.col("__c"), F.lit(0))) / F.count(F.lit(1))).alias(
                "contamination_rate"
            ),
        )
    )


def llm_contamination_overlap(spark, sf):
    """Graded per-document contamination: fraction of each doc's
    distinct 5-grams present in the benchmark holdout (doc_id % 97)
    -- the thresholdable view behind decontaminate's boolean."""
    from .llm.curation import contamination_overlap

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_overlap(docs, bench, n=5)


def llm_stratified_sample(spark, sf):
    """Deterministic per-language downsampling (en 50%, zh 20%, rest
    10%) by doc_id mod 100 -- reproducible across engines, so it
    oracle-checks exactly."""
    from .llm.curation import stratified_sample

    docs = _t(spark, sf, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 50, "zh": 20}, default_pct=10
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def llm_split_assign(spark, sf):
    """Deterministic 80/10/10 train/val/test assignment by doc_id
    bucket."""
    from .llm.curation import split_assign

    docs = _t(spark, sf, "documents")
    return split_assign(docs, "doc_id").select("doc_id", "lang", "split")


def llm_corpus_shuffle(spark, sf):
    """Deterministic global training-order shuffle: every doc gets its
    0-based position in the md5-keyed permutation, computed with the
    scalable bucket-offset scheme (no single-partition window)."""
    from .llm.curation import shuffle_index

    docs = _t(spark, sf, "documents")
    return shuffle_index(docs, "doc_id").select("doc_id", "lang", "shuffle_pos")


def llm_shard_layout(spark, sf):
    """Training-shard materialization (io.write_training_shards): the
    corpus lands as 4 equal, deterministically shuffled
    `path/shard=K/` partitions -- the layout a data-parallel trainer
    reads (worker K scans only shard=K).  Write-once dir keyed on the
    source parquet identity; the query reads the LAYOUT back and
    summarizes each shard, and the oracle recomputes the same
    md5-permutation + round-robin assignment from scratch in DuckDB --
    so the on-disk placement itself is what gets certified."""
    import hashlib
    import os
    import tempfile

    from .io import write_training_shards

    src = os.path.join(sf, "documents.parquet")
    try:
        st = os.stat(src)
        sig = f"{src}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        sig = src
    tag = hashlib.md5(sig.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_shards_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_training_shards(
            _t(spark, sf, "documents").select("doc_id", "lang", "n_chars"),
            path,
            n_shards=4,
        )
    shards = spark.read.parquet(path)
    return shards.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("shuffle_pos").alias("min_pos"),
        F.max("shuffle_pos").alias("max_pos"),
        F.count_distinct("doc_id").cast("long").alias("n_distinct_docs"),
    )


def llm_weighted_sample(spark, sf):
    """Weighted sampling without replacement: per (source, lang) group,
    the 5 docs with highest u^(1/n_chars) priority -- deterministic,
    exactly reproducible in DuckDB."""
    from .llm.curation import weighted_sample_topk

    docs = _t(spark, sf, "documents").withColumn(
        "grp", F.concat_ws("/", "source", "lang")
    )
    out = weighted_sample_topk(docs, "grp", "doc_id", "n_chars", k=5)
    return out.select("doc_id", "grp", "n_chars")


def llm_curation_pipeline(spark, sf):
    """END-TO-END curation chain in one gate entry: quality cut ->
    eval-set decontamination -> fingerprint dedup (keep lowest id) ->
    split assignment -> deterministic shuffle order.  Certifies the
    COMPOSED dataflow (like pipe_pua does for the reference pipelines)
    against one DuckDB oracle that chains the same steps."""
    from .llm.curation import decontaminate, shuffle_index, split_assign
    from .llm.dedup import fingerprint_dedup

    docs = _t(spark, sf, "documents")
    q = docs.filter(F.col("n_chars") >= 100)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    d = decontaminate(q, bench, n=5)
    keepers = fingerprint_dedup(d).select(F.col("keeper_id").alias("doc_id"))
    kept = d.join(keepers, "doc_id", "left_semi")
    out = shuffle_index(split_assign(kept, "doc_id"), "doc_id")
    return out.select("doc_id", "lang", "source", "split", "shuffle_pos")


def llm_pack_sequences(spark, sf):
    """Greedy FFD sequence packing per source -- VALUE-checked: the
    oracle replays the fold as a recursive CTE carrying the open-bin
    capacity vector as list state, one doc per group per iteration
    (invariants additionally asserted in tests/test_llm_ops.py)."""
    from .llm.curation import pack_sequences

    return pack_sequences(_t(spark, sf, "documents"), budget=256)


def llm_corpus_stats(spark, sf):
    """Per-(source, lang) corpus report card in one aggregation."""
    from .llm.curation import corpus_stats

    return corpus_stats(_t(spark, sf, "documents"))


def llm_dup_clusters(spark, sf):
    """Near-dup pairs resolved into duplicate clusters: connected
    components via iterative min-label propagation over the exact
    Jaccard edge list (driver-controlled fixpoint loop, the canonical
    Spark iterative-graph shape).  Oracle is a DuckDB recursive CTE."""
    docs = _t(spark, sf, "documents")
    edges = LD.jaccard_pairs(docs, threshold=0.4, n=3)
    return LD.duplicate_clusters(docs, edges)


def llm_near_dedup_corpus(spark, sf):
    """End-to-end near-dedup: exact Jaccard edges -> connected-component
    clusters -> keep the min-id doc per cluster -> cleaned corpus.  The
    full curation composite, exact at every stage (cluster stage is the
    iterative min-label loop; oracle replays it as a recursive CTE)."""
    docs = _t(spark, sf, "documents")
    edges = LD.jaccard_pairs(docs, threshold=0.4, n=3)
    clusters = LD.duplicate_clusters(docs, edges)
    keepers = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    return docs.join(keepers, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


def llm_near_dedup_keep_best(spark, sf):
    """Near-dedup resolution keeping the BEST duplicate (longest doc,
    id tiebreak) per cluster instead of the lowest id -- production
    dedup keeps the highest-quality copy, not the first-seen one.
    Cluster stage identical to llm_near_dedup_corpus; only the keeper
    rule changes (one bounded rank window per cluster)."""
    from pyspark.sql import Window

    docs = _t(spark, sf, "documents")
    edges = LD.jaccard_pairs(docs, threshold=0.4, n=3)
    clusters = LD.duplicate_clusters(docs, edges)
    ranked = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    keepers = (
        ranked.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


def llm_quality_filter(spark, sf):
    """Exact top-half-per-language cut by unique-token ratio
    (percent_rank window, doc_id tiebreak -> deterministic kept set)."""
    from .llm.curation import percentile_filter
    from .llm.text import quality_features

    # no rounding: the ratio divides exact longs, so the double is
    # bit-identical across engines and the rank cut can't drift
    scored = quality_features(_t(spark, sf, "documents")).select(
        "doc_id", "lang", F.col("q_unique_token_ratio").alias("score")
    )
    return percentile_filter(scored, "score", "lang", keep_top_frac=0.5)


def llm_cross_dedup(spark, sf):
    """Cross-corpus dedup: drop docs from later sources whose
    normalized fingerprint already occurs in the src0/src1 'previous
    mix'.  Digest-only anti-join -- text never shuffles."""
    from .llm.curation import cross_dedup

    docs = _t(spark, sf, "documents")
    seen = docs.filter(F.col("source").isin("src0", "src1"))
    rest = docs.filter(~F.col("source").isin("src0", "src1"))
    return cross_dedup(rest, seen).select("doc_id", "lang", "source", "n_chars")


def llm_chunk_documents(spark, sf):
    """Sliding-window chunking (32-token windows, stride 24) --
    narrow fan-out at scan speed."""
    from .llm.curation import chunk_documents

    return chunk_documents(_t(spark, sf, "documents"), chunk_tokens=32, stride=24)


def llm_mixture_weights(spark, sf):
    """Temperature-scaled (alpha=0.7) per-source mixture weights."""
    from .llm.curation import mixture_weights

    return mixture_weights(_t(spark, sf, "documents"), "source", alpha=0.7)


def llm_redact(spark, sf):
    """PII redaction pass: returns per-doc redacted length + how many
    characters were dropped (0 on this synthetic corpus -- the pytest
    fixture carries real-shaped PII; the gate checks the transform is
    lossless where nothing matches)."""
    from .llm.curation import redact_pii

    d = _t(spark, sf, "documents")
    red = redact_pii("text")
    return d.select(
        "doc_id",
        F.length(red).cast("long").alias("n_chars_redacted"),
        (F.length("text") - F.length(red)).cast("long").alias("n_chars_dropped"),
    )


def s8_jsonl_roundtrip(spark, sf):
    """documents -> JSONL sink -> JSONL scan (explicit schema) -> stats.
    The oracle reads the same rows from parquet, so the roundtrip must
    be lossless for the check to hash-match."""
    import os
    import tempfile

    from .io import read_jsonl, write_jsonl

    d = _t(spark, sf, "documents").select("doc_id", "lang", "text")
    tag = _source_tag(sf, "documents")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_docs_jsonl_{tag}")
    # write once per sf_dir: re-writing would invalidate DataFrames
    # returned by earlier invocations (FILE_NOT_EXIST on their scan)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_jsonl(d, path)
    back = read_jsonl(spark, path, schema="doc_id long, lang string, text string")
    return back.select("doc_id", "lang", F.length("text").cast("long").alias("n_chars"))


def mm_features(spark, sf):
    """VALUE-checked feature extraction (flipped rows-only -> oracle,
    r8): extract_features in STRICT mode (use_stub=False) over the
    deterministic lossless subset -- PPM images + WAV audio -- so every
    float in the 8-dim feature vector (dims, channel means, std, max /
    rate, count, moments, zero-crossings) is re-derived by the DuckDB
    oracle from the generator formulas (round-6 recipe).  PNG is
    excluded only because its n_bytes = deflate length isn't
    formula-replayable, JPEG because its pixels are lossy; the
    opaque-payload crc32 FALLBACK lane stays pinned in
    tests/test_multimodal.py."""
    m = synth_media(spark, 64)
    sub = m.filter(
        F.element_at(F.col("meta"), F.lit("codec")).isin("ppm", "wav")
    )
    return extract_features(sub, use_stub=False)


def mm_frame_sample(spark, sf):
    """Frame-index sampling over video rows (flipped rows-only ->
    oracle, r8): pure Catalyst sequence+explode, and the opaque payload
    is sha256(media_id) by construction, which DuckDB re-derives with
    sha256(..) -- so even the payload is value-checked (hex-encoded for
    the compare: binary columns don't survive every engine's
    canonicalize/sort path)."""
    out = sample_frames(synth_media(spark, 64), every_n=2)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.lower(F.hex("payload")).alias("payload_sha"),
    )


def e17_json_extract(spark, sf):
    """Semi-structured extraction: parse the JSON props column with an
    EXPLICIT schema (schema inference over a 100 TB column is a second
    full scan) and surface a typed field.  Malformed rows -> null struct,
    the coerce-to-null house rule."""
    ev = _t(spark, sf, "events")
    parsed = F.from_json(F.col("props"), "k int")
    return ev.select(
        "event_id",
        parsed.getField("k").cast("long").alias("prop_k"),
    )


def w_period_over_period(spark, sf):
    """Day-over-day event volume per type with absolute and percent
    change (lag window over the daily rollup -- the rollup is tiny, so
    the window state is days x types)."""
    from pyspark.sql import Window

    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n").over(w)
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n") - prev).cast("long").alias("delta"),
        F.when(prev > 0, (F.col("n") - prev) / prev).alias("pct_change"),
    )


def w_decayed_counts(spark, sf):
    """Exponentially time-decayed event counts per (user, type): each
    event contributes exp(-age/tau) relative to the corpus max ts --
    the recency-weighted engagement score, computed in one aggregate
    (decimal-rounded terms so the sum is order-independent)."""
    from . import expressions as E

    ev = _t(spark, sf, "events")
    ref = ev.agg(F.max("ts").alias("__ref"))
    tau_s = 7 * 86400.0
    age_s = (
        E.epoch_micros(F.col("__ref")) - E.epoch_micros(F.col("ts"))
    ).cast("double") / F.lit(1_000_000.0)
    term = F.round(F.exp(-age_s / F.lit(tau_s)), 9).cast("decimal(18,9)")
    return (
        ev.join(F.broadcast(ref))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(term).cast("double").alias("decayed_count"),
        )
    )


def w_sessionize(spark, sf):
    """Row-level session ids per user (30-min inactivity gap), the
    primitive behind session-scoped features -- one window pass,
    event_id tiebreak for determinism."""
    from .streaming.windows import sessionize

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    return sessionize(ev, "user_id", "ts", 1800, order_cols=["event_id"])


def w_coverage(spark, sf):
    """Per-user active-time coverage: union length of 10-minute event
    intervals via the single-pass running-max sweep (no interval
    explosion, no self-join)."""
    from .streaming.windows import interval_coverage

    ev = _t(spark, sf, "events").select(
        "user_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("iv_end"),
    )
    return interval_coverage(ev, "user_id", "iv_start", "iv_end")


def w_attribution(spark, sf):
    """Last-touch attribution with a lookback window, composed from the
    as-of join: each purchase is attributed to the user's latest click
    at most 30 minutes before it; older or absent clicks leave the
    purchase unattributed (nulls).  The tolerance filter is applied
    AFTER the single-shuffle as-of match -- never a range join."""
    from . import expressions as E
    from .joins import asof_join_backward

    purchases = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", F.col("value").alias("purchase_value"))
    )
    clicks = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    j = asof_join_backward(
        purchases, clicks, by="user_id", ts="ts",
        value_cols=["click_id"], right_ts_alias="click_ts",
    )
    age_ok = (
        E.epoch_micros(F.col("ts")) - E.epoch_micros(F.col("click_ts"))
    ) <= 30 * 60 * 1_000_000
    keep = F.col("click_ts").isNotNull() & age_ok
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.when(keep, F.col("click_id")).alias("attributed_click_id"),
        F.when(keep, F.col("click_ts")).alias("attributed_click_ts"),
    )


def j10_asof_backward(spark, sf):
    """As-of join: each event picks up the user's latest prior (or
    simultaneous) purchase value.  Oracle is DuckDB's native ASOF JOIN."""
    from .joins import asof_join_backward

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    purchases = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )
    out = asof_join_backward(
        ev, purchases, by="user_id", ts="ts",
        value_cols=["purchase_value"], right_ts_alias="purchase_ts",
    )
    return out.select("event_id", "user_id", "event_type", "purchase_ts", "purchase_value")


def j10b_asof_forward(spark, sf):
    """Forward as-of join: each event picks up the user's NEXT (or
    simultaneous) purchase value.  Oracle is DuckDB ASOF with the
    inequality reversed."""
    from .joins import asof_join_forward

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    purchases = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )
    out = asof_join_forward(
        ev, purchases, by="user_id", ts="ts",
        value_cols=["purchase_value"], right_ts_alias="purchase_ts",
    )
    return out.select("event_id", "user_id", "event_type", "purchase_ts", "purchase_value")


def j10c_asof_nearest(spark, sf):
    """Nearest as-of join (tie -> prior): closest purchase in either
    direction per user.  Oracle combines DuckDB's backward and forward
    ASOF joins with the same tie rule."""
    from .joins import asof_join_nearest

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    purchases = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )
    out = asof_join_nearest(
        ev, purchases, by="user_id", ts="ts",
        value_cols=["purchase_value"], right_ts_alias="purchase_ts",
    )
    return out.select("event_id", "user_id", "event_type", "purchase_ts", "purchase_value")


def a11_group_stats(spark, sf):
    """Exact per-type descriptive stats (decimal power sums -> IEEE
    finish); the A/B-readout aggregate."""
    from .aggregates import group_stats

    return group_stats(_t(spark, sf, "events"), "event_type", "value")


def a13_group_corr(spark, sf):
    """Exact Pearson corr(value, hour-of-day) per event type (decimal
    power sums -> IEEE finish)."""
    from .aggregates import group_corr

    ev = _t(spark, sf, "events").withColumn("hod", F.hour("ts").cast("double"))
    return group_corr(ev, "event_type", "value", "hod")


def a42_group_ols(spark, sf):
    """Exact per-type OLS trend of event value over time (y ~ a+b*day,
    x anchored at 2024-01-01): slope/intercept/R^2 finished from the
    same decimal power sums as a13 -- the per-key drift detector, one
    shuffle carrying 6 numbers per group."""
    from .aggregates import group_ols

    ev = _t(spark, sf, "events").withColumn(
        "day_x",
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))).cast(
            "double"
        ),
    )
    return group_ols(ev, "event_type", "day_x", "value")


def a43_sketch_overlap(spark, sf):
    """Pairwise distinct-user overlap between event types via HLL
    inclusion-exclusion (aggregates.sketch_overlap_distinct): one
    sketch per type, |sets|^2 sketch-row pair join -- the facts are
    scanned once.  md5-register sketches -> the DuckDB oracle
    VALUE-checks every estimate; tolerance vs exact intersections
    additionally pinned in pytest."""
    from .aggregates import sketch_overlap_distinct

    return sketch_overlap_distinct(
        _t(spark, sf, "events"), "event_type", "user_id"
    )


def a49_kmv_set_ops(spark, sf):
    """KMV bottom-k sketch set algebra between DAILY audiences
    (aggregates.kmv_set_ops): distinct union / intersection / BOTH
    difference estimates per day pair -- "how many users did Tuesday
    have that Monday didn't" without exact distinct joins.  Set
    DIFFERENCES are the capability HLL inclusion-exclusion (a43)
    cannot provide.  Knuth-hash samples are engine-portable integers,
    so every estimate is VALUE-checked against DuckDB; accuracy vs
    exact set ops pinned in pytest."""
    from .aggregates import kmv_set_ops

    ev = _t(spark, sf, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    return kmv_set_ops(ev, "day", "user_id", k=64)


def a50_skew_agg(spark, sf):
    """Skew-safe two-phase aggregation (aggregates.skew_agg): hot
    event types are salted over 32 reducers for the sum/count phase
    and the exact distinct goes through a (key, user) pre-dedup --
    the rewrites that keep a hot key from funneling 100 TB through
    one task.  Exact (DECIMAL-summed), so fully VALUE-checked."""
    from .aggregates import skew_agg

    return skew_agg(
        _t(spark, sf, "events"), "event_type", "value", "user_id",
        salt_buckets=32,
    )



def a51_heavy_hitters(spark, sf):
    """Exact phi-heavy hitters without a full-cardinality shuffle
    (aggregates.heavy_hitters): per-partition Misra-Gries candidate
    summaries (bounded state, no shuffle) + exact recount of the
    candidate superset only.  Output is exact -> full value oracle;
    the scale win is that billions of distinct keys never shuffle."""
    from .aggregates import heavy_hitters

    return heavy_hitters(
        _t(spark, sf, "events"), "event_type", phi=0.15, member_cap=256
    )



def a52_ks_test(spark, sf):
    """Two-sample Kolmogorov-Smirnov between click and purchase event
    values (aggregates.ks_test): right-continuous ECDF sup-difference
    + the asymptotic lambda scale -- the distribution-SHAPE sibling of
    a45's location test.  Integer cumulative counts -> exact D before
    one rounding; fully VALUE-checked."""
    from .aggregates import ks_test

    return ks_test(
        _t(spark, sf, "events"), "event_type", "value", "click", "purchase"
    )


def a45_mann_whitney(spark, sf):
    """Nonparametric A/B readout: Mann-Whitney U between click and
    purchase event values (aggregates.mann_whitney_u) -- mid-rank
    ties, tie-corrected z, rank-biserial effect size.  Integer-exact
    rank sums; one global value rank + metadata-scale aggregates."""
    from .aggregates import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf, "events"), "event_type", "value", "click", "purchase"
    )


def a53_kruskal_wallis(spark, sf):
    """k-group nonparametric location test: Kruskal-Wallis H across
    ALL five event types' values (aggregates.kruskal_wallis) -- the
    k-sample extension of a45, on the same rank machinery
    (_value_running_totals; no corpus-scale single-partition window).
    Integer-exact doubled rank sums, per-group terms quantized to
    DECIMAL(38,3) before the cross-group sum; fully VALUE-checked."""
    from .aggregates import kruskal_wallis

    return kruskal_wallis(_t(spark, sf, "events"), "event_type", "value")


def a54_brown_forsythe(spark, sf):
    """Equality-of-spreads test: Brown-Forsythe (median-centered
    Levene) F over the five event types' values
    (aggregates.brown_forsythe) -- completes the nonparametric battery
    (a45/a53 location, a52 shape, THIS spread).  Exact per-group
    medians via the partitioned bucketed-rank machinery; DECIMAL-
    quantized deviation sums; fully VALUE-checked."""
    from .aggregates import brown_forsythe

    return brown_forsythe(_t(spark, sf, "events"), "event_type", "value")


def a55_welch_ttest(spark, sf):
    """Parametric partner of the rank battery: Welch's unequal-variance
    t-test between click and purchase event values
    (aggregates.welch_ttest) -- difference of means with the
    Welch-Satterthwaite df, from ONE map-side-combined aggregate of
    DECIMAL-quantized power sums.  No rank, no window, no join; fully
    VALUE-checked."""
    from .aggregates import welch_ttest

    return welch_ttest(
        _t(spark, sf, "events"), "event_type", "value", "click", "purchase"
    )


def llm_rouge(spark, sf):
    """ROUGE-1 + ROUGE-2 between adjacent-id document pairs (the
    stand-in for a (reference, model-output) eval table):
    text.rouge_n's multiset clipped-count precision/recall/F1, both
    n levels in one frame.  Exact long counts; P/R/F1 divide exact
    longs; fully VALUE-checked."""
    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("ref_id"))
    b = d.select((F.col("doc_id") - 1).alias("ref_id"), F.col("doc_id").alias("cand_id"))
    # the id-adjacency spine feeds the kernel's pair-side joins:
    # materialize it once (two id-column rows per pair)
    pairs = a.join(b, "ref_id").localCheckpoint(eager=True)
    # both n levels in ONE (level, gram) kernel pass -- a per-level
    # rouge_n union re-executed the whole kernel per branch (r10 opt)
    return LT.rouge_scores(d, pairs, ns=(1, 2))


def llm_bleu(spark, sf):
    """Sentence-level BLEU-4 over the same adjacent-id pair spine as
    llm_rouge (text.bleu_score): brevity-penalized geometric mean of
    clipped 1..4-gram precisions, classic unsmoothed zeros.  Exact
    long counts; fixed-order log arithmetic; fully VALUE-checked."""
    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("ref_id"))
    b = d.select((F.col("doc_id") - 1).alias("ref_id"), F.col("doc_id").alias("cand_id"))
    pairs = a.join(b, "ref_id").localCheckpoint(eager=True)
    return LT.bleu_score(d, pairs, max_n=4)


def llm_rouge_l(spark, sf):
    """ROUGE-L (LCS-based P/R/F1, text.rouge_l) over a bounded 50-doc
    eval slice of the adjacent-id pair spine -- eval sets are
    fixed-size in practice, and the bound keeps the O(n*m) per-pair
    DP (mapInPandas lattice kernel, the Viterbi precedent) replayable
    by the oracle's recursive-CTE cell-at-a-time walk.  Exact integer
    LCS; fully VALUE-checked."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    a = d.select(F.col("doc_id").alias("ref_id"))
    b = d.select((F.col("doc_id") - 1).alias("ref_id"), F.col("doc_id").alias("cand_id"))
    pairs = a.join(b, "ref_id").localCheckpoint(eager=True)
    return LT.rouge_l(d, pairs)


def llm_bleu_corpus(spark, sf):
    """Corpus-level BLEU-4 over the adjacent-id pair spine
    (text.bleu_corpus): clipped matches and totals summed over ALL
    pairs before the precision / geo-mean / brevity-penalty finish --
    the Papineni corpus form, one row out.  Exact long sums through
    the same single-pass kernel as llm_bleu; fully VALUE-checked."""
    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("ref_id"))
    b = d.select((F.col("doc_id") - 1).alias("ref_id"), F.col("doc_id").alias("cand_id"))
    pairs = a.join(b, "ref_id").localCheckpoint(eager=True)
    return LT.bleu_corpus(d, pairs, max_n=4)


def llm_chrf(spark, sf):
    """chrF2 over the same adjacent-id pair spine as llm_rouge/llm_bleu
    (text.chrf_score): character-n-gram (n=1..6, spaces removed) mean
    clipped precision/recall, recall-weighted F (beta=2) -- the
    tokenization-robust WMT eval metric.  Same single-pass
    (level, gram) kernel as BLEU in char mode; exact long counts,
    fixed-order float finish; fully VALUE-checked."""
    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("ref_id"))
    b = d.select((F.col("doc_id") - 1).alias("ref_id"), F.col("doc_id").alias("cand_id"))
    pairs = a.join(b, "ref_id").localCheckpoint(eager=True)
    return LT.chrf_score(d, pairs, max_n=6, beta=2.0)


def llm_js_divergence(spark, sf):
    """Jensen-Shannon divergence between the even- and odd-doc-id
    corpus slices' unigram distributions (text.js_divergence) -- the
    bounded symmetric token-mix drift scalar next to llm_mix_drift's
    source-share L1.  Per-token contributions quantize to
    DECIMAL(28,12) before the vocabulary sum; fully VALUE-checked."""
    d = _t(spark, sf, "documents")
    return LT.js_divergence(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
    )


def a48_bootstrap_ci(spark, sf):
    """Distributed bootstrap CI for per-priority mean order price
    (aggregates.bootstrap_ci): deterministic Poisson(1) weights from
    md5-hex CDF cutoffs -- one pass, R=200 replicates folded into the
    aggregation shuffle, rank-selected 2.5%/97.5% bounds.  The oracle
    reproduces the exact weights, so the CI VALUES are checked."""
    from .aggregates import bootstrap_ci

    return bootstrap_ci(
        _t(spark, sf, "orders"),
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        n_replicates=200,
    )


def a46_itemsets(spark, sf):
    """Apriori frequent itemsets (sizes 1-3, support >= 2) over the
    order->part baskets (aggregates.frequent_itemsets): every
    candidate level pruned by its frequent subsets before counting."""
    from .aggregates import frequent_itemsets

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return frequent_itemsets(li, "l_orderkey", "l_partkey", min_support=2)


def a47_assoc_rules(spark, sf):
    """Association rules over the order->part baskets
    (aggregates.association_rules): X -> Y confidence and lift from
    the L2/L1 supports, both directions, rule table is
    frequent-pair-cardinality."""
    from .aggregates import association_rules

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return association_rules(li, "l_orderkey", "l_partkey", min_support=3)


def a44_join_size_est(spark, sf):
    """CMS inner-product join-size estimate (aggregates.cms_join_size)
    for orders ⋈ lineitem on orderkey -- the broadcast/salt/bucket
    planning number without running the join.  md5-hex cells -> the
    DuckDB oracle re-derives both sketches and VALUE-checks the
    estimate; the never-underestimates bound and accuracy vs the true
    join size are additionally pinned in pytest."""
    from .aggregates import cms_build, cms_join_size

    o = cms_build(_t(spark, sf, "orders"), "o_orderkey")
    li = cms_build(_t(spark, sf, "lineitem"), "l_orderkey")
    return cms_join_size(o, li)


def a4_hll_distinct(spark, sf):
    """HLL distinct users per event type.  md5-register sketch
    (aggregates.hll_distinct) -> deterministic across engines, so the
    DuckDB oracle VALUE-checks the estimates; tolerance vs exact
    additionally asserted in pytest."""
    from .aggregates import hll_distinct

    return hll_distinct(_t(spark, sf, "events"), "event_type", "user_id")


def a5_approx_quantiles(spark, sf):
    from .aggregates import approx_quantiles

    return approx_quantiles(_t(spark, sf, "events"), "event_type", "value")


def st_tumbling(spark, sf):
    """Structured Streaming tumbling counts, drained AvailableNow into a
    memory sink -- hash-checked against the SAME DuckDB oracle as the
    batch form (shared agg expressions; only watermark/trigger differ)."""
    run_to_memory(
        streaming_tumbling_counts(_event_stream(spark, sf), "1 hour"), "st_tumbling_out"
    )
    return spark.table("st_tumbling_out")


def st_topk(spark, sf):
    """Streaming per-window top-k event types: watermarked tumbling
    counts maintain bounded (window x key) state; the drained sink is
    finished by a deterministic rank (streams.topk_finish) -- the
    standard streaming-top-k split, VALUE-checked against the batch
    SQL."""
    from .streaming.streams import topk_finish

    run_to_memory(
        streaming_tumbling_counts(_event_stream(spark, sf), "1 hour"),
        "st_topk_out",
    )
    return topk_finish(spark.table("st_topk_out").select(
        "window_start", "event_type", "n_events"), k=3)


def st_distinct_hll(spark, sf):
    """Streaming approximate distinct users per tumbling hour with
    BOUNDED state (streaming/streams.streaming_distinct_hll): the
    stream holds <= 4096 md5-HLL register rows per window instead of
    every distinct key; the drained register sink folds to estimates
    in one batch pass.  Deterministic end state -> the DuckDB oracle
    re-derives the per-window estimates from raw events and
    VALUE-checks them."""
    from .aggregates import hll_md5_estimate
    from .streaming.streams import streaming_distinct_hll

    run_to_memory(
        streaming_distinct_hll(_event_stream(spark, sf), "1 hour"),
        "st_hll_regs_out",
    )
    regs = spark.table("st_hll_regs_out")
    return hll_md5_estimate(regs, ["window_start"], "distinct_est")


def st_sliding(spark, sf):
    """Streaming sliding windows drained AvailableNow -- same DuckDB
    oracle as the batch w_sliding (shared agg expressions)."""
    run_to_memory(
        streaming_sliding_counts(_event_stream(spark, sf), "2 hours", "1 hour"),
        "st_sliding_out",
    )
    return spark.table("st_sliding_out")


def st_session(spark, sf):
    """Streaming sessionization drained AvailableNow -- same DuckDB
    oracle as the batch w_session."""
    run_to_memory(
        streaming_session_counts(_event_stream(spark, sf), "30 minutes"),
        "st_session_out",
    )
    return spark.table("st_session_out")


def st_enrich(spark, sf):
    """Stream-static enrichment: the event stream picks up a per-type
    mean from a BATCH-computed dimension snapshot (broadcast, as in
    batch); oracle joins the same aggregate in SQL."""
    dim = (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("type_mean")
        )
    )
    run_to_memory(
        streaming_static_enrich(_event_stream(spark, sf), dim).select(
            "event_id", "event_type", "type_mean"
        ),
        "st_enrich_out",
        output_mode="append",
    )
    return spark.table("st_enrich_out")


def st_interval_join(spark, sf):
    """Watermarked stream-stream interval join (click -> same-user
    purchases within 1h); oracle is the plain SQL interval join."""
    run_to_memory(
        streaming_interval_join(_event_stream(spark, sf), "1 hour"),
        "st_interval_out",
        output_mode="append",
    )
    return spark.table("st_interval_out")


def st_interval_join_outer(spark, sf):
    """LEFT OUTER watermarked stream-stream interval join.  Oracle:
    batch left join filtered to the rows the final watermark proves
    emittable -- matched rows, plus unmatched clicks whose joinable
    horizon lies below min(per-side max ts) - watermark delay (the
    end-of-stream rows the stream withholds are exactly the ones the
    filter drops)."""
    from .streaming.streams import streaming_interval_join_outer

    run_to_memory(
        streaming_interval_join_outer(_event_stream(spark, sf), "1 hour"),
        "st_interval_outer_out",
        output_mode="append",
    )
    return spark.table("st_interval_outer_out")


def st_interval_join_full(spark, sf):
    """FULL OUTER watermarked stream-stream interval join.  Oracle:
    batch full join filtered to the watermark-emittable rows -- matched
    always; unmatched clicks once click_ts + horizon clears the final
    watermark; unmatched purchases once purchase_ts itself does (no
    earlier click can still arrive)."""
    from .streaming.streams import streaming_interval_join_full

    run_to_memory(
        streaming_interval_join_full(_event_stream(spark, sf), "1 hour"),
        "st_interval_full_out",
        output_mode="append",
    )
    return spark.table("st_interval_full_out")


def st_custom_source(spark, sf):
    """Custom Python streaming data source (datasources.py
    SyntheticEventsDataSource): offset-tracked micro-batch reader
    drained with trigger(availableNow) -- rows are a pure function of
    the offset, so the DuckDB oracle regenerates the identical stream
    from a range and the gate value-checks the whole drain."""
    from .datasources import register_synthetic_events_source

    register_synthetic_events_source(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("n_total", 2000)
        .option("n_parts", 8)
        .load()
    )
    run_to_memory(sdf, "st_custom_source_out", output_mode="append")
    return spark.table("st_custom_source_out")


def st_cdc_upsert(spark, sf):
    """Streaming CDC apply (streams.streaming_upsert_sink): the event
    stream lands through foreachBatch -> merge_upsert into a parquet
    target seeded with an early snapshot; keep-latest per user by
    event_id (unique -> fully deterministic).  Crash-replay converges
    because the merge is idempotent; repeat invocations are no-ops via
    the stream checkpoint.  The final TARGET STATE is VALUE-checked
    against the batch keep-latest over all events."""
    import os
    import tempfile

    from .streaming.streams import streaming_upsert_sink

    tag = _source_tag(sf, "events")
    target = os.path.join(tempfile.gettempdir(), f"spark_graft_cdc_tgt_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"spark_graft_cdc_ck_{tag}")
    cols = ["event_id", "user_id", "event_type", "value"]
    if not os.path.exists(os.path.join(target, "_SUCCESS")):
        seed = (
            load_table(spark, sf, "events")
            .filter(F.dayofmonth("ts") <= 5)
            .select(*cols)
        )
        from .dedup import keep_first

        # seed = per-user max event_id among the early slice
        seed_latest = keep_first(
            seed.withColumn("__neg", -F.col("event_id")), ["user_id"], F.col("__neg")
        ).drop("__neg")
        seed_latest.write.mode("overwrite").parquet(target)
    stream = _event_stream(spark, sf).select(*cols)
    streaming_upsert_sink(stream, target, ["user_id"], "event_id", ckpt)
    return spark.read.parquet(target).select(*cols)


def st_zonemap_ingest(spark, sf):
    """Streaming ingest into a zone-mapped table
    (streams.streaming_zonemap_sink -> layout s31): the event stream
    lands range-clustered on `value` under batch-keyed file names with
    the `_zonemap.json` sidecar refreshed incrementally per commit --
    data skipping holds from the first micro-batch.  The gate reads a
    value range back THROUGH the pruned listing; zone pruning is
    recall-complete, so the aggregate equals the oracle's plain
    filtered scan of events.  Replay idempotence and actual
    file-skipping are pytest-pinned (tests/test_streaming.py)."""
    import os
    import tempfile

    from .layout import read_zonemap_pruned
    from .streaming.streams import streaming_zonemap_sink

    tag = _source_tag(sf, "events")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_zmst_{tag}")
    ckpt = os.path.join(tempfile.gettempdir(), f"spark_graft_zmck_{tag}")
    # ALWAYS drain: the sidecar exists after the FIRST commit, so its
    # presence can't stand in for drain completion (a crashed partial
    # ingest would otherwise freeze forever); the checkpoint makes a
    # caught-up re-drain a cheap no-op and a partial one resume
    streaming_zonemap_sink(
        _event_stream(spark, sf).select(
            "event_id", "user_id", "event_type", "value"
        ),
        path,
        "value",
        ckpt,
    )
    pruned = read_zonemap_pruned(spark, path, "value", 100.0, 200.0)
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
    )


def st_dedup(spark, sf):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) -- events
    are unique in the test tables, so output == input projection."""
    run_to_memory(
        streaming_dedup(_event_stream(spark, sf)).select("event_id", "user_id", "event_type"),
        "st_dedup_out",
        output_mode="append",
    )
    return spark.table("st_dedup_out")


def st_running_totals(spark, sf):
    """applyInPandasWithState per-user accumulator; final state per user
    == the batch aggregate (n_events is exact; the float total stays an
    engine-internal column, tested in tests/test_streaming.py)."""
    run_to_memory(
        streaming_running_totals(_event_stream(spark, sf)), "st_running_out",
        output_mode="update",
    )
    return (
        spark.table("st_running_out")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


def w_rolling(spark, sf):
    """Per-event trailing-1h count/sum for the same user (RANGE-frame
    window over epoch seconds)."""
    from .streaming.windows import rolling_agg

    return rolling_agg(_t(spark, sf, "events"), trailing_seconds=3600)


def w_zscore(spark, sf):
    """Rolling z-score anomaly flags per event type: each value scored
    against the preceding 50 same-type events (exact decimal moments)."""
    from .streaming.windows import zscore_anomalies

    return zscore_anomalies(_t(spark, sf, "events"), window_rows=50, threshold=3.0)


def w_ewma(spark, sf):
    """Bounded-frame exponentially weighted moving average per event
    type (adjust-form normalization; pure Catalyst window + array fold)."""
    from .streaming.windows import ewma

    return ewma(_t(spark, sf, "events"), alpha=0.9, window_rows=20)


def w_holt(spark, sf):
    """Holt level+trend smoothing of daily event volume per type, with
    the one-step-ahead forecast (streaming/windows.holt_linear): the
    sequential recurrence runs as one array fold over the day-grain
    aggregate -- series length = #days, metadata-scale."""
    from .streaming.windows import holt_linear

    daily = (
        _t(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
    )
    return holt_linear(daily, "event_type", "d", "v", alpha=0.5, beta=0.25)


def w_holt_winters(spark, sf):
    """Additive Holt-Winters (level + trend + weekly seasonal profile)
    of daily event volume per type, with the one-step-ahead forecast
    (streaming/windows.holt_winters): init from the first 7 days, then
    one array fold per key over the remaining days -- series length =
    #days, metadata-scale; full DuckDB value oracle (same fold order)."""
    from .streaming.windows import holt_winters

    daily = (
        _t(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
    )
    return holt_winters(
        daily, "event_type", "d", "v", period=7, alpha=0.5, beta=0.25, gamma=0.5
    )


def mm_image_dedup(spark, sf):
    """Image near-dup candidates by perceptual dHash: decode -> gray
    9x8 difference hash -> 16-bit-chunk Hamming banding
    (llm/multimodal.image_dup_candidates over dedup.hamming_candidates64).
    The corpus is synth_media's LOSSLESS images (PPM + PNG, whose
    decoded pixels equal the synthesis formula bit-for-bit) plus an
    id-shifted copy, so every image has one planted exact perceptual
    duplicate AND the full dHash -> banded-pair path is value-checked:
    the DuckDB oracle replays pixel synthesis, the 9x8 nearest
    resample, the 64-bit pack, and the hamming<=3 pair join (pigeonhole
    makes banded candidates == all such pairs).  The lossy JPEG decode
    lanes stay pinned by pytest (test_jpeg.py) and the mm_jpeg_verify
    gate."""
    from .llm.multimodal import image_dup_candidates

    base = synth_media(spark, 96)
    shifted = synth_media(spark, 96).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    corpus = base.unionByName(shifted).filter(
        F.element_at(F.col("meta"), F.lit("codec")).isin("ppm", "png")
    )
    return image_dup_candidates(corpus, max_hamming=3)


def mm_audio_vad(spark, sf):
    """Energy-based voice-activity segments (llm/multimodal.audio_vad:
    framed RMS -> merged active runs, 5ms frames to fit the short
    synth clips) over the amplitude-MODULATED audio corpus with
    40-sample blocks -- exactly one block per 5ms/8kHz frame, so amp-0
    blocks are whole silent frames and the gate exercises real
    segmentation (the flat synth corpus keeps every frame active).
    VALUE-checked: frame energies are exact int64 sums of squared
    int16 samples the oracle re-derives from the generator formula;
    the active test, dBFS conversion, gaps-and-islands run merge, and
    3-decimal mean_db all replay in DuckDB (the float steps mirror the
    numpy operation order: /2^30 and /40 exact-then-rounded, sqrt,
    log10).  Non-silent frames sit >=0.02 dB (~0.5% relative energy)
    from the -30 dB threshold over this corpus -- ~12 orders of
    magnitude above cross-engine float divergence (~1e-16 relative),
    and tests/test_multimodal.py asserts the margin floor so a corpus
    or threshold change that lands a frame near the boundary fails
    loudly instead of going nondeterministic."""
    from .llm.multimodal import audio_vad, synth_audio_modulated

    return audio_vad(
        synth_audio_modulated(spark, 64, block=40, base_len=400), frame_ms=5
    )


def mm_audio_dedup(spark, sf):
    """Audio near-dup candidates by 64-bit ENERGY-ENVELOPE fingerprint
    (llm/multimodal.audio_dup_candidates method='envelope':
    integer time-slice x sub-band energy difference hash ->
    16-bit-chunk Hamming banding).  Corpus is synth_media plus an
    id-shifted copy so every clip has one planted exact duplicate, and
    the full WAV decode -> fingerprint -> banded-pair path is
    VALUE-checked: every energy is an exact int64 sum of squared int16
    samples, so the DuckDB oracle replays sample synthesis, the double
    array_split grid, the 64-bit signed pack, and the hamming<=3 pair
    join (pigeonhole makes banded candidates == all such pairs) -- the
    mm_image_dedup playbook applied to sound.  The corpus is the
    amplitude-MODULATED audio synth (synth_media's flat sawtooth has
    uniform energy, which collapses every envelope fingerprint to one
    value -- a hollow gate); clips discriminate, planted copies stay
    hamming 0.  The float spectral tier (method='spectral', |rfft|^2
    bands) stays pinned by pytest invariance/recall tests, like the
    lossy JPEG image lanes."""
    from .llm.multimodal import audio_dup_candidates, synth_audio_modulated

    base = synth_audio_modulated(spark, 32)
    shifted = synth_audio_modulated(spark, 32).withColumn(
        "media_id", F.col("media_id") + 1000
    )
    return audio_dup_candidates(
        base.unionByName(shifted), max_hamming=3, method="envelope"
    )


def mm_resize(spark, sf):
    """Resize kernel, VALUE-checked end-to-end (flipped rows-only ->
    oracle, r8): lossless rows decode -> nearest-neighbor resample ->
    PPM re-encode -> re-decode -> integer pixel stats
    (multimodal.resize_pixel_stats); the oracle replays the integer
    index map yi=y'*h//H, xi=x'*w//W over the generator pixel formula.
    JPEG-input resize stays pytest-covered (lossy pixels aren't
    formula-replayable)."""
    from .llm.multimodal import resize_pixel_stats

    return resize_pixel_stats(synth_media(spark, 64), width=64, height=64)


def mm_decode_quarantine(spark, sf):
    """Corrupt-media quarantine lane: the synthetic corpus with every
    5th payload deterministically damaged (hard truncation / mid-file
    byte flip / lying magic number -- llm/multimodal.corrupt_media),
    decoded through decode_quarantine so failures land in a typed
    status column instead of killing the task; per-(kind, codec,
    status) counts.  Rows-only gate (binary media has no SQL oracle);
    per-fixture status correctness pinned in pytest
    (tests/test_multimodal.py)."""
    from .llm.multimodal import corrupt_media, decode_quarantine

    media = corrupt_media(synth_media(spark, 96), every_n=5)
    return (
        decode_quarantine(media)
        .groupBy("kind", "codec", "status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("error").isNotNull(), 1))
            .cast("long")
            .alias("n_err"),
        )
        .orderBy("kind", "codec", "status")
    )


def w_funnel(spark, sf):
    """Ordered view->click->purchase funnel per user (strictly
    increasing timestamps between steps)."""
    from .streaming.windows import funnel_steps

    return funnel_steps(_t(spark, sf, "events"))


def w_cohort(spark, sf):
    """First-activity-day cohorts x day offset -> distinct active
    users (retention matrix)."""
    from .streaming.windows import cohort_retention

    return cohort_retention(_t(spark, sf, "events"))


def w_tumbling(spark, sf):
    return tumbling_agg(_t(spark, sf, "events"), "1 hour")


def w_sliding(spark, sf):
    return sliding_agg(_t(spark, sf, "events"), "2 hours", "1 hour")


def llm_kmeans(spark, sf):
    """Deterministic Lloyd k-means over the embeddings table (k=10,
    matching the generator's label count): per-cluster size plus the
    majority generator label and its count -- the cluster/label
    confusion summary.  Approximate-free but rows-only: float sum order
    differs across engines, and DuckDB has no iterative kmeans."""
    from .llm.similarity import kmeans_assign

    emb = _t(spark, sf, "embeddings")
    assigned, _ = kmeans_assign(emb, k=10, n_iter=3)
    lab = assigned.join(emb.select("vec_id", "label"), "vec_id")
    per = lab.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    top = per.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") == 1)
    sizes = lab.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_points"))
    return (
        sizes.join(
            top.select("cluster", F.col("label").alias("top_label"), F.col("n").alias("n_top_label")),
            "cluster",
        )
        .select("cluster", "n_points", "top_label", "n_top_label")
    )



def llm_kmeans_int(spark, sf):
    """All-integer k-means twin (similarity.kmeans_int): int8-quantized
    vectors, md5-sampled init, 2 Lloyd iterations with integer
    squared-L2 argmin and floor-mean centroid updates -- every quantity
    an integer, so the oracle replays BOTH unrolled iterations exactly
    (the clustering family's first full value oracle; the float tier
    llm_kmeans keeps its NumPy-replica pytest)."""
    from .llm.similarity import kmeans_int

    return kmeans_int(_t(spark, sf, "embeddings"), k=8, n_iter=2)



def llm_semantic_dedup_int(spark, sf):
    """Closed-form SemDeDup twin (similarity.semantic_dedup_int):
    integer k-means clusters + within-cluster earlier-neighbor shadow
    rule on quantized cosine -- entirely JVM-side Spark and fully
    VALUE-checked (the float greedy tier llm_semantic_dedup keeps its
    NumPy-replica pytest)."""
    from .llm.similarity import semantic_dedup_int

    return semantic_dedup_int(_t(spark, sf, "embeddings"), threshold=0.95)



def llm_ann_pq_int(spark, sf):
    """All-integer product-quantization ANN twin (similarity.ann_pq_int):
    md5-sampled subspace codebooks, integer-argmin codes, integer ADC
    ranking -- the PQ family's first fully VALUE-checked member (the
    float IVF-PQ production tier keeps its recall pytest)."""
    from .llm.similarity import ann_pq_int

    return ann_pq_int(_t(spark, sf, "embeddings"), k=5, n_codes=8, n_sub=4)



def llm_nb_classifier(spark, sf):
    """Naive-Bayes train-and-score twin (text.nb_classify): counting +
    add-1 smoothing + exact-decimal log sums make the WHOLE
    train->deploy loop VALUE-checked (the ridge tier
    llm_trained_classifier keeps its NumPy-replica pytest)."""
    return LT.nb_classify(_t(spark, sf, "documents"))



def llm_unigram_seed(spark, sf):
    """Unigram tokenizer SEED stage value-checked (unigram._seed_pieces):
    the substring-grid candidate table (all pieces <= 8 chars weighted
    by word count; every single char + the top-300 multis) that hard-EM
    refines -- the trainer's stage 0 now has a full DuckDB oracle (EM
    itself stays rows-only + replica-pytest)."""
    from .llm.unigram import _seed_pieces, word_counts

    return _seed_pieces(
        word_counts(_t(spark, sf, "documents")),
        max_piece_len=8, min_count=2, seed_size=300,
    )



def llm_char_entropy(spark, sf):
    """Shannon character entropy per doc (text.char_entropy): the
    closed-form compressibility bound -- the value-checked sibling of
    the zlib llm_compress_ratio signal (zlib itself has no SQL
    oracle)."""
    return LT.char_entropy(_t(spark, sf, "documents"))



def llm_viterbi_fixed(spark, sf):
    """Viterbi tokenization VALUE-checked end-to-end
    (unigram.viterbi_profile_int): seed piece table + floor-quantized
    integer log-probs + max-probability DP, replayed in DuckDB as a
    list-state recursive CTE over substr-join candidates -- the
    Viterbi algebra itself now carries a full oracle (the EM-trained
    tiers stay rows-only + replica pytests)."""
    from .llm.unigram import viterbi_profile_int

    return viterbi_profile_int(_t(spark, sf, "documents"))



def mm_decode_verify(spark, sf):
    """The multimodal family's first VALUE-checked decode: PPM and PNG
    payloads are decoded byte-for-byte (header parse; inflate +
    scanline unfilter) and reduced to integer pixel stats, which the
    oracle re-derives from the generator's arithmetic pixel formula
    without touching the bytes -- lossless codecs + deterministic
    pixels close the loop (multimodal.decode_pixel_stats).  JPEG stays
    rows-only (lossy)."""
    from .llm.multimodal import decode_pixel_stats, synth_media

    return decode_pixel_stats(synth_media(spark, 64))



def mm_wav_verify(spark, sf):
    """Value-checked WAV decode (multimodal.decode_sample_stats): the
    RIFF/PCM parse reduced to integer sample stats, re-derived by the
    oracle from the arithmetic sample formula -- the audio sibling of
    mm_decode_verify."""
    from .llm.multimodal import decode_sample_stats, synth_media

    return decode_sample_stats(synth_media(spark, 64))



def mm_gif_verify(spark, sf):
    """Value-checked GIF codec loop (multimodal.gif_roundtrip_stats):
    real LZW encode -> decode (interlace on odd ids) reduced to integer
    pixel stats that the oracle re-derives from the arithmetic pixel
    formula -- the GIF sibling of mm_decode_verify."""
    from .llm.multimodal import gif_roundtrip_stats

    return gif_roundtrip_stats(spark, 40)



def llm_lsh_eval(spark, sf):
    """Candidate-quality evaluation AS A GATE: the md5 MinHash-LSH
    candidate set joined against the exact Jaccard >= 0.4 truth set,
    reduced to one row of counts + ppm precision/recall -- the dedup
    tuning readout (band/threshold trade) computed engine-side and
    VALUE-checked by composing both tiers' own oracle SQLs (the
    composed-pipeline precedent)."""
    docs = _t(spark, sf, "documents")
    cands = LD.minhash_lsh_pairs_md5(docs).select("doc_a", "doc_b")
    truth = LD.jaccard_pairs(docs, threshold=0.4, n=3).select("doc_a", "doc_b")
    hits = cands.join(truth, ["doc_a", "doc_b"], "left_semi")
    nc = cands.count()
    nt = truth.count()
    nh = hits.count()
    return spark.createDataFrame(
        [(
            nc, nt, nh,
            # floor(x + 0.5), not Python round(): half-away matches
            # SQL round on the (positive) ppm values
            int(1_000_000 * nh / nc + 0.5) if nc else 0,
            int(1_000_000 * nh / nt + 0.5) if nt else 0,
        )],
        "n_candidates long, n_truth long, n_hits long, "
        "precision_ppm long, recall_ppm long",
    )



def llm_ann_eval(spark, sf):
    """ANN quality AS A GATE (the llm_lsh_eval pattern applied to the
    vector-search family): recall@5 of the IVF-Flat tier (llm_ann_ivf
    config) against the exact cosine top-5 truth set, one row of counts
    + ppm recall -- the n_probe/n_centroids tuning readout, computed
    engine-side and VALUE-checked by composing both tiers' own oracle
    SQLs so the eval can't drift from the gates it measures."""
    emb = _t(spark, sf, "embeddings")
    exact = LS.cosine_topk(emb, k=5).select("query_id", "neighbor_id")
    approx = LS.ivf_topk(emb, k=5, n_centroids=32, n_probe=8).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    ne, na, nh = exact.count(), approx.count(), hits.count()
    return spark.createDataFrame(
        [(
            ne, na, nh,
            # floor(x + 0.5): half-away matches SQL round on positives
            int(1_000_000 * nh / ne + 0.5) if ne else 0,
        )],
        "n_exact long, n_approx long, n_hits long, recall_ppm long",
    )


def llm_ann_pq_eval(spark, sf):
    """PQ-tier quality AS A GATE (llm_ann_eval's pattern applied to the
    product-quantization family): recall@5 of the all-integer PQ tier
    (llm_ann_pq_int config: 8 codes, 4 subspaces) against the exact
    cosine top-5 truth set, one row of counts + ppm recall -- the
    n_codes/n_sub quantization-loss readout, computed engine-side and
    VALUE-checked by composing both tiers' own oracle SQLs so the eval
    can't drift from the gates it measures.  (The PQ tier ranks by
    integer ADC L2 in code space while truth is exact cosine, so
    recall here quantifies exactly what deploying PQ costs.)"""
    from .llm.similarity import ann_pq_int

    emb = _t(spark, sf, "embeddings")
    exact = LS.cosine_topk(emb, k=5).select("query_id", "neighbor_id")
    approx = ann_pq_int(emb, k=5, n_codes=8, n_sub=4).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    ne, na, nh = exact.count(), approx.count(), hits.count()
    return spark.createDataFrame(
        [(
            ne, na, nh,
            # floor(x + 0.5): half-away matches SQL round on positives
            int(1_000_000 * nh / ne + 0.5) if ne else 0,
        )],
        "n_exact long, n_approx long, n_hits long, recall_ppm long",
    )


def llm_ann_lsh_eval(spark, sf):
    """Sign-LSH tier quality AS A GATE -- completes the ANN eval
    trilogy (IVF: llm_ann_eval, PQ: llm_ann_pq_eval): recall@5 of the
    4x6-bit sign-LSH tier against the exact cosine top-5 truth set,
    one row of counts + ppm recall, VALUE-checked by composing both
    tiers' own oracle SQLs.  LSH recall at this data's moderate
    cosines is bounded by collision-probability decay (see
    llm_ann_lsh) -- this gate is the num_tables/nbits tuning readout
    that quantifies exactly that."""
    emb = _t(spark, sf, "embeddings")
    exact = LS.cosine_topk(emb, k=5).select("query_id", "neighbor_id")
    approx = LS.lsh_topk(emb, k=5, num_tables=4, nbits=6).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    ne, na, nh = exact.count(), approx.count(), hits.count()
    return spark.createDataFrame(
        [(
            ne, na, nh,
            # floor(x + 0.5): half-away matches SQL round on positives
            int(1_000_000 * nh / ne + 0.5) if ne else 0,
        )],
        "n_exact long, n_approx long, n_hits long, recall_ppm long",
    )


def llm_winnowing(spark, sf):
    """Winnowing fingerprints (MOSS; text.winnowing_fingerprints):
    word-3-gram md5 hashes, window-4 minima -- any shared >= 6-word
    substring leaves a shared fingerprint at ~2/5 the k-gram storage.
    md5 string minima -> fully VALUE-checked per-doc profile."""
    return LT.winnowing_fingerprints(_t(spark, sf, "documents"), k=3, w=4)


def llm_semantic_dedup(spark, sf):
    """SemDeDup-style semantic dedup (cluster -> greedy within-cluster
    cosine shadowing): per-cluster kept/dropped counts.  The synthetic
    embeddings are near-isotropic (same-label mean cosine ~ 0), so the
    threshold sits at the distribution's upper tail (0.3) where real
    shadowing occurs.  Rows-only; the exact greedy contract is
    pytest-verified against a NumPy replica."""
    from .llm.similarity import semantic_dedup

    out = semantic_dedup(_t(spark, sf, "embeddings"), threshold=0.3, k=10, n_iter=3)
    return out.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
    )


def w_resample_filled(spark, sf):
    return resample_counts_filled(_t(spark, sf, "events"), "1 hour")


def w_gap_linear(spark, sf):
    """Dense hourly grid per event_type with exact decimal bucket
    totals; interior gaps linearly interpolated between the nearest
    observed buckets (fixed-order double arithmetic shared with the
    oracle), leading/trailing gaps left null."""
    from .streaming.windows import resample_linear

    return resample_linear(_t(spark, sf, "events"), "1 hour")


def w_session(spark, sf):
    return session_agg(_t(spark, sf, "events"), "30 minutes")


def llm_rep_signals(spark, sf):
    """Gopher-style repetition fractions (chars in duplicated 2-/3-
    grams per doc); exact longs divided once -> cross-engine doubles."""
    return LT.repetition_signals(_t(spark, sf, "documents"))


def llm_line_dedup(spark, sf):
    """C4-style line-level corpus dedup over synthesized 3-token lines
    (the corpus text has no newlines, so lines are derived identically
    in Spark and the oracle): global count > 2 -> keep only the
    canonical first occurrence, reassemble docs in order."""
    from .llm.curation import dedup_lines

    d = _t(spark, sf, "documents")
    # tokens bound once per row (text.bind1): an outer chain referenced
    # from the line lambda would re-tokenize per synthesized line
    lines = LT.bind1(
        LT.tokens(LT.normalize_text("text")),
        lambda toks: F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(1), F.size(toks), F.lit(3)),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    # the _shingle_table double-exchange pattern: parallelize the raw
    # (often single-partition) scan FIRST so the synthesis runs wide,
    # then materialize the projection behind a second repartition so
    # CollapseProject cannot inline the tokens->transform chain into
    # every downstream reference (~3x the dominant compute at any
    # scale).  Measured 18.5s -> ~2s at sf0.1.
    lined = (
        LT.ensure_parallelism(d)
        .select("doc_id", F.array_join(lines, "\n").alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return dedup_lines(lined, max_occurrences=2)


def llm_oov_rate(spark, sf):
    """Corpus-derived top-16 vocabulary coverage: per-doc OOV token
    fraction (exact long division -> cross-engine doubles)."""
    return LT.oov_rate(_t(spark, sf, "documents"), vocab_size=16)


def llm_importance_sample(spark, sf):
    """Weight-proportional deterministic Bernoulli sample (weight =
    n_chars, capped at p=1): exact int64 affine-mix threshold, so the
    kept set is a pure function of doc_id reproducible in any engine."""
    from .llm.curation import importance_sample

    return importance_sample(
        _t(spark, sf, "documents"), "doc_id", "n_chars", ppm_per_unit=1500
    )


def llm_html_strip(spark, sf):
    """Markup removal (web-corpus ingest edge): documents.text is
    wrapped in deterministic HTML (tags, script block, comment,
    entities) and stripped back -- strip_html(wrap(text)) must recover
    the clean text, and the gate certifies the recovered corpus."""
    from .llm.web import strip_html

    d = _t(spark, sf, "documents")
    wrapped = F.concat(
        F.lit('<html><head><script type="text/javascript">var x = 1 < 2;</script>'),
        F.lit("<style>p { color: red; }</style></head><!-- crawl "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(' --><body class="doc"><h1>Doc &amp; '),
        (F.col("doc_id") % 13).cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("&nbsp;&lt;end&gt;</p></body></html>"),
    )
    return d.select(
        "doc_id",
        strip_html(wrapped).alias("clean_text"),
        F.length(strip_html(wrapped)).cast("long").alias("n_clean_chars"),
    )


def llm_url_dedup(spark, sf):
    """URL-level dedup: synthetic messy URLs (mixed case, default port,
    www, tracking params, fragments -- 20 host x 500 path spellings per
    source) canonicalize onto collision groups; keeper = min doc_id."""
    from .llm.web import synth_url, url_dedup

    d = _t(spark, sf, "documents").withColumn("url", synth_url())
    return url_dedup(d)


def llm_domain_stats(spark, sf):
    """Per-registered-domain corpus profile over canonical URLs, with a
    domain blocklist prune (broadcast-style isin)."""
    from .llm.web import domain_stats, synth_url

    d = _t(spark, sf, "documents").withColumn("url", synth_url())
    return domain_stats(d, blocklist=["src0.com", "src7.com"])


def llm_index_dedup(spark, sf):
    """Incremental-batch dedup against a PERSISTED fingerprint index:
    even-id docs are indexed to parquet (cached per sf_dir, the
    'yesterday's corpus' artifact); odd-id docs probe it.  Certifies
    the on-disk index roundtrip, the in-batch fold, and the fresh/known
    tagging in one gate."""
    import os
    import tempfile

    from .llm.dedup import build_dedup_index, dedup_against_index

    d = _t(spark, sf, "documents")
    tag = _source_tag(sf, "documents")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_dedup_idx_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_dedup_index(d.filter(F.col("doc_id") % 2 == 0), path)
    return dedup_against_index(d.filter(F.col("doc_id") % 2 == 1), path)


def llm_curriculum(spark, sf):
    """Composed curriculum pipeline: hashed-feature quality score ->
    easiest-first global rank (two-phase bucketed index, no global
    sort) -> 4 contiguous training shards."""
    from .llm.curation import curriculum_shards
    from .llm.web import quality_classify

    scored = quality_classify(_t(spark, sf, "documents")).select("doc_id", "score")
    return curriculum_shards(scored, n_shards=4)


def llm_balanced_sample(spark, sf):
    """Class-balanced downsampling: every language keeps ~min-class
    volume (rate_pm = floor(1000 * min_n / n_g), md5-bucket keep rule)
    so the majority classes shrink to parity.  Same engine-exact rate
    discipline as mixture_apply: exact-long arithmetic, digest bucket."""
    d = _t(spark, sf, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    mn = per.agg(F.min("n").alias("__mn"))
    rates = per.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.least(
            F.lit(1000),
            F.floor(
                F.lit(1000.0) * F.col("__mn").cast("double") / F.col("n").cast("double")
            ),
        )
        .cast("int")
        .alias("rate_pm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("rate_pm"))
        .select("doc_id", "lang", "rate_pm")
    )


def llm_prefix_index(spark, sf):
    """Autocomplete/serving index build: top-3 corpus tokens per 3-char
    prefix by frequency (count desc, token asc).  GroupBy (prefix,
    token) partial-aggregates map-side; the per-prefix rank window runs
    over each prefix's handful of candidates."""
    from pyspark.sql import Window

    from .llm.text import explode_nonempty, normalize_text, tokens

    d = _t(spark, sf, "documents")
    toks = explode_nonempty(d, [], tokens(normalize_text("text")), "tok").filter(
        F.length("tok") >= 3
    )
    counts = toks.groupBy(
        F.substring("tok", 1, 3).alias("prefix"), F.col("tok")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("prefix").orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("prefix", "rank", "tok", "n")
    )


def llm_mix_drift(spark, sf):
    """Distribution-drift report between two corpus slices (even vs
    odd doc ids, standing in for yesterday-vs-today): per-source share
    in each slice plus absolute share drift; the summed L1/2 distance
    is the scalar a monitor alerts on.  Shares divide exact longs --
    bit-identical doubles -- and the report is |sources| rows."""
    d = _t(spark, sf, "documents")
    tagged = d.select(
        "source", (F.col("doc_id") % 2 == 0).alias("is_a")
    )
    per = tagged.groupBy("source").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_b"),
    )
    tot = per.agg(
        F.sum("n_a").cast("long").alias("__ta"), F.sum("n_b").cast("long").alias("__tb")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_a",
        "n_b",
        (F.col("n_a").cast("double") / F.col("__ta").cast("double")).alias("share_a"),
        (F.col("n_b").cast("double") / F.col("__tb").cast("double")).alias("share_b"),
        F.abs(
            F.col("n_a").cast("double") / F.col("__ta").cast("double")
            - F.col("n_b").cast("double") / F.col("__tb").cast("double")
        ).alias("abs_drift"),
    )


def llm_dedup_keep_longest(spark, sf):
    """Quality-aware dedup keeper policy: per normalized fingerprint,
    keep the LONGEST duplicate (ties to min doc_id) instead of the
    first -- the policy web pipelines prefer when duplicates differ by
    truncation.  One window over the digest shuffle."""
    from pyspark.sql import Window

    d = _t(spark, sf, "documents")
    fp = d.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("fingerprint", F.col("doc_id").alias("keeper_id"), "n_chars")
    )


def llm_dedup_audit(spark, sf):
    """Corpus-health duplication audit per source: raw volume, distinct
    canonical fingerprints, duplicate share.  One digest groupBy --
    the monitoring twin of the dedup family."""
    d = _t(spark, sf, "documents")
    fp = d.select(
        "source", F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))).alias("fp")
    )
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("fp").cast("long").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.count_distinct("fp")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


def llm_extract_spans(spark, sf):
    """Structured span extraction: every numeric token and every
    ALL-CAPS-like word-initial token per document via
    regexp_extract_all, exploded to (doc_id, kind, span, pos) rows --
    the IE primitive behind PII audits and template mining.  Pure
    Catalyst; posexplode keeps span order reproducible."""
    d = _t(spark, sf, "documents")
    nums = d.select(
        "doc_id",
        F.lit("number").alias("kind"),
        F.posexplode_outer(F.regexp_extract_all("text", F.lit(r"\d+"), 0)).alias(
            "pos", "span"
        ),
    ).filter(F.col("span").isNotNull())
    words = d.select(
        "doc_id",
        F.lit("keyword").alias("kind"),
        F.posexplode_outer(
            F.regexp_extract_all("text", F.lit(r"\b(spark|hash|join|merge)\b"), 0)
        ).alias("pos", "span"),
    ).filter(F.col("span").isNotNull())
    return nums.unionByName(words).select(
        "doc_id", "kind", F.col("pos").cast("int").alias("pos"), "span"
    )


def llm_web_pipeline(spark, sf):
    """Composed web-ingest funnel: wrap docs in crawl HTML -> strip
    markup -> canonical-URL dedup (keep min doc_id per URL) -> hashed
    linear quality cut on the CLEANED text -> per-source funnel counts.
    Certifies the three web stages composed, not just separately."""
    from .llm.web import quality_classify, strip_html, synth_url, url_dedup

    d = _t(spark, sf, "documents")
    wrapped = F.concat(
        F.lit('<html><head><script type="text/javascript">var x = 1 < 2;</script>'),
        F.lit("<style>p { color: red; }</style></head><!-- crawl "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(' --><body class="doc"><h1>Doc &amp; '),
        (F.col("doc_id") % 13).cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("&nbsp;&lt;end&gt;</p></body></html>"),
    )
    cleaned = d.select(
        "doc_id", "source", strip_html(wrapped).alias("text")
    )
    keepers = url_dedup(d.withColumn("url", synth_url())).select(
        F.col("keeper_id").alias("doc_id")
    )
    kept = cleaned.join(keepers, "doc_id", "left_semi")
    scored = quality_classify(kept.select("doc_id", "text")).select(
        "doc_id", "keep"
    )
    funnel = (
        d.select("doc_id", "source")
        .join(keepers.withColumn("__k", F.lit(1)), "doc_id", "left")
        .join(scored.withColumnRenamed("keep", "__q"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.sum(F.coalesce(F.col("__k"), F.lit(0))).cast("long").alias("n_url_kept"),
            F.sum(F.when(F.col("__q"), 1).otherwise(0)).cast("long").alias("n_quality_kept"),
        )
    )
    return funnel


def llm_mixture_apply(spark, sf):
    """Temperature mix (alpha=0.5) actually applied: per-source
    per-mille keep rates from sqrt-scaled weights, integer id-mod keep
    rule."""
    from .llm.curation import mixture_apply

    return mixture_apply(_t(spark, sf, "documents"), target_frac=0.5)


def llm_tokenize(spark, sf):
    """Greedy longest-match subword tokenization against the corpus's
    own induced top-50 vocabulary (vocab_coverage), character-UNK
    fallback.  Arrow mapInPandas kernel -- VALUE-checked: the oracle
    precomputes per-(word, pos) longest vocab matches with a substr
    equi-join and replays the greedy walk as a recursive CTE."""
    d = _t(spark, sf, "documents")
    vocab = [r["tok"] for r in LT.vocab_coverage(d, top_v=50).collect()]
    return LT.tokenize_greedy(d, vocab)


def llm_vocab_coverage(spark, sf):
    """Top-500 vocabulary with cumulative token-stream coverage (the
    tokenizer/OOV-budget sizing curve)."""
    return LT.vocab_coverage(_t(spark, sf, "documents"), top_v=500)


def llm_anchor_positives(spark, sf):
    """Positive-pair mining (contrastive complement of hard negatives):
    per anchor, the nearest SAME-label vector (k=1) -- exact tier over
    the embeddings table, ANN buckets feed it at scale."""
    from pyspark.sql import Window

    emb = _t(spark, sf, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("__qv"),
        F.col("label").alias("anchor_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("pos_id"),
        F.col("embedding").alias("__cv"),
        F.col("label").alias("pos_label"),
    )
    pairs = q.crossJoin(c).filter(
        (F.col("anchor_id") != F.col("pos_id"))
        & (F.col("anchor_label") == F.col("pos_label"))
    )
    sim = F.round(
        LS.dot(F.col("__qv"), F.col("__cv"))
        / (LS.l2_norm(F.col("__qv")) * LS.l2_norm(F.col("__cv"))),
        6,
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("similarity"), F.asc("pos_id"))
    return (
        pairs.withColumn("similarity", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 1)
        .select("anchor_id", "anchor_label", "pos_id", "similarity")
    )


def llm_hard_negatives(spark, sf):
    """Per-anchor nearest different-label vector (k=2): exact
    brute-force tier over the embeddings table (validation baseline;
    the ANN buckets feed this scorer at scale)."""
    return LS.hard_negatives(_t(spark, sf, "embeddings"), k=2)


def llm_anchor_positives_lsh(spark, sf):
    """Positive-pair mining, LSH-bucketed SCALE tier: same contract as
    llm_anchor_positives but candidates meet only inside (label, table,
    bucket) hyperplane groups -- no crossJoin anywhere in the plan.
    Literal-plane replay makes this a full value oracle; recall vs the
    exact tier additionally pytest-bounded (tests/test_negatives.py)."""
    out = LS.anchor_positives_lsh(_t(spark, sf, "embeddings"), k=1)
    return out.select("anchor_id", "anchor_label", F.col("cand_id").alias("pos_id"), "similarity")


def llm_hard_negatives_lsh(spark, sf):
    """Hard-negative mining, LSH-bucketed SCALE tier: same contract as
    llm_hard_negatives (k=2) with candidates met only inside (table,
    bucket) groups, same-label pairs masked in-block.  Literal-plane
    replay makes this a full value oracle; recall vs the exact tier
    additionally pytest-bounded."""
    out = LS.hard_negatives_lsh(_t(spark, sf, "embeddings"), k=2)
    return out.select(
        "anchor_id",
        "anchor_label",
        F.col("cand_id").alias("neg_id"),
        F.col("cand_label").alias("neg_label"),
        "similarity",
        "rank",
    )


def llm_negative_pairs(spark, sf):
    """Deterministic random negative sampling, k=4 slots per anchor;
    misses/self/same-label slots drop by contract."""
    return LS.negative_pairs(_t(spark, sf, "embeddings"), k=4)


def llm_robots_filter(spark, sf):
    """Longest-prefix-match crawl-policy filter: deterministic rule set
    derived from the corpus's own source domains (odd-k domains get a
    catch-all allow; /A/7 denied everywhere; /A/3 denied on even-k
    domains; /A/5 carries an allow+deny tie that deny must win)."""
    from .llm.web import robots_filter

    d = _t(spark, sf, "documents")
    urls = d.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".com")).alias("domain"),
        F.concat(
            F.lit("/A/"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("/p"),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("path"),
    )
    src = d.select("source").distinct()
    k = F.substring("source", 4, 10).cast("int")
    dom = F.concat(F.col("source"), F.lit(".com")).alias("domain")
    rules = (
        src.filter(k % 2 == 1)
        .select(dom, F.lit("/A/").alias("prefix"), F.lit(True).alias("allow"))
        .unionByName(src.select(dom, F.lit("/A/7").alias("prefix"), F.lit(False).alias("allow")))
        .unionByName(
            src.filter(k % 2 == 0).select(
                dom, F.lit("/A/3").alias("prefix"), F.lit(False).alias("allow")
            )
        )
        .unionByName(src.select(dom, F.lit("/A/5").alias("prefix"), F.lit(True).alias("allow")))
        .unionByName(src.select(dom, F.lit("/A/5").alias("prefix"), F.lit(False).alias("allow")))
    )
    return robots_filter(urls, rules)


def llm_quality_classifier(spark, sf):
    """Hashed-feature linear quality scorer (fastText shape): margin is
    bit-exact fold arithmetic, score a 6-digit-rounded sigmoid."""
    from .llm.web import quality_classify

    return quality_classify(_t(spark, sf, "documents"))


def llm_bpe_train(spark, sf):
    """Distributed BPE vocabulary training over the documents corpus:
    12 merge rules learned from one corpus scan + vocab-scale
    iterations (llm/text.py bpe_train; iteration count is gate-budget,
    production runs thousands -- per-iteration cost is vocab-scale and
    flat).  Rows-only gate (iterative
    argmax replays as 12 UNROLLED materialized SQL stages -- pair
    counts, tie-broken argmax, list_reduce merge fold -- so the merge
    table is VALUE-checked bit-for-bit); exactness vs an independent
    pure-Python BPE reference additionally pytest-asserted
    (tests/test_llm_ops.py)."""
    merges, _ = LT.bpe_train(_t(spark, sf, "documents"), n_merges=12)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        "rank long, left string, right string, merged string, pair_count long",
    )


def llm_trained_classifier(spark, sf):
    """Train-then-score quality classification: closed-form ridge
    weights fit distributedly on hashed-token features (one corpus
    scan, Gram-matrix partials tree-aggregated, D=128) with lang=='en'
    as the training signal, then the zero-shuffle codegen scorer
    applies them.  Rows-only gate (float matrix solve has no SQL
    oracle); trainer exactness vs a NumPy closed-form replica and
    train->score separation are pytest-held (tests/test_web.py)."""
    from .llm.web import quality_classify_trained, train_quality_classifier

    docs = _t(spark, sf, "documents")
    labeled = docs.withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    w = train_quality_classifier(labeled, "label", n_buckets=128, l2=1.0)
    return quality_classify_trained(docs, w)


def llm_boilerplate(spark, sf):
    """Per-document boilerplate load vs the corpus's own repeated-span
    catalog (word 5-grams in >= 4 distinct docs): the C4 repeated-span
    removal signal, graded per doc."""
    from .llm.curation import boilerplate_fraction

    return boilerplate_fraction(_t(spark, sf, "documents"), n=5, min_docs=4)


def llm_bpe_tokenize(spark, sf):
    """Composed BPE pipeline: train 12 merges on the corpus, derive the
    subword vocabulary (merged symbols + single characters, </w>
    markers stripped for the greedy matcher), then tokenize the SAME
    corpus with greedy longest-match inference -- the full
    train->deploy loop of a subword tokenizer as one dataflow,
    VALUE-checked end-to-end (unrolled training stages feed the
    recursive greedy-walk tokenizer in ONE oracle SQL)."""
    d = _t(spark, sf, "documents")
    merges, _ = LT.bpe_train(d, n_merges=12)
    vocab = sorted({m["merged"].replace("</w>", "") for m in merges}
                   | {chr(c) for c in range(ord("a"), ord("z") + 1)}
                   | set("0123456789"))
    return LT.tokenize_greedy(d, [v for v in vocab if v])


def llm_c4_pipeline(spark, sf):
    """Composed C4/Gopher-style curation funnel, certified END-TO-END
    against one chained oracle: (1) Gopher structural rules keep
    (corpus-adapted min_stop_hits=1), (2) eval-decontamination cut at
    graded overlap <= 0.2 vs the doc_id %% 97 holdout, (3) fingerprint
    dedup keep-min-id.  Returns the surviving documents with their
    contamination score.  Every stage is the scale-shaped tier: one
    HOF projection, one broadcast-semi overlap, one digest-key window
    -- the corpus never shuffles as text except the final digest."""
    from pyspark.sql import Window

    from .llm.curation import contamination_overlap
    from .llm.text import gopher_rules, normalize_text

    docs = _t(spark, sf, "documents")
    keep_ids = gopher_rules(docs, min_stop_hits=1).filter("keep").select("doc_id")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    overlap = contamination_overlap(docs, bench, n=5)
    clean = (
        docs.join(keep_ids, "doc_id", "left_semi")
        .join(overlap.filter(F.col("overlap_frac") <= 0.2).select("doc_id", "overlap_frac"), "doc_id")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        clean.withColumn("fp", F.md5(normalize_text(F.col("text"))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "overlap_frac")
    )


def llm_gopher_report(spark, sf):
    """Per-source quality-gate report: how many docs each Gopher rule
    drops, per corpus source -- the fix-the-crawler breakdown the
    per-doc rule columns exist for.  `source` rides through the rule
    projection (keep_cols), so the whole report is ONE corpus scan +
    one aggregation -- no join back to the table; exact-long counts
    keep the oracle hash float-free."""
    docs = _t(spark, sf, "documents")
    joined = LT.gopher_rules(docs, keep_cols=("source",), min_stop_hits=1)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
        F.sum((F.col("n_words") < 30).cast("long")).cast("long").alias("fail_min_words"),
        F.sum(
            ((F.col("mean_word_len") < 3.0) | (F.col("mean_word_len") > 10.0)).cast("long")
        ).cast("long").alias("fail_word_len"),
        F.sum((F.col("symbol_ratio") > 0.1).cast("long")).cast("long").alias("fail_symbols"),
        F.sum((F.col("alpha_word_frac") < 0.8).cast("long")).cast("long").alias("fail_alpha"),
        F.sum((F.col("stop_hits") < 1).cast("long")).cast("long").alias("fail_stopwords"),
    )


def llm_dataset_card(spark, sf):
    """Dataset-card metrics in one result: corpus size, language/source
    breadth, english share, exact-duplicate rate (normalized-md5), the
    Gopher keep rate (corpus-adapted stop rule), and the eval-holdout
    contamination rate -- the numbers a dataset card / datasheet
    publishes, each certified against the SAME chained DuckDB oracle.

    Tall (metric, value) layout so new metrics append without schema
    churn.  Scale shape: every metric is an aggregate over one of the
    already-certified operator shapes; nothing materializes wider than
    a scalar per metric.  Ratios are rounded to 6 (engine-stable)."""
    from .llm.curation import contaminated_ids
    from .llm.text import gopher_rules, normalize_text

    docs = _t(spark, sf, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.round(
            F.sum((F.col("lang") == "en").cast("long")) / F.count(F.lit(1)), 6
        ).alias("pct_en"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.md5(normalize_text(F.col("text")))) / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )
    keep = gopher_rules(docs, min_stop_hits=1).agg(
        F.round(F.sum(F.col("keep").cast("long")) / F.count(F.lit(1)), 6).alias(
            "gopher_keep_rate"
        )
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    contam = contaminated_ids(docs, bench, n=5).agg(
        F.count(F.lit(1)).cast("double").alias("n_contaminated")
    )
    wide = base.crossJoin(F.broadcast(keep)).crossJoin(F.broadcast(contam))
    wide = wide.withColumn(
        "contaminated_rate", F.round(F.col("n_contaminated") / F.col("n_docs"), 6)
    ).drop("n_contaminated")
    metrics = [
        "n_docs", "total_chars", "n_sources", "n_langs", "pct_en",
        "exact_dup_rate", "gopher_keep_rate", "contaminated_rate",
    ]
    return wide.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(m).alias("metric"), F.col(m).cast("double").alias("value"))
                for m in metrics
            ])
        ).alias("r")
    ).select("r.metric", "r.value")


def llm_span_corruption(spark, sf):
    """T5-style deterministic span-corruption plan over the documents
    corpus (15%% of tokens in 3-token spans, Knuth-hash placement):
    the denoising-objective mask table a training loader consumes."""
    from .llm.curation import span_corruption

    return span_corruption(_t(spark, sf, "documents"))


def llm_perplexity_buckets(spark, sf):
    """CCNet-style head/middle/tail perplexity bucketing per language
    under the corpus bigram LM -- the quality-stratified split the
    CCNet/RedPajama lineage keeps for pretraining (llm/text.py
    perplexity_buckets; deterministic percent_rank with id tiebreak)."""
    return LT.perplexity_buckets(_t(spark, sf, "documents"))


def llm_substring_spans(spark, sf):
    """Exact-substring-dedup span catalog (Lee et al. 2022): maximal
    duplicated 8-token spans across the documents corpus, sparing the
    globally first copy of each window.  One hash-keyed shuffle of the
    compact (id, start, xxhash64) window table; span merge is a
    per-doc window function over the duplicated tail only
    (llm/dedup.py substring_dup_spans)."""
    return LD.substring_dup_spans(_t(spark, sf, "documents"), k=8)


def llm_substring_strip(spark, sf):
    """Apply the exact-substring spans: normalized corpus text with
    every duplicated 8-token span removed (first copy kept), plus
    removal counters -- the end-to-end Lee-et-al. dedup a training
    pipeline actually ships (llm/dedup.py substring_strip)."""
    return LD.substring_strip(_t(spark, sf, "documents"), k=8)


def llm_fim_transform(spark, sf):
    """Fill-in-the-middle (PSM) rewrite of a deterministic half of the
    corpus -- the code-LLM infilling data prep (llm/curation.py
    fim_transform; Knuth-hash splits, one codegen projection)."""
    from .llm.curation import fim_transform

    return fim_transform(_t(spark, sf, "documents"))


def llm_leakage_safe_split(spark, sf):
    """Train/val/test assignment hashed on near-dup CLUSTER ids (exact
    Jaccard edges -> min-label components -> Knuth-hash split), so no
    duplicate cluster ever straddles splits -- the eval-leakage guard a
    doc-id-hashed split silently lacks (llm/curation.py
    leakage_safe_split).  Oracle replays the component fixpoint as a
    DuckDB recursive CTE."""
    from .llm.curation import leakage_safe_split

    docs = _t(spark, sf, "documents")
    edges = LD.jaccard_pairs(docs, threshold=0.4, n=3)
    clusters = LD.duplicate_clusters(docs, edges)
    return leakage_safe_split(clusters)


def llm_encoding_quality(spark, sf):
    """Encoding-health screen: replacement-char and UTF-8-as-Latin-1
    mojibake counts + ratio per document -- the cheap pre-ftfy filter a
    web-crawl pipeline runs at scan speed (llm/text.py
    encoding_quality; one regexp_count projection, no shuffle)."""
    return LT.encoding_quality(_t(spark, sf, "documents"))


def llm_robots_parse(spark, sf):
    """Raw robots.txt bodies -> (domain, prefix, allow) rule rows
    (llm/web.py parse_robots: grouped User-agent sections, `*` groups
    only, comments and empty Disallow handled).  Bodies are synthesized
    deterministically per corpus source with multi-group structure; the
    oracle is the CLOSED-FORM expected rule set, so the parse is
    checked against the spec, not against itself."""
    from .llm.web import parse_robots

    srcs = (
        _t(spark, sf, "documents").groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    )
    body = F.concat(
        F.lit(
            "# policy\nUser-agent: gptbot\nDisallow: /\n\n"
            "User-agent: *\nUser-agent: otherbot\nAllow: /docs/"
        ),
        F.col("source"),
        F.lit("\nDisallow: /private\nDisallow:\n\nUser-agent: *\nDisallow: /tmp/"),
        F.col("n").cast("string"),
    )
    robots = srcs.select(
        F.concat(F.col("source"), F.lit(".example")).alias("domain"),
        body.alias("robots_txt"),
    )
    return parse_robots(robots)


def llm_chat_render(spark, sf):
    """SFT prep: deterministic conversation structure over the corpus
    (8-token alternating user/assistant turns) flattened through a
    ChatML-style template -- the training text an SFT loader tokenizes
    (llm/chat.py; pure map stage, no shuffle)."""
    from .llm.chat import render_chatml, synth_conversations

    return render_chatml(synth_conversations(_t(spark, sf, "documents")))


def llm_chat_stats(spark, sf):
    """Per-conversation structure profile (turn count, role token
    counts, assistant loss-mask share) -- the degenerate-dialogue
    filter input (llm/chat.py conversation_stats; in-array HOF
    aggregates, no explode)."""
    from .llm.chat import conversation_stats, synth_conversations

    return conversation_stats(synth_conversations(_t(spark, sf, "documents")))


def llm_gopher_rules(spark, sf):
    """Gopher/MassiveText structural quality rules over the documents
    corpus: per-rule metrics + the conjunctive keep flag, all codegen
    HOFs in one projection (llm/text.py gopher_rules).  min_stop_hits
    is relaxed to 1 for this corpus (the synthetic vocabulary carries
    only 'the' from the Gopher stop list); every other threshold is
    the paper default, and the keep flag genuinely splits the corpus
    (pytest-held)."""
    return LT.gopher_rules(_t(spark, sf, "documents"), min_stop_hits=1)


BM25_QUERY_TERMS = ["dup", "vector", "hash", "scan", "window"]


def llm_bm25(spark, sf):
    """BM25 top-20 retrieval for a fixed 5-term query over the corpus
    (Lucene always-positive idf, k1=1.2 b=0.75) -- the lexical
    retrieval half of a RAG / hard-negative stack (llm/text.py
    bm25_topk; query-filtered explode, window df, scalar-broadcast
    N/avgdl, TakeOrderedAndProject top-k)."""
    return LT.bm25_topk(_t(spark, sf, "documents"), BM25_QUERY_TERMS, k=20)


def llm_unigram_train(spark, sf):
    """Unigram-LM tokenizer training (SentencePiece-style hard-EM, 2
    iterations, vocab 300) over the corpus word counts -- rows-only
    (iterative lattice DP is not SQL-expressible); exact equality with
    a pure-Python replica is pytest-held (tests/test_unigram.py)."""
    from .llm.unigram import unigram_train

    return unigram_train(
        _t(spark, sf, "documents"), vocab_size=300, n_iter=2, seed_size=1000
    )


def llm_unigram_tokenize(spark, sf):
    """Viterbi tokenization fertility profile under the trained unigram
    table (pieces-per-word, unk counts) -- rows-only, round-trip and
    coverage pytest-held."""
    from .llm.unigram import unigram_tokenize, unigram_train

    docs = _t(spark, sf, "documents")
    vocab = unigram_train(docs, vocab_size=300, n_iter=2, seed_size=1000)
    return unigram_tokenize(docs, vocab)


def llm_rrf_fusion(spark, sf):
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    top-50 lexical ranking and the dense cosine top-50 for query
    vector 0 -- the standard no-calibration lexical+dense merge
    (llm/similarity.py rrf_fuse).  The rank-assignment windows run on
    top-k-BOUNDED lists (<=50 rows), so the single-partition window is
    metadata-scale by construction; the fusion itself is one
    unionByName + one groupBy on the id."""
    from pyspark.sql import Window

    from .llm.similarity import cosine_topk, rrf_fuse

    docs = _t(spark, sf, "documents")
    bm = LT.bm25_topk(docs, BM25_QUERY_TERMS, k=50)
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm_ranked = bm.select(
        "doc_id", F.row_number().over(wb).cast("long").alias("rank")
    )
    emb = _t(spark, sf, "embeddings")
    dense = cosine_topk(emb, k=50, queries=emb.filter(F.col("vec_id") == 0))
    dense_ranked = dense.select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([bm_ranked, dense_ranked], id_col="doc_id", k=60, topk=20)


def llm_preference_pairs(spark, sf):
    """DPO preference-pair prep: completions synthesized from the
    corpus (prompt = doc_id % 97, score = n_chars as the stand-in
    reward), best-vs-worst pair per prompt via ONE struct-min/max
    groupBy -- no window sort (llm/chat.py preference_pairs)."""
    from .llm.chat import preference_pairs

    comp = _t(spark, sf, "documents").select(
        (F.col("doc_id") % 97).alias("prompt_id"),
        F.col("doc_id").alias("completion_id"),
        F.col("n_chars").alias("score"),
    )
    return preference_pairs(comp)


def llm_length_buckets(spark, sf):
    """Padded-batch length bucketing (powers of two 16..1024, clamp =
    truncate): per-bucket doc/token counts + padding-waste fraction
    (llm/curation.py length_buckets; chained-CASE bucket key, one
    bounded-cardinality groupBy)."""
    from .llm.curation import length_buckets

    return length_buckets(_t(spark, sf, "documents"))


LLM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "llm_bm25": llm_bm25,
    "llm_rrf_fusion": llm_rrf_fusion,
    "llm_unigram_train": llm_unigram_train,
    "llm_unigram_tokenize": llm_unigram_tokenize,
    "llm_preference_pairs": llm_preference_pairs,
    "llm_length_buckets": llm_length_buckets,
    "llm_rep_signals": llm_rep_signals,
    "llm_line_dedup": llm_line_dedup,
    "llm_importance_sample": llm_importance_sample,
    "llm_oov_rate": llm_oov_rate,
    "s8_jsonl_roundtrip": s8_jsonl_roundtrip,
    "llm_exact_dedup": llm_exact_dedup,
    "llm_soft_dedup": llm_soft_dedup,
    "llm_zipf_fit": llm_zipf_fit,
    "llm_fingerprint_dedup": llm_fingerprint_dedup,
    "llm_jaccard_pairs": llm_jaccard_pairs,
    "llm_containment_pairs": llm_containment_pairs,
    "llm_jaccard_prefix": llm_jaccard_prefix,
    "llm_substring_search": llm_substring_search,
    "llm_containment_prefix": llm_containment_prefix,
    "llm_minhash_lsh": llm_minhash_lsh,
    "llm_minhash_lsh_md5": llm_minhash_lsh_md5,
    "llm_simhash_md5": llm_simhash_md5,
    "llm_minhash_lsh_fast": llm_minhash_lsh_fast,
    "llm_simhash": llm_simhash,
    "llm_token_stats": llm_token_stats,
    "llm_language_id": llm_language_id,
    "llm_quality": llm_quality,
    "llm_fingerprint": llm_fingerprint,
    "llm_fuzzy_pairs": llm_fuzzy_pairs,
    "llm_sorted_neighborhood": llm_sorted_neighborhood,
    "llm_compress_ratio": llm_compress_ratio,
    "llm_tfidf": llm_tfidf,
    "llm_top_ngrams": llm_top_ngrams,
    "llm_bigram_logprob": llm_bigram_logprob,
    "llm_mean_embedding": llm_mean_embedding,
    "llm_cosine_topk": llm_cosine_topk,
    "llm_cosine_topk_q": llm_cosine_topk_q,
    "llm_cosine_topk_fast": llm_cosine_topk_fast,
    "llm_cosine_topk_sliced": llm_cosine_topk_sliced,
    "llm_ann_lsh": llm_ann_lsh,
    "llm_ann_ivf": llm_ann_ivf,
    "llm_ann_ivfpq": llm_ann_ivfpq,
    "llm_embed_dup": llm_embed_dup,
    "llm_embed_dup_lsh": llm_embed_dup_lsh,
    "llm_decontaminate": llm_decontaminate,
    "llm_contamination_overlap": llm_contamination_overlap,
    "llm_stratified_sample": llm_stratified_sample,
    "llm_split_assign": llm_split_assign,
    "llm_corpus_shuffle": llm_corpus_shuffle,
    "llm_shard_layout": llm_shard_layout,
    "llm_curation_pipeline": llm_curation_pipeline,
    "llm_weighted_sample": llm_weighted_sample,
    "llm_contamination_rate": llm_contamination_rate,
    "llm_near_dedup_keep_best": llm_near_dedup_keep_best,
    "llm_pack_sequences": llm_pack_sequences,
    "llm_corpus_stats": llm_corpus_stats,
    "llm_dup_clusters": llm_dup_clusters,
    "llm_near_dedup_corpus": llm_near_dedup_corpus,
    "llm_quality_filter": llm_quality_filter,
    "llm_cross_dedup": llm_cross_dedup,
    "llm_redact": llm_redact,
    "llm_chunk_documents": llm_chunk_documents,
    "llm_mixture_weights": llm_mixture_weights,
    "mm_features": mm_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize": mm_resize,
    "mm_decode_quarantine": mm_decode_quarantine,
    "mm_image_dedup": mm_image_dedup,
    "mm_audio_vad": mm_audio_vad,
    "e17_json_extract": e17_json_extract,
    "j10_asof_backward": j10_asof_backward,
    "w_attribution": w_attribution,
    "w_coverage": w_coverage,
    "w_sessionize": w_sessionize,
    "w_decayed_counts": w_decayed_counts,
    "w_period_over_period": w_period_over_period,
    "j10b_asof_forward": j10b_asof_forward,
    "j10c_asof_nearest": j10c_asof_nearest,
    "a11_group_stats": a11_group_stats,
    "a13_group_corr": a13_group_corr,
    "a42_group_ols": a42_group_ols,
    "w_holt": w_holt,
    "w_holt_winters": w_holt_winters,
    "llm_mmr_diversify": llm_mmr_diversify,
    "w_cusum": w_cusum,
    "mm_audio_dedup": mm_audio_dedup,
    "a43_sketch_overlap": a43_sketch_overlap,
    "a49_kmv_set_ops": a49_kmv_set_ops,
    "a44_join_size_est": a44_join_size_est,
    "w_twap": w_twap,
    "w_resample_locf": w_resample_locf,
    "a45_mann_whitney": a45_mann_whitney,
    "a48_bootstrap_ci": a48_bootstrap_ci,
    "a50_skew_agg": a50_skew_agg,
    "llm_kmeans_int": llm_kmeans_int,
    "st_topk": st_topk,
    "llm_semantic_dedup_int": llm_semantic_dedup_int,
    "a51_heavy_hitters": a51_heavy_hitters,
    "a52_ks_test": a52_ks_test,
    "a53_kruskal_wallis": a53_kruskal_wallis,
    "a54_brown_forsythe": a54_brown_forsythe,
    "a55_welch_ttest": a55_welch_ttest,
    "llm_rouge": llm_rouge,
    "llm_rouge_l": llm_rouge_l,
    "llm_bleu": llm_bleu,
    "llm_bleu_corpus": llm_bleu_corpus,
    "llm_chrf": llm_chrf,
    "llm_js_divergence": llm_js_divergence,
    "llm_lsh_eval": llm_lsh_eval,
    "llm_ann_eval": llm_ann_eval,
    "llm_ann_pq_eval": llm_ann_pq_eval,
    "llm_ann_lsh_eval": llm_ann_lsh_eval,
    "llm_winnowing": llm_winnowing,
    "llm_ann_pq_int": llm_ann_pq_int,
    "llm_nb_classifier": llm_nb_classifier,
    "llm_unigram_seed": llm_unigram_seed,
    "llm_char_entropy": llm_char_entropy,
    "llm_viterbi_fixed": llm_viterbi_fixed,
    "mm_decode_verify": mm_decode_verify,
    "mm_wav_verify": mm_wav_verify,
    "mm_gif_verify": mm_gif_verify,
    "llm_mmr_ann": llm_mmr_ann,
    "a46_itemsets": a46_itemsets,
    "a47_assoc_rules": a47_assoc_rules,
    "a4_hll_distinct": a4_hll_distinct,
    "a5_approx_quantiles": a5_approx_quantiles,
    "st_tumbling": st_tumbling,
    "st_distinct_hll": st_distinct_hll,
    "st_sliding": st_sliding,
    "st_session": st_session,
    "st_enrich": st_enrich,
    "st_interval_join": st_interval_join,
    "st_interval_join_outer": st_interval_join_outer,
    "st_interval_join_full": st_interval_join_full,
    "st_custom_source": st_custom_source,
    "st_dedup": st_dedup,
    "st_cdc_upsert": st_cdc_upsert,
    "st_zonemap_ingest": st_zonemap_ingest,
    "st_running_totals": st_running_totals,
    "w_rolling": w_rolling,
    "w_zscore": w_zscore,
    "w_ewma": w_ewma,
    "w_funnel": w_funnel,
    "w_cohort": w_cohort,
    "w_tumbling": w_tumbling,
    "w_sliding": w_sliding,
    "w_session": w_session,
    "w_resample_filled": w_resample_filled,
    "w_gap_linear": w_gap_linear,
    "llm_kmeans": llm_kmeans,
    "llm_semantic_dedup": llm_semantic_dedup,
    "llm_html_strip": llm_html_strip,
    "llm_url_dedup": llm_url_dedup,
    "llm_robots_filter": llm_robots_filter,
    "llm_hard_negatives": llm_hard_negatives,
    "llm_anchor_positives": llm_anchor_positives,
    "llm_hard_negatives_lsh": llm_hard_negatives_lsh,
    "llm_anchor_positives_lsh": llm_anchor_positives_lsh,
    "llm_vocab_coverage": llm_vocab_coverage,
    "llm_gopher_rules": llm_gopher_rules,
    "llm_substring_spans": llm_substring_spans,
    "llm_perplexity_buckets": llm_perplexity_buckets,
    "llm_fim_transform": llm_fim_transform,
    "llm_chat_render": llm_chat_render,
    "llm_leakage_safe_split": llm_leakage_safe_split,
    "llm_robots_parse": llm_robots_parse,
    "llm_encoding_quality": llm_encoding_quality,
    "llm_chat_stats": llm_chat_stats,
    "llm_substring_strip": llm_substring_strip,
    "llm_gopher_report": llm_gopher_report,
    "llm_bpe_train": llm_bpe_train,
    "llm_trained_classifier": llm_trained_classifier,
    "llm_boilerplate": llm_boilerplate,
    "llm_bpe_tokenize": llm_bpe_tokenize,
    "llm_c4_pipeline": llm_c4_pipeline,
    "llm_dataset_card": llm_dataset_card,
    "llm_span_corruption": llm_span_corruption,
    "llm_tokenize": llm_tokenize,
    "llm_mixture_apply": llm_mixture_apply,
    "llm_web_pipeline": llm_web_pipeline,
    "llm_extract_spans": llm_extract_spans,
    "llm_dedup_audit": llm_dedup_audit,
    "llm_dedup_keep_longest": llm_dedup_keep_longest,
    "llm_mix_drift": llm_mix_drift,
    "llm_prefix_index": llm_prefix_index,
    "llm_balanced_sample": llm_balanced_sample,
    "llm_curriculum": llm_curriculum,
    "llm_index_dedup": llm_index_dedup,
    "llm_negative_pairs": llm_negative_pairs,
    "llm_domain_stats": llm_domain_stats,
    "llm_quality_classifier": llm_quality_classifier,
}


def v15_monitor(spark, sf):
    """V-family capstone -- ONE pipeline-health report row per canary:
    freshness gap days (v8), total PSI drift (v12), Benford chi-square
    (v13), and CUSUM-alarmed series count (w_cusum), each summarized to
    a scalar and unioned as (metric, value).  The shape an on-call
    dashboard actually reads; every underlying check keeps its own
    detailed gate.  Rounded terms are summed through DECIMAL so the
    report is shuffle-order-independent."""
    from .registry_core import v8_freshness, v12_psi, v13_benford

    def one(name, df_agg):
        return df_agg.select(F.lit(name).alias("metric"), "value")

    dec_sum = lambda c: F.round(  # noqa: E731
        F.sum(c.cast("decimal(18,6)")).cast("double"), 6
    )
    gaps = one(
        "freshness_gap_days",
        v8_freshness(spark, sf).agg(
            F.sum(F.col("is_gap").cast("int")).cast("double").alias("value")
        ),
    )
    psi = one(
        "psi_total",
        v12_psi(spark, sf).agg(dec_sum(F.col("psi_term")).alias("value")),
    )
    ben = one(
        "benford_chi2",
        v13_benford(spark, sf).agg(dec_sum(F.col("chi2_term")).alias("value")),
    )
    cus = one(
        "cusum_alarmed_types",
        w_cusum(spark, sf).agg(
            F.sum(F.col("first_alarm_up").isNotNull().cast("int"))
            .cast("double")
            .alias("value")
        ),
    )
    return gaps.unionByName(psi).unionByName(ben).unionByName(cus)


LLM_QUERIES["v15_monitor"] = v15_monitor
