"""LLM-training-data pipeline operators.

Beyond the reference's payroll surface, a 100 TB training-data pipeline
needs dedup / similarity / text-analysis / multimodal operators; these
are first-class engine components (see BASELINE.json north-star scope):

    text        -- tokenization, language-ID heuristic, quality scoring,
                   token counting, document fingerprinting.
    dedup       -- exact (hash-groupBy), n-gram Jaccard (exact), MinHash
                   + LSH banding (approximate, scale path), SimHash.
    similarity  -- brute-force cosine top-k (exact baseline) and
                   random-hyperplane LSH-bucketed ANN (scale path).
    multimodal  -- opaque-binary media columns with typed metadata;
                   Arrow-batched Pandas-UDF decode/feature plumbing
                   (decoder itself stubbed: no image/audio libs here).
    curation    -- eval-set decontamination, cross-corpus dedup,
                   deterministic sampling / train-val-test splits,
                   exact percentile quality cuts, sequence packing,
                   PII redaction, corpus report cards.

Everything except the multimodal decode is native Catalyst expressions
(higher-order array functions), so it scales with whole-stage codegen.
"""
