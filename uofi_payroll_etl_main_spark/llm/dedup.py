"""Document deduplication family for training-data curation.

Five tiers, each with a distinct scale/recall trade-off:

  exact_dedup_groups   -- hash-groupBy on md5(text).  One shuffle on a
                          16-byte key; the 100 TB workhorse.
  fingerprint_dedup    -- same, over whitespace/case-normalized text.
  jaccard_pairs        -- EXACT word-n-gram Jaccard similarity join via
                          shingle-explode + self-join on shared shingles.
                          Never materializes the n^2 pair space -- only
                          pairs sharing >=1 shingle meet, grouped
                          map-side.  Exact, SQL-expressible (oracle-able).
  minhash_lsh_*        -- MinHash signatures + LSH banding: candidate
                          pairs meet only inside a band bucket, then are
                          verified with exact Jaccard.  Sub-quadratic;
                          the standard web-scale near-dup design
                          (Broder resemblance sketches).
  simhash64            -- 64-bit SimHash signature per doc + hamming-
                          distance candidates via 16-bit chunk banding.

All deterministic: hash functions are seeded xxhash64, no RNG at run
time.  Everything is higher-order array expressions -- no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import bind1, normalize_text, tokens

__all__ = [
    "soft_dedup_weights",
    "exact_dedup_groups",
    "fingerprint_dedup",
    "word_shingles",
    "jaccard_pairs",
    "containment_pairs",
    "jaccard_pairs_prefix",
    "containment_pairs_prefix",
    "minhash_signature",
    "minhash_signatures_arrow",
    "duplicate_clusters",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "minhash_lane_sql",
    "minhash_lsh_pairs_md5",
    "simhash64",
    "simhash_candidates",
    "simhash_md5_hex_sql",
    "simhash_md5_bit_sql",
    "simhash_md5_chunks",
    "simhash_md5_candidates",
    "hamming_candidates64",
    "fuzzy_pairs_blocked",
    "sorted_neighborhood_pairs",
    "compression_ratio",
    "build_dedup_index",
    "dedup_against_index",
    "substring_dup_spans",
    "substring_strip",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


from .text import ensure_parallelism as _ensure_parallelism  # shared seam


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) -> (hash, keeper=min id, n_dups).

    groupBy on the digest, not the text: the shuffle moves 16-byte keys,
    not document bodies -- at 100 TB that is the entire difference.
    """
    return (
        df.select(F.md5(_c(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def fingerprint_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-canonical dedup: whitespace/case-normalized md5 groups."""
    return (
        df.select(F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text.

    transform over an index sequence + slice: no UDF.  Documents
    shorter than n words fall back to their full token string (so
    short docs still participate).  The token array crosses into the
    gram lambda as a BOUND value (text.bind1): an outer
    tokens(normalize_text(...)) referenced from the lambda would
    re-run the regexp+split chain once per shingle, not per row.
    """

    def _grams(toks: Column) -> Column:
        k = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
        short = F.array(F.concat_ws(" ", toks))
        return F.array_distinct(F.when(k >= n, grams).otherwise(short))

    return bind1(tokens(normalize_text(col)), _grams)


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) exploded table + per-doc shingle counts.

    The gram-array projection sits BEHIND a repartition exchange on
    purpose: downstream both `size` and `explode` reference it, and
    CollapseProject would otherwise inline the whole
    normalize->tokenize->transform expression into each reference
    (and into BOTH branches of a self-join), multiplying the dominant
    compute 2-4x -- measured 8-11s vs ~3s at sf0.1.  The exchange
    materializes each doc's array exactly once, pre-explode (compact:
    1x rows, not shingle-x rows), and identical branches of a
    self-join collapse into one ReusedExchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    sh = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("sh")
    ).repartition(target)
    # explode_OUTER, deliberately: word_shingles never returns an empty
    # array (short docs fall back to the whole-doc token string), but a
    # plain explode lets InferFiltersFromGenerate derive `size(sh) > 0`
    # and push THE ENTIRE gram expression below both exchanges onto the
    # (often single-partition) scan, where it runs serially -- measured
    # 8-11s of the 10s query at sf0.1.  Outer generate infers no such
    # filter; a hypothetical empty array would yield one null-shingle
    # row, which no equi-join can match anyway.
    return sh.select("doc", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity join: pairs (a<b) with
    |A ∩ B| / |A ∪ B| >= threshold.

    Plan shape: explode shingles -> self-join on the shingle (only
    co-shingled pairs ever exist) -> count intersections -> compute
    union as |A|+|B|-inter.  The join key is the shingle, so hot
    shingles (stopword n-grams) are the skew risk: normalize first and
    raise n to keep shingle frequency low; AQE skew-join handles the
    residue.
    """
    s = _shingle_table(df, id_col, text_col, n)
    if max_shingle_docs is not None:
        # Hot-shingle guard (opt-in because it changes exact semantics):
        # drop shingles appearing in more than `max_shingle_docs` docs
        # before the self-join.  A stopword n-gram present in x% of a
        # 100 TB corpus would otherwise create an (x*N)^2 join blowup on
        # one key; dropping ubiquitous shingles barely moves Jaccard for
        # near-dup thresholds (they contribute equally to both sides).
        hot = (
            s.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_docs)
            .select("shingle")
        )
        s = s.join(F.broadcast(hot), "shingle", "left_anti")
    a = s.alias("a")
    b = s.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def minhash_signature(col: Column | str, num_hashes: int = 64, n: int = 3) -> Column:
    """MinHash signature: array of `num_hashes` permutation minima over
    the shingle set.

    One pass, two string hashes per shingle: Kirsch-Mitzenmacher double
    hashing derives permutation i as ``h1 + (i+1)*h2``, so the
    expression tree stays tiny -- the naive 64-independent-hash form
    embeds the whole shingle subtree 64x in one projection (Catalyst
    cannot CSE through higher-order-function lambdas), which blows
    codegen to multi-MiB task binaries.  Both hashes are masked to 31
    bits so ``h1 + num_hashes*h2`` fits in a long under ANSI mode (the
    driver runs a default ANSI-on Spark 4 session).
    """
    sh = word_shingles(col, n)
    mask = F.lit((1 << 31) - 1).cast("long")
    # per shingle: [h1, h2] masked to 31 bits (ANSI-safe arithmetic)
    pairs = F.transform(
        sh,
        lambda s: F.array(
            F.xxhash64(s).bitwiseAND(mask), F.xxhash64(s, F.lit(42)).bitwiseAND(mask)
        ),
    )
    idx = F.sequence(F.lit(1).cast("long"), F.lit(num_hashes).cast("long"))
    init = F.array(*[F.lit((1 << 62)).cast("long")] * num_hashes)
    prime = F.lit((1 << 31) - 1).cast("long")  # Mersenne prime 2^31-1
    return F.aggregate(
        pairs,
        init,
        lambda acc, p: F.zip_with(
            acc,
            # The mod-prime wrap de-correlates the permutations: unwrapped,
            # h1 + i*h2 is ordered by h2 alone once i is large, so all 64
            # components would agree/disagree together.  h1 + 64*h2 < 2^38
            # keeps the pre-mod arithmetic far from long overflow (ANSI).
            F.transform(idx, lambda i: F.pmod(p[0] + i * p[1], prime)),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_signatures_arrow(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Arrow tier of the MinHash signature: shingle hashes stay JVM-side
    (two FLAT array<long> columns -- flat arrays cross Arrow as
    ndarrays, nested ones degrade to per-row lists), and the
    permutation minima collapse to one NumPy broadcast-min per doc.

    Bit-identical to `minhash_signature` (same hashes, same mod-prime
    double-hashing), asserted in tests -- so the tiers are
    interchangeable.  Measured honestly: at short-doc gate scale the
    two tiers are equal warm (~3.3s vs ~3.4s at sf0.1) and this one
    additionally pays the Python-worker pool spin-up cold, so the
    Catalyst tier is the default.  This tier wins when signature
    compute dominates -- long documents (thousands of shingles) or
    num_hashes >> 64 -- because the per-shingle work is a NumPy
    stream instead of an interpreted HOF expression tree.
    """
    import numpy as np
    import pandas as pd

    mask = F.lit((1 << 31) - 1).cast("long")
    sh = word_shingles(text_col, n)
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(mask)).alias("h1"),
        F.transform(sh, lambda s: F.xxhash64(s, F.lit(42)).bitwiseAND(mask)).alias("h2"),
    )
    prime = (1 << 31) - 1

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"doc": pdf["doc"], "sig": []})
                continue
            # Whole-batch vectorization: concatenate every doc's shingle
            # hashes into one flat array and fold each permutation with
            # ONE minimum.reduceat over doc offsets -- a per-row loop
            # here is overhead-bound (thousands of tiny NumPy calls) and
            # loses to the Catalyst tier; this form wins.
            lens = np.fromiter((len(h) for h in pdf["h1"]), dtype=np.int64, count=len(pdf))
            offsets = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            c1 = np.concatenate([np.asarray(h, dtype=np.int64) for h in pdf["h1"]])
            c2 = np.concatenate([np.asarray(h, dtype=np.int64) for h in pdf["h2"]])
            # word_shingles never yields an empty array (blank docs fall
            # back to a single empty-string shingle), so offsets are
            # strictly increasing and reduceat segments are well-formed
            sig_mat = np.empty((len(lens), num_hashes), dtype=np.int64)
            for i in range(num_hashes):
                perm = (c1 + (i + 1) * c2) % prime
                sig_mat[:, i] = np.minimum.reduceat(perm, offsets)
            yield pd.DataFrame({"doc": pdf["doc"], "sig": list(sig_mat)})

    return base.mapInPandas(compute, schema="doc long, sig array<long>")


def minhash_lsh_candidates(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 4096,
    use_arrow: bool = False,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become a
    candidate pair.  bands=16 x rows=4 over 64 hashes targets the
    ~0.5-Jaccard operating point (s-curve threshold ≈ (1/b)^(1/r)).

    Scale shape: explode per-band bucket keys (16 rows/doc), shuffle on
    (band, bucket) -- never on raw text -- then pair within buckets.
    """
    rows = num_hashes // bands
    if use_arrow:
        sig = minhash_signatures_arrow(df, num_hashes, n, id_col, text_col)
    else:
        sig = _ensure_parallelism(df).select(
            F.col(id_col).alias("doc"), minhash_signature(text_col, num_hashes, n).alias("sig")
        )
    band_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.element_at("sig", i * rows + j + 1).cast("string") for j in range(rows)])).alias("bucket"),
            )
            for i in range(bands)
        ]
    )
    bucketed = sig.select("doc", F.explode(band_keys).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket")
    )
    # Pair within buckets via groupBy + array pair-expansion, NOT a
    # self-join: a self-join evaluates the signature subplan twice (the
    # dominant cost), while one groupBy shuffles only (band, bucket, doc)
    # rows.  Bucket membership requires agreeing on a whole band, so
    # bucket sizes track true duplicate-cluster sizes; the k^2 expansion
    # is the same pair set the join would have produced.
    docs_per_bucket = (
        bucketed.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_set("doc")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    # Hot-bucket guard: a degenerate bucket (e.g. thousands of sub-n-word
    # docs sharing one fallback shingle) would expand k^2 pairs inside
    # ONE task.  Such buckets are exact-duplicate clusters in all but
    # name -- run exact_dedup_groups/fingerprint_dedup first; pairs
    # inside skipped buckets are intentionally not emitted.
    if max_bucket_size is not None:
        docs_per_bucket = docs_per_bucket.filter(F.size("docs") <= max_bucket_size)
    pair_structs = F.flatten(
        F.transform(
            "docs",
            lambda x, i: F.transform(
                F.slice("docs", i + 2, F.greatest(F.size("docs") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        docs_per_bucket.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 4096,
    use_arrow: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: LSH candidates verified with EXACT
    Jaccard (join back to shingle sets).  Output matches jaccard_pairs
    restricted to candidates -- i.e. classic recall<=1, precision=1
    near-dup detection, sub-quadratic.  use_arrow swaps the signature
    stage to the NumPy tier (bit-identical output)."""
    cand = minhash_lsh_candidates(
        df, num_hashes, bands, n, id_col, text_col, max_bucket_size, use_arrow
    )
    # Verify with Jaccard over per-doc shingle-HASH arrays: two slim joins
    # on the doc id + array_intersect, instead of exploding both shingle
    # tables and re-joining on raw shingle strings (which re-reads and
    # re-shingles the corpus twice and shuffles full n-gram text).
    # 64-bit xxhash collisions inside one pair's union are negligible.
    hs = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.transform(word_shingles(text_col, n), lambda s: F.xxhash64(s)).alias("hs"),
    )
    a = hs.select(F.col("doc").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = hs.select(F.col("doc").alias("doc_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            F.size("hs_a").alias("n_a"),
            F.size("hs_b").alias("n_b"),
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def minhash_lane_sql(shingle_sql: str, j: int, lane: int) -> str:
    """One MinHash permutation minimum's per-shingle value: 8 hex chars
    of md5('<j>:' || shingle).  Each md5 serves FOUR permutations (its
    32 hex chars are four independent 8-char uniforms), so 16
    components cost 4 hashes per shingle.  The HEX STRING ordering is a
    uniform random order, so a string MIN is a valid permutation
    minimum -- and any md5-bearing engine reproduces it verbatim (no
    hex->int conversion anywhere)."""
    return f"substring(md5('{j}:' || {shingle_sql}), {lane * 8 + 1}, 8)"


def minhash_lsh_pairs_md5(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-engine-VERIFIABLE MinHash-LSH candidate pairs: 16
    permutation minima taken as string MINs over md5 hex lanes
    (minhash_lane_sql), banded 4x4 -- docs sharing any band's
    concatenated 4-component bucket string become a candidate pair
    (collision threshold ~ s^4 per band, ~0.7 Jaccard at 4 bands).

    This tier exists for VERIFIABILITY: the DuckDB oracle re-derives
    signatures, buckets, and the exact candidate set, so the banding
    algebra is value-checked end-to-end -- something the xxhash64
    production tiers (minhash_lsh_candidates/_pairs, ~8x cheaper per
    shingle and bucket-size-capped) cannot offer.  Use those at 100 TB;
    use this one to certify a deployment's LSH plumbing.

    Plan shape: shingle explode -> one groupBy(doc) computing all 16
    mins map-side -> 4-band explode -> (band, bucket) self-equi-join ->
    distinct pair.  No cartesian anywhere (plan-linted).
    """
    sh = _shingle_table(df, id_col, text_col, n)  # (doc, n_sh, shingle)
    comps = [
        F.min(F.expr(minhash_lane_sql("shingle", j, lane))).alias(f"__c{j * 4 + lane}")
        for j in range(4)
        for lane in range(4)
    ]
    sig = sh.groupBy("doc").agg(*comps)
    # ONE band explode (not a 4-way union, which would re-derive the
    # signature aggregation per band AND per self-join side -- 8 corpus
    # scans; the lint rejects that shape).  The explode sits on top of
    # the groupBy exchange, so the self-join's identical branches
    # collapse into one ReusedExchange: the corpus is shingled once.
    bands = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[F.col(f"__c{b * 4 + r}") for r in range(4)]
                        ).alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("__bb"),
    ).select("doc", F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket"))
    a = bands.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b2 = bands.select(F.col("doc").alias("doc_b"), "band", "bucket")
    return (
        a.join(b2, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash of the token multiset.

    Per token: xxhash64 -> 64 sign contributions (+1/-1 per bit);
    aggregate element-wise; signature bit j = (sum_j > 0).  Pure
    higher-order expressions; one pass over tokens.
    """
    toks = tokens(normalize_text(col))
    # Hash each token ONCE (array<long>), then unroll the 64 bit
    # extractions over the already-hashed lambda variable.  Embedding
    # xxhash64(t) in each of the 64 lanes (the naive form) repeats the
    # whole hash subtree 64x per aggregate step and blows codegen to
    # multi-MiB task binaries; this form is bit-identical output.
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # Accumulator = 65 int lanes: per-bit ones-counts + token count.  The
    # signature is assembled in aggregate's `finish` lambda, where the
    # accumulator is a BOUND variable -- assembling outside the aggregate
    # would re-inline the whole aggregate subtree into each of the 64
    # OR-terms (Catalyst doesn't CSE through it), which is exactly the
    # multi-MiB-codegen trap this form exists to avoid.
    def _merge(acc, h):
        lanes = [F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int") for j in range(64)]
        return F.zip_with(acc, F.array(*lanes, F.lit(1)), lambda a, b: a + b)

    def _finish(acc):
        # bit j set <=> strict majority of tokens have bit j set
        # (ones - (n - ones) > 0  <=>  2*ones > n), i.e. the +1/-1 sum > 0.
        n = F.element_at(acc, 65)
        sig = F.lit(0).cast("long")
        for j in range(64):
            weight = F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("long")
            sig = sig.bitwiseOR(
                F.when(F.element_at(acc, j + 1) * 2 > n, weight).otherwise(F.lit(0).cast("long"))
            )
        return sig

    init = F.array(*[F.lit(0)] * 65).cast("array<int>")
    return F.aggregate(hashes, init, _merge, _finish)


def simhash_candidates(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Near-dup candidates by SimHash: band the 64-bit signature into 4
    16-bit chunks; pigeonhole -- any pair within hamming<=3 agrees on at
    least one chunk.  Verify with bit_count(xor) <= max_hamming."""
    sig = _ensure_parallelism(df).select(F.col(id_col).alias("doc"), simhash64(text_col).alias("sig"))
    return hamming_candidates64(
        sig, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def simhash_md5_hex_sql(tok_sql: str, c: int) -> str:
    """Hex char c (0-15) of md5(token) -- the raw material for 4 SimHash
    bit lanes; one md5 per token row serves all 64 bits."""
    return f"substring(md5({tok_sql}), {c + 1}, 1)"


def simhash_md5_bit_sql(hex_col: str, bit_in_nibble: int) -> str:
    """Bit `bit_in_nibble` (0-3) of a hex char column: nibble value via
    instr into the hex alphabet, then integer shift/mask spelled as
    floor-divide + mod -- plain ANSI arithmetic both engines share."""
    return (
        f"(CAST(floor((instr('0123456789abcdef', {hex_col}) - 1) "
        f"/ {2 ** bit_in_nibble}) AS INT) % 2)"
    )


def simhash_md5_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Verifiable SimHash: 64 bit-majority votes over the token multiset
    with bits drawn from md5 hex nibbles (simhash_md5_*_sql -- the SQL
    text is shared verbatim with the oracle), emitted as FOUR 16-bit
    chunk ints (the banding keys) instead of one signed 64-bit word, so
    no engine-specific signed-shift semantics ever enter.  One token
    explode, one md5 per token row, one groupBy(doc) carrying 64
    map-side-combined sums."""
    toks = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(normalize_text(text_col))).alias("tok"),
    )
    hx = toks.selectExpr(
        "doc", *[f"{simhash_md5_hex_sql('tok', c)} AS h{c}" for c in range(16)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(64):
        aggs.append(
            F.sum(F.expr(simhash_md5_bit_sql(f"h{j // 4}", j % 4))).alias(f"b{j}")
        )
    per = hx.groupBy("doc").agg(*aggs)
    chunk_cols = []
    for c in range(4):
        expr = " + ".join(
            f"(CASE WHEN 2 * b{16 * c + j} > n THEN {2 ** j} ELSE 0 END)"
            for j in range(16)
        )
        chunk_cols.append(F.expr(f"CAST({expr} AS INT)").alias(f"c{c}"))
    return per.select("doc", *chunk_cols)


def simhash_md5_candidates(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Verifiable twin of simhash_candidates: same 4x16 chunk banding +
    exact Hamming verify, on the md5-nibble signature -- the DuckDB
    oracle re-derives signatures, buckets, AND the verified pair set.
    Production stays on simhash64/xxhash64 (one hash vs sixteen
    substring lanes per token); this tier certifies the banding +
    verify algebra end-to-end.  Output (doc_a, doc_b, hamming)."""
    sig = simhash_md5_chunks(df, id_col, text_col)
    bands = sig.select(
        "doc",
        "c0",
        "c1",
        "c2",
        "c3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("idx"), F.col(f"c{i}").alias("key")
                    )
                    for i in range(4)
                ]
            )
        ).alias("__bk"),
    ).select("doc", "c0", "c1", "c2", "c3", "__bk.idx", "__bk.key")
    a = bands.select(
        F.col("doc").alias("doc_a"),
        *[F.col(f"c{i}").alias(f"a{i}") for i in range(4)],
        "idx",
        "key",
    )
    b = bands.select(
        F.col("doc").alias("doc_b"),
        *[F.col(f"c{i}").alias(f"b{i}") for i in range(4)],
        "idx",
        "key",
    )
    ham = None
    for i in range(4):
        term = F.bit_count(
            F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")).cast("long")
        )
        ham = term if ham is None else ham + term
    return (
        a.join(b, ["idx", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def hamming_candidates64(
    sig: DataFrame,
    id_col: str = "doc",
    sig_col: str = "sig",
    max_hamming: int = 3,
    max_bucket_size: int | None = 4096,
) -> DataFrame:
    """Banded Hamming-near pairs over ANY precomputed 64-bit signature
    column (SimHash text signatures, image dHashes, ...): 4 x 16-bit
    chunk buckets, in-bucket pair expansion, bit_count(xor) verify.
    The pigeonhole guarantee covers hamming <= 3 (one of four chunks
    must agree); larger thresholds still verify exactly but recall
    becomes best-effort, LSH-style.  One shuffle on the 16-bit bucket
    key; hot buckets capped like minhash_lsh_candidates.  Output
    (doc_a, doc_b, hamming)."""
    sig = sig.select(F.col(id_col).alias("doc"), F.col(sig_col).alias("sig"))
    chunks = sig.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    # Pair within (chunk, key) buckets via groupBy + array expansion --
    # one signature evaluation, one shuffle on the 16-bit bucket key --
    # instead of a self-join that computes the SimHash subplan twice.
    # Signatures ride along inside the collected structs, so hamming
    # verification happens in place.
    buckets = (
        chunks.groupBy("chunk", "key")
        .agg(F.array_sort(F.collect_set(F.struct("doc", "sig"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    if max_bucket_size is not None:  # hot-bucket guard (see minhash_lsh_candidates)
        buckets = buckets.filter(F.size("ds") <= max_bucket_size)
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.greatest(F.size("ds") - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x["doc"].alias("doc_a"),
                    y["doc"].alias("doc_b"),
                    F.bit_count(x["sig"].bitwiseXOR(y["sig"])).alias("hamming"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def duplicate_clusters(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components by iterative min-label propagation.  Output
    (doc_id, cluster_id) where cluster_id = min doc id reachable --
    the keeper-election step that turns a similarity join into an
    actual dedup decision.

    Driver-controlled loop (the canonical Spark shape for iterative
    graph algorithms): each round joins labels to the bidirectional
    edge list, takes the neighborhood min, and stops at fixpoint.
    Rounds needed = component diameter -- tiny for near-dup clusters
    (dup groups are dense), so 3-4 rounds in practice.  localCheckpoint
    truncates lineage each round; per-round state is (node, label)
    longs, never text.
    """
    e = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bidir = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    bidir = bidir.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        nbr_min = (
            labels.join(bidir, labels["node"] == bidir["a"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def fuzzy_pairs_blocked(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 64,
    block_len: int = 8,
    max_dist: int = 8,
) -> DataFrame:
    """Edit-distance near-dup pairs with prefix blocking: documents whose
    normalized `prefix_len`-char heads are within `max_dist` Levenshtein
    edits, compared only inside `block_len`-char prefix blocks.

    The classic entity-resolution blocking shape: candidate pairs form
    per block (a hash-partitioned equi self-join, never the n^2 cross
    space), and the quadratic-cost levenshtein kernel runs on bounded
    `prefix_len` heads so per-pair cost is a constant.  Blocking trades
    recall for scale exactly like LSH banding -- edits inside the first
    `block_len` chars move a doc to another block (use minhash_lsh_pairs
    when edits can land anywhere).

    Exact given the blocking rule, so fully DuckDB-oracle-able
    (levenshtein exists in both engines).
    """
    norm = F.substring(normalize_text(text_col), 1, prefix_len)
    base = df.select(
        F.col(id_col).alias("id"),
        norm.alias("head"),
        F.substring(norm, 1, block_len).alias("block"),
    ).filter(F.length("head") > 0)
    a = base.select(
        F.col("id").alias("doc_a"), F.col("head").alias("head_a"), "block"
    )
    b = base.select(
        F.col("id").alias("doc_b"), F.col("head").alias("head_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("head_a", "head_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_len: int = 16,
    window: int = 4,
    prefix_len: int = 64,
    max_dist: int = 8,
    bucket_chars: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995) -- the
    classic entity-resolution COMPLEMENT to prefix blocking
    (fuzzy_pairs_blocked): sort the corpus ONCE by a normalized
    `key_len`-char sort key, then compare each record only to its next
    `window` successors in the sorted order, verifying with bounded
    Levenshtein over `prefix_len`-char heads.  Where a prefix block
    misses pairs whose first chars differ, the sorted order still
    adjacencies them if their sort keys are close lexicographically;
    candidate volume is EXACTLY n*window, independent of block skew.

    Scale shape: the global rank is computed WITHOUT a
    single-partition window -- the first `bucket_chars` chars of the
    sort key form order-preserving range buckets, per-bucket counts
    (a tiny side frame) become cumulative offsets, and
    rank = offset + row_number within the bucket (the shuffle_index
    zipWithIndex trick).  Candidates then form by exploding each row
    into its `window` successor ranks and hash-equi-joining on the
    integer rank -- one exchange for the sort, one for the join, both
    key-hashed; no n^2 space, no range join.  At 100 TB raise
    bucket_chars so range buckets stay executor-sized.

    Deterministic total order (key, id), so fully value-oracle-able:
    the DuckDB oracle replays row_number() OVER (ORDER BY key, id) and
    the same window join.  Returns (doc_a, doc_b, gap, dist) with
    doc_a the LOWER-ranked record and gap = rank distance (1..window).
    """
    from pyspark.sql.window import Window

    norm = normalize_text(text_col)
    base = df.select(
        _c(id_col).alias("id"),
        F.substring(norm, 1, prefix_len).alias("head"),
        F.substring(norm, 1, key_len).alias("key"),
    ).filter(F.length("head") > 0)
    bkt = F.substring("key", 1, bucket_chars)
    withb = base.withColumn("__b", bkt)
    counts = withb.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    w_in = Window.partitionBy("__b").orderBy("key", "id")
    # materialize ONCE: both sides of the window join consume the ranked
    # frame, and without this the scan + sort + rank lineage runs twice
    # (audited: 4 parquet scans -> 1, the double-scan shape the plan
    # lint exists for).  The checkpoint holds (id, head, rank) -- far
    # smaller than the corpus it indexes.
    ranked = (
        withb.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__r", (F.col("__off") + F.row_number().over(w_in)).cast("long")
        )
        .select("id", "head", "__r")
        .localCheckpoint(eager=True)
    )
    probes = ranked.select(
        F.col("id").alias("doc_a"),
        F.col("head").alias("head_a"),
        F.col("__r").alias("__ra"),
        F.explode(
            F.sequence(F.col("__r") + 1, F.col("__r") + F.lit(int(window)))
        ).alias("__r"),
    )
    return (
        probes.join(
            ranked.select(
                F.col("id").alias("doc_b"),
                F.col("head").alias("head_b"),
                "__r",
            ),
            "__r",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("__r") - F.col("__ra")).cast("long").alias("gap"),
            F.levenshtein("head_a", "head_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= int(max_dist))
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) -- the
    Gopher-style repetition signal: boilerplate and templated spam
    compress far below ~0.4, high-entropy natural text sits higher.

    Needs a real DEFLATE kernel, so this is the one text op that runs in
    Python -- Arrow-batched mapInPandas, utf-8 bytes in, two scalars out;
    the batch loop only calls zlib per item (the unavoidable kernel).
    Deterministic for a fixed zlib level -> pytest-checked; no SQL
    oracle (DuckDB has no DEFLATE).
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    schema = f"{id_col} long, n_raw long, n_compressed long, ratio double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [t.encode("utf-8") if isinstance(t, str) else b"" for t in pdf[text_col]]
            n_raw = [len(r) for r in raw]
            n_comp = [len(zlib.compress(r, level)) for r in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_raw": pd.Series(n_raw, dtype="int64"),
                    "n_compressed": pd.Series(n_comp, dtype="int64"),
                    "ratio": [
                        (c / r if r else 0.0) for c, r in zip(n_comp, n_raw)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """EXACT n-gram CONTAINMENT join: pairs (a<b) where the smaller
    shingle set is mostly inside the other -- |A ∩ B| / min(|A|,|B|)
    >= threshold.

    Jaccard is symmetric and misses the quote/boilerplate case: a short
    doc wholly embedded in a long one has tiny Jaccard but containment
    ~1.  This is the partial-duplicate detector from the dedup
    literature (containment a la Broder's resemblance/containment
    pair), and the exact baseline for MinHash-containment tiers.

    Same scale shape as jaccard_pairs: shingle-explode equi self-join
    (only co-shingled pairs materialize), group to intersection counts,
    pure arithmetic after.  Emits both directional containments so the
    caller can tell "A in B" from "B in A".
    """
    s = _shingle_table(df, id_col, text_col, n)
    if max_shingle_docs is not None:
        hot = (
            s.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_docs)
            .select("shingle")
        )
        s = s.join(F.broadcast(hot), "shingle", "left_anti")
    a = s.alias("a")
    b = s.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    cont = F.col("inter") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        inter.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("inter") / F.col("n_a")).alias("cont_a"),
            (F.col("inter") / F.col("n_b")).alias("cont_b"),
            "containment",
        )
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT n-gram Jaccard join via PREFIX FILTERING (the SSJoin /
    PPJoin family): provably the same pairs as `jaccard_pairs`, with a
    far smaller candidate space.

    Prefix principle: order every doc's shingles by a global canonical
    order (ascending document frequency, ties by shingle text -- rarest
    first).  If J(A,B) >= t, the prefixes of length
    |x| - ceil(t*|x|) + 1 MUST share a shingle, so only prefix-shingle
    collisions become candidates.  The naive join explodes on EVERY
    shingle -- its worst key is the most common shingle; this joins
    only on each doc's RAREST shingles, so candidate volume drops
    superlinearly with threshold and the join's hottest keys are
    structurally its coldest shingles.  Verification then computes the
    true Jaccard from the full shingle arrays (array_intersect) -- no
    false positives survive, no true pair is lost (the ceil is nudged
    by -1e-9 so float error can only ENLARGE a prefix, never shrink
    it).

    Plan: shingle df count (one groupBy) -> per-doc rank window
    (partitioned by doc: bounded state) -> prefix equi join -> distinct
    pairs -> verify against the two full arrays.  Oracle-checked with
    the SAME DuckDB SQL as the naive tier: exactness is the contract.

    Candidate pruning (PPJoin, Xiao et al. 2008) -- both provably
    lossless, applied INSIDE the prefix join so pruned pairs never
    reach the distinct or the array-verify stage (measured sf0.1:
    522k candidate pairs -> 206k for 256 true pairs):
    - length filter: J(A,B) >= t forces |A∩B| >= t*|A∪B| >= t*max, and
      |A∩B| <= min, so min(|A|,|B|) >= t*max(|A|,|B|).
    - positional filter: for the pair's globally FIRST common shingle
      (canonical (df, shingle) order), no common shingle precedes it in
      either doc, so inter <= 1 + min(|A| - rn_A, |B| - rn_B); a true
      pair needs inter >= t/(1+t) * (|A|+|B|).  Rows of OTHER common
      prefix shingles may be pruned by this bound, but the first common
      shingle's row always survives for a true pair (its bound is
      exact-side), and the prefix principle guarantees that shingle
      sits in BOTH prefixes -- so keeping a pair when ANY collision row
      passes loses nothing.  Both bounds get an absolute (1e-9) PLUS
      relative (1e-12 * the size term) slack: double rounding error is
      relative, so a fixed epsilon alone stops covering it for docs
      beyond ~5e6 distinct shingles -- the combined slack only ever
      weakens a filter, never a guarantee.
    """
    from pyspark.sql import Window

    # Same materialization discipline as _shingle_table: the gram array
    # goes behind one repartition exchange (computed once, in parallel)
    # and every branch below -- exploded table, verify sides -- reads it
    # back as a ReusedExchange; explode_OUTER keeps
    # InferFiltersFromGenerate from pushing the whole expression onto
    # the serial scan (measured 8s of the 13s query at sf0.1).
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("__sh")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    s = base.select("doc", F.size("__sh").alias("n_sh"), F.explode_outer("__sh").alias("shingle"))
    dfreq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # shuffle-hash, never broadcast: dfreq is the DISTINCT-SHINGLE table
    # and grows with the corpus (2.7M rows at a 100x scale-up, measured)
    # -- AQE's runtime broadcast of it builds a multi-hundred-MB hash
    # relation that can fail the exchange under memory pressure, and at
    # real scale it cannot fit at all.  Both sides already shuffle on
    # the shingle key, which is the plan that survives.
    ranked = s.join(dfreq.hint("shuffle_hash"), "shingle")
    w = Window.partitionBy("doc").orderBy("__df", "shingle")
    plen = (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold) - F.lit(1e-9)) + 1)
    prefix = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= plen)
        .select("doc", "shingle", "n_sh", "__rn")
    )
    t = float(threshold)
    # Slack on both bounds is absolute AND relative: double rounding of
    # t*max is ~2 ulps, i.e. RELATIVE (~5e-16 * the product), so a fixed
    # 1e-9 alone stops covering it once a doc has >~5e6 distinct
    # shingles; the added 1e-12-relative term dominates the rounding
    # error at every size with four orders of margin.  Slack can only
    # WEAKEN a filter (false positives go to verify and die there).
    gmax = F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
    length_ok = F.least(F.col("a.n_sh"), F.col("b.n_sh")) >= (
        F.lit(t) * gmax - (F.lit(1e-9) + F.lit(1e-12) * gmax)
    )
    overlap_ub = F.lit(1) + F.least(
        F.col("a.n_sh") - F.col("a.__rn"), F.col("b.n_sh") - F.col("b.__rn")
    )
    nsum = F.col("a.n_sh") + F.col("b.n_sh")
    overlap_needed = F.lit(t / (1.0 + t)) * nsum - (
        F.lit(1e-9) + F.lit(1e-12) * nsum
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            & length_ok
            & (overlap_ub >= overlap_needed),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .dropDuplicates()
        # spread the candidate table before the verify joins: candidates
        # are 16-byte pair rows whose downstream cost is an
        # array_intersect over the two full shingle arrays, so AQE's
        # BYTE-targeted coalesce under-parallelizes the verify stage at
        # any scale (measured sf0.1: 12.5 run-s squeezed into 5 tasks).
        # Round-robin by-num, deliberately, after measuring the "nicer"
        # keyed shapes: repartition(P, doc_a) is ELIDED (the window's
        # doc partitioning aliases through the self-join to doc_a, so
        # the exchange is redundant -- 3.9s, the 5-task verify back);
        # repartition(P, doc_a, doc_b) BEFORE the distinct replaces the
        # dedup's exchange on paper but measured 5.0s vs 2.65s here.
        # Known cost accepted: in the shuffle-join regime (corpus-scale
        # arrays can't broadcast) the verify join re-shuffles by doc_a
        # on top of this round-robin -- one extra pass over the pair-id
        # table, the cheapest table in the query.
        # defaultParallelism-derived, like ensure_parallelism -- not a
        # tuned constant.  Measured 3.8-4.1s -> 2.65s warm best-of-5.
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    arrs = base.select(F.col("doc"), F.col("__sh"))
    va = arrs.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("__sha"))
    vb = arrs.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("__shb"))
    verified = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("__sha", "__shb")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("__sha") + F.size("__shb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "inter", "jaccard")


def containment_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT containment join via ASYMMETRIC prefix filtering: same
    result contract as `containment_pairs`, with a one-sided candidate
    space.

    For C(A,B) = inter / min(|A|,|B|) >= t, let x be the smaller set:
    inter >= ceil(t*|x|), so if the |x| - ceil(t*|x|) + 1 rarest
    shingles of x all miss B, the remaining suffix is too short to
    reach the required overlap -- contradiction.  Hence joining every
    doc's PREFIX against every doc's FULL posting table (one side
    pruned, the other intact; the larger doc's side cannot be pruned
    because the overlap may be a tiny fraction of it) loses no pair.
    Verification on the full arrays then removes false positives.

    Candidate volume: |prefix| x posting-list instead of posting-list
    squared -- the naive containment join's quadratic hot-shingle cost
    keeps only one factor.
    """
    from pyspark.sql import Window

    # Same materialization discipline as _shingle_table: the gram array
    # goes behind one repartition exchange (computed once, in parallel)
    # and every branch below -- exploded table, verify sides -- reads it
    # back as a ReusedExchange; explode_OUTER keeps
    # InferFiltersFromGenerate from pushing the whole expression onto
    # the serial scan (measured 8s of the 13s query at sf0.1).
    base = _ensure_parallelism(df).select(
        F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("__sh")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    s = base.select("doc", F.size("__sh").alias("n_sh"), F.explode_outer("__sh").alias("shingle"))
    dfreq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # shuffle-hash, never broadcast: dfreq is the DISTINCT-SHINGLE table
    # and grows with the corpus (2.7M rows at a 100x scale-up, measured)
    # -- AQE's runtime broadcast of it builds a multi-hundred-MB hash
    # relation that can fail the exchange under memory pressure, and at
    # real scale it cannot fit at all.  Both sides already shuffle on
    # the shingle key, which is the plan that survives.
    ranked = s.join(dfreq.hint("shuffle_hash"), "shingle")
    w = Window.partitionBy("doc").orderBy("__df", "shingle")
    plen = (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(threshold) - F.lit(1e-9)) + 1)
    prefix = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= plen)
        .select(F.col("doc").alias("pdoc"), "shingle")
    )
    full = s.select(F.col("doc").alias("fdoc"), "shingle")
    cand = (
        prefix.join(full, "shingle")
        .filter(F.col("pdoc") != F.col("fdoc"))
        .select(
            F.least("pdoc", "fdoc").alias("doc_a"),
            F.greatest("pdoc", "fdoc").alias("doc_b"),
        )
        .dropDuplicates()
        # same verify-stage spread as jaccard_pairs_prefix: round-robin
        # by-num after the distinct (the keyed shapes measured slower
        # there -- see that function's comment); AQE byte-coalescing
        # otherwise under-parallelizes the CPU-bound array verify
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    va = base.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("__sha"))
    vb = base.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("__shb"))
    verified = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("__sha", "__shb")).cast("long"))
        .withColumn("n_a", F.size("__sha"))
        .withColumn("n_b", F.size("__shb"))
        .withColumn("containment", F.col("inter") / F.least("n_a", "n_b"))
        .filter(F.col("containment") >= threshold)
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("inter") / F.col("n_a")).alias("cont_a"),
        (F.col("inter") / F.col("n_b")).alias("cont_b"),
        "containment",
    )


def build_dedup_index(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the corpus's near-canonical fingerprint index: one
    (fingerprint, keeper_id) row per distinct normalized-text digest,
    parquet at `path`.  This is the artifact that makes dedup
    INCREMENTAL: tomorrow's batch checks the index instead of
    rescanning yesterday's 100 TB of text.

    The index carries digests only -- ~48 bytes/row regardless of
    document size -- so a trillion-doc corpus indexes in ~50 TB-scale
    storage and the probe join shuffles no text.
    """
    (
        df.select(F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"))
        .write.mode("overwrite")
        .parquet(path)
    )


def dedup_against_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-batch dedup: tag each incoming document as fresh or
    already-known by probing the persisted fingerprint index, and for
    within-batch duplicates keep only the min-id representative.

    One hash equi-join on the digest (left join -> `known_keeper_id`
    null means fresh) after an in-batch groupBy dedup; both shuffles
    carry (fingerprint, id) pairs only.  Returns one row per distinct
    incoming fingerprint: (fingerprint, new_id, n_batch_dups,
    known_keeper_id, is_new).
    """
    spark = new_docs.sparkSession
    idx = spark.read.parquet(index_path).select(
        "fingerprint", F.col("keeper_id").alias("known_keeper_id")
    )
    batch = (
        new_docs.select(
            F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col)
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("new_id"),
            F.count(F.lit(1)).alias("n_batch_dups"),
        )
    )
    return batch.join(idx, "fingerprint", "left").select(
        "fingerprint",
        "new_id",
        "n_batch_dups",
        "known_keeper_id",
        F.col("known_keeper_id").isNull().alias("is_new"),
    )


# --------------------------------------------------------------------------
# Exact substring dedup (maximal repeated token spans)
# --------------------------------------------------------------------------

def _window_occurrences(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, start, whash) for every k-token window of the normalized
    text: one corpus scan, windows built with a codegen transform over
    an index sequence (no UDF, no self-join), then posexploded.  Docs
    shorter than k tokens contribute nothing.  The 8-byte xxhash64 is
    the shuffle key -- the window text itself never leaves the scan
    stage, so the exploded table is ~n_tokens compact rows per doc."""
    # token array bound once per row (text.bind1): an outer tokens()
    # chain referenced from the window lambda would re-tokenize per
    # window, not per doc
    wins = bind1(
        tokens(normalize_text(text_col)),
        lambda toks: F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    return _ensure_parallelism(docs).select(
        F.col(id_col), F.posexplode(wins).alias("start", "whash")
    )


def substring_dup_spans(
    docs: DataFrame,
    k: int = 10,
    min_occurrences: int = 2,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated token spans, the exact-substring-dedup signal
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): any k-token window of the normalized text whose
    content occurs >= min_occurrences times corpus-wide (within- or
    cross-document) marks its occurrence as duplicated; overlapping and
    adjacent duplicated windows per document merge into maximal spans.

    keep_first=True spares the globally first occurrence of each window
    (ordered by (id, start)), so one copy of every passage survives a
    subsequent strip; False marks every occurrence.

    Returns (id, span_start, span_end, n_span_tokens) -- token
    positions 0-based, span_end exclusive.

    Scale shape: the dominant cost is ONE shuffle of the compact
    (id, start, hash) window table on the 8-byte hash -- partial
    count/min aggregation map-side, hot-window skew is AQE's standard
    split case.  The span merge is a per-document window function over
    only the duplicated occurrences (a small fraction of the corpus).
    Hash collisions (2^-64-scale) could merge unrelated windows; at
    oracle scales none occur, and a production paranoid mode would
    re-verify pairs against the window text.
    """
    occ = _window_occurrences(docs, k, id_col, text_col)
    grp = occ.groupBy("whash").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("first_occ"),
    )
    marked = occ.join(
        grp.filter(F.col("n_occ") >= int(min_occurrences)), "whash"
    )
    if keep_first:
        marked = marked.filter(
            F.struct(F.col(id_col), F.col("start")) != F.col("first_occ")
        )

    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max(F.col("start") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max_end.isNull() | (F.col("start") > prev_max_end), 1
    ).otherwise(0)
    return (
        marked.select(F.col(id_col), F.col("start"))
        .withColumn("__island", F.sum(brk).over(w))
        .groupBy(id_col, "__island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + k).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("n_span_tokens"),
        )
    )


def substring_strip(
    docs: DataFrame,
    k: int = 10,
    min_occurrences: int = 2,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply substring_dup_spans: remove every token inside a duplicated
    span, keeping (with keep_first=True) the corpus-first copy of each
    passage.  Output text is the NORMALIZED text (lowercased, collapsed
    whitespace) minus the spans -- the same basis the spans were
    computed on.

    Returns one row per input doc: (id, text_clean, n_tokens,
    n_removed).

    Scale shape: spans per doc are few and short -> collect_list per doc
    is bounded; the docs<->spans join is a standard shuffle join on the
    doc key, and token filtering is a codegen higher-order filter (no
    UDF).  Two scans of the corpus (window pass + strip pass) -- scan
    cost is linear and parquet-pruned to (id, text); caching the token
    arrays would trade memory for the second scan at deployment."""
    spans = substring_dup_spans(
        docs, k=k, min_occurrences=min_occurrences, keep_first=keep_first,
        id_col=id_col, text_col=text_col,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    base = _ensure_parallelism(docs).select(
        F.col(id_col), tokens(normalize_text(text_col)).alias("__toks")
    )
    joined = base.join(per_doc, id_col, "left")
    spans_arr = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    pairs = F.transform(
        F.col("__toks"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        pairs,
        lambda x: ~F.exists(
            spans_arr,
            lambda s: (x["i"] >= s["span_start"]) & (x["i"] < s["span_end"]),
        ),
    )
    # null text -> null output (concat_ws would otherwise fold the null
    # token array to ''); counters are null-propagating already
    clean = F.when(
        F.col("__toks").isNotNull(),
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])),
    )
    return joined.select(
        F.col(id_col),
        clean.alias("text_clean"),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def soft_dedup_weights(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Soft deduplication (the SoftDeDup idea: reweight, don't drop):
    every document keeps its row but gets sampling weight
    1 / |exact-duplicate cluster|, so a training sampler sees each
    distinct CONTENT with equal total mass while retaining every copy's
    metadata -- gentler than hard dedup when duplicates carry signal
    (popularity, provenance).

    Clusters are md5 digests of whitespace-normalized text (the
    exact_dedup convention); the count is a window over the digest, so
    the shuffle moves 16-byte keys and the payload never moves twice.
    Returns (id, content_hash, cluster_size, weight).
    """
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(_c(text_col)), r"\s+", " "))
    digest = F.md5(norm)
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col), digest.alias("content_hash"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn(
            "weight", F.round(F.lit(1.0) / F.col("cluster_size").cast("double"), 6)
        )
    )
