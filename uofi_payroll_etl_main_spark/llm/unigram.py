"""Unigram-LM tokenizer (SentencePiece-style, Kudo 2018) -- the
subword family's second member next to `text.bpe_train` (greedy-merge
BPE).  Trains piece probabilities by hard-EM (Viterbi counts) over the
WORD-COUNT table and tokenizes with the max-probability segmentation.

Why this shape at 100 TB:
  * All heavy lifting happens on the word-count aggregate -- ONE corpus
    scan builds (word, count); every EM iteration then touches only
    vocabulary-cardinality data (a web-scale corpus has ~10^7 distinct
    words vs 10^12 tokens), exactly how SentencePiece itself consumes
    pre-tokenized frequency tables.
  * The per-word segmentation lattice (forward DP) is inherently
    sequential per word -- the documented "built-ins genuinely can't
    express it" case -- so the E-step runs as an Arrow-batched
    mapInPandas over word rows with the current piece table broadcast
    (piece tables are vocab_size-bounded; at 10^6+ pieces swap the
    broadcast for a piece-keyed join of exploded word substrings).
  * Hard-EM (count pieces along the single best path) keeps every
    accumulated quantity an INTEGER (path-count x word-count), so the
    per-iteration groupBy-sum is exact and order-independent --
    deterministic across partitionings, unlike soft-EM float expected
    counts.  Tie-breaks in the DP are fixed (longer piece, then
    lexicographically smaller), so the trained table is reproducible
    bit-for-bit; tests/test_unigram.py holds it equal to a pure-Python
    replica.
  * Driver traffic per iteration: one vocab-bounded collect (the new
    piece counts) + one broadcast -- scalars-and-vocab only, never rows.

Not SQL-expressible (iterative lattice DP) -> registered rows-only;
exactness is pinned by the replica pytest instead of a DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import explode_nonempty, normalize_text, tokens

__all__ = ["word_counts", "unigram_train", "unigram_tokenize", "viterbi_segment"]


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over normalized whitespace words -- the single
    corpus scan everything else runs on."""
    t = explode_nonempty(df, [], tokens(normalize_text(text_col)), "word")
    return t.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("count"))


def viterbi_segment(word: str, logp: dict, max_len: int | None = None) -> list[str]:
    """Best segmentation of `word` under piece log-probs `logp`.

    DP over end positions; transitions limited to pieces present in the
    table.  Tie-break: prefer the LONGER final piece, then the
    lexicographically smaller one -- fixed, so training is
    deterministic.  Characters absent from the table fall back to a
    single-char <unk> piece with a large penalty (keeps every word
    segmentable, mirroring SentencePiece's character coverage floor).
    """
    n = len(word)
    UNK = -100.0
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    if max_len is None:
        max_len = max((len(p) for p in logp), default=1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = UNK
                else:
                    continue
            cand = best[j] + lp
            if cand > best[i] or (
                cand == best[i]
                and back[i] is not None
                and (
                    j < back[i][0]
                    or (j == back[i][0] and piece < back[i][1])
                )
            ):
                best[i] = cand
                back[i] = (j, piece)
    out: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    return out[::-1]


def _seed_pieces(
    words: DataFrame, max_piece_len: int, min_count: int, seed_size: int
) -> DataFrame:
    """Candidate pieces: all substrings up to max_piece_len weighted by
    word count (codegen flatten of an (i, L) index grid -- no UDF), top
    seed_size by weight plus EVERY single character (coverage floor)."""
    w = F.col("word")
    n = F.length(w)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(int(max_piece_len)), n - i + 1)
                ),
                lambda L: w.substr(i, L),
            ),
        )
    )
    ex = words.select(F.col("count"), F.explode(subs).alias("piece"))
    freq = ex.groupBy("piece").agg(F.sum("count").alias("freq"))
    singles = freq.filter(F.length("piece") == 1)
    multi = (
        freq.filter(
            (F.length("piece") > 1) & (F.col("freq") >= int(min_count))
        )
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(int(seed_size))
    )
    return singles.unionByName(multi)


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    n_iter: int = 3,
    max_piece_len: int = 8,
    min_count: int = 2,
    seed_size: int = 2000,
) -> DataFrame:
    """Train the unigram piece table by hard-EM.

    Each iteration: broadcast current log-probs -> Viterbi-segment every
    distinct word (Arrow batches) -> integer piece-count aggregate ->
    re-normalize on the driver (vocab-bounded).  Zero-count multi-char
    pieces are pruned each round; single chars always survive.  The
    final table keeps the top `vocab_size` pieces by (prob, piece asc)
    with single chars exempt from the cut.

    Returns (piece, n_chars, prob DOUBLE rounded 9, rank) -- rank 1 =
    most probable, ties broken by piece ascending.
    """
    spark = df.sparkSession
    words = word_counts(df, text_col).persist()
    seed = _seed_pieces(words, max_piece_len, min_count, seed_size)
    rows = seed.collect()  # vocab-bounded by construction
    total = sum(r.freq for r in rows) or 1
    logp = {r.piece: math.log(r.freq / total) for r in rows}

    for _ in range(int(n_iter)):
        bc = spark.sparkContext.broadcast(logp)

        def estep(batches, _bc=bc):
            import pandas as pd

            lp = _bc.value
            ml = max((len(p) for p in lp), default=1)
            for pdf in batches:
                acc: dict[str, int] = {}
                for word, cnt in zip(pdf["word"], pdf["count"]):
                    for piece in viterbi_segment(word, lp, ml):
                        acc[piece] = acc.get(piece, 0) + int(cnt)
                if acc:
                    yield pd.DataFrame(
                        {"piece": list(acc), "c": list(acc.values())}
                    )

        counts = (
            words.mapInPandas(estep, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        got = {r.piece: r.c for r in counts}
        # prune zero-count multi-char pieces; keep the char floor
        survivors = {
            p for p in logp if p in got or len(p) == 1
        }
        tot = sum(got.get(p, 0) for p in survivors)
        # unseen single chars keep a 0.5 pseudo-count so log stays finite
        logp = {
            p: math.log((got.get(p, 0) or 0.5) / tot) for p in survivors
        }
        bc.destroy()

    # final prune to vocab_size (singles exempt -- coverage floor)
    singles = sorted(p for p in logp if len(p) == 1)
    multis = sorted(
        (p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p)
    )[: max(0, int(vocab_size) - len(singles))]
    final = singles + multis
    ordered = sorted(final, key=lambda p: (-logp[p], p))
    out = [
        (p, len(p), round(math.exp(logp[p]), 9), i + 1)
        for i, p in enumerate(ordered)
    ]
    words.unpersist()
    return spark.createDataFrame(
        out, "piece string, n_chars int, prob double, rank long"
    )


def unigram_tokenize(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-tokenize each document with a trained piece table.

    The vocab frame (piece, prob) is vocab-bounded -> collected once and
    broadcast; documents stream through Arrow batches, each word
    segmented by the same DP as training (lossless: pieces concatenate
    back to the word).  Output: (id, n_words, n_pieces, n_unk,
    pieces_per_word DOUBLE) -- the fertility profile a tokenizer
    evaluation needs.
    """
    spark = df.sparkSession
    rows = vocab.select("piece", "prob").collect()
    logp = {r.piece: math.log(r.prob) for r in rows if r.prob > 0}
    bc = spark.sparkContext.broadcast(logp)
    src = df.select(
        F.col(id_col), tokens(normalize_text(text_col)).alias("__w")
    )

    def seg(batches, _bc=bc):
        import pandas as pd

        lp = _bc.value
        ml = max((len(p) for p in lp), default=1)
        for pdf in batches:
            ids, nw, np_, nu = [], [], [], []
            for did, ws in zip(pdf.iloc[:, 0], pdf["__w"]):
                pieces: list[str] = []
                for w in ws:
                    pieces.extend(viterbi_segment(w, lp, ml))
                ids.append(did)
                nw.append(len(ws))
                np_.append(len(pieces))
                nu.append(sum(1 for p in pieces if p not in lp))
            yield pd.DataFrame(
                {"id": ids, "n_words": nw, "n_pieces": np_, "n_unk": nu}
            )

    out = src.mapInPandas(
        seg, "id long, n_words long, n_pieces long, n_unk long"
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_words",
        "n_pieces",
        "n_unk",
        F.round(
            F.when(F.col("n_words") > 0, F.col("n_pieces") / F.col("n_words"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("pieces_per_word"),
    )


def viterbi_profile_int(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """VALUE-CHECKED Viterbi segmentation twin: tokenize every word
    with the max-probability DP under the deterministic SEED piece
    table (no EM), with log-probs FLOOR-QUANTIZED to integers
    (floor(ln(freq/total) * 1e9)) so the whole DP is integer
    arithmetic -- the DuckDB oracle replays vocab, quantization, and
    the DP itself (list-state recursive CTE, candidates precomputed by
    a substr equi-join) bit-for-bit.  Tie-breaks: max score, then the
    LONGER final piece (same rule as viterbi_segment).  The seed's
    single-char coverage floor guarantees segmentability, so no <unk>
    lane is needed.  The EM-trained tiers (unigram_train/tokenize)
    stay rows-only with replica pytests; this twin certifies the
    Viterbi algebra itself.

    Returns (doc_id, n_words, n_pieces, score_scaled) -- score_scaled
    is the summed best path score in 1e-9 log units (an exact BIGINT,
    a stronger check than piece counts alone).
    """
    import math as _math

    spark = df.sparkSession
    words = word_counts(df, text_col)
    seed = _seed_pieces(words, max_piece_len=8, min_count=2, seed_size=300)
    rows = seed.collect()  # vocab-bounded
    total = sum(r.freq for r in rows) or 1
    ll = {
        r.piece: _math.floor(_math.log(r.freq / total) * 1_000_000_000)
        for r in rows
    }
    max_len = max((len(p) for p in ll), default=1)
    bc = spark.sparkContext.broadcast(ll)

    # derive the id field's real type instead of hardcoding long: a
    # string/int doc id would otherwise be silently miscast by the
    # mapInPandas output schema (same discipline as heavy_hitters)
    id_type = dict(df.dtypes)[id_col]
    src = df.select(F.col(id_col), tokens(normalize_text(text_col)).alias("__w"))

    def seg(batches, _bc=bc):
        import pandas as pd

        lp = _bc.value
        cache: dict[str, tuple[int, int]] = {}

        def run_word(w: str) -> tuple[int, int]:
            got = cache.get(w)
            if got is not None:
                return got
            n = len(w)
            best = [0] + [None] * n
            np_ = [0] + [None] * n
            for i in range(1, n + 1):
                opts = []
                for L in range(1, min(max_len, i) + 1):
                    p = w[i - L : i]
                    sc = lp.get(p)
                    if sc is not None and best[i - L] is not None:
                        # (-score, start_j): max score, tie -> smaller j
                        opts.append((-(best[i - L] + sc), i - L))
                neg, j = min(opts)
                best[i] = -neg
                np_[i] = np_[j] + 1
            cache[w] = (best[n], np_[n])
            return cache[w]

        for pdf in batches:
            ids, nw, npieces, sc = [], [], [], []
            for did, ws in zip(pdf[id_col], pdf["__w"]):
                tot_np = tot_sc = 0
                for w in ws:
                    s, p = run_word(w)
                    tot_sc += s
                    tot_np += p
                ids.append(did)
                nw.append(len(ws))
                npieces.append(tot_np)
                sc.append(tot_sc)
            yield pd.DataFrame(
                {"id": ids, "n_words": nw, "n_pieces": npieces, "sc": sc}
            )

    out = src.mapInPandas(
        seg, f"id {id_type}, n_words long, n_pieces long, sc long"
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_words",
        "n_pieces",
        F.col("sc").alias("score_scaled"),
    )
