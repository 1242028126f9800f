"""Unigram-LM tokenizer: the trained table must equal an INDEPENDENT
pure-Python replica of the same algorithm (seed -> hard-EM -> prune),
and tokenization must be lossless.  This is the correctness anchor for
the rows-only llm_unigram_* gates."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from uofi_payroll_etl_main_spark.llm.unigram import (
    unigram_tokenize,
    unigram_train,
    viterbi_segment,
    word_counts,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "streaming streams stream fast",
    "the catalog of cats",
    "mat rat cat bat",
]


def _replica_viterbi(word, logp, unk=-100.0):
    """Independent DP: iterate split points ascending, strictly-greater
    replacement => keeps the SMALLEST j (longest final piece) on ties,
    matching the engine's documented tie-break."""
    n = len(word)
    max_len = max((len(p) for p in logp), default=1)
    best = [0.0] + [-math.inf] * n
    back = [None] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece, unk if i - j == 1 else None)
            if lp is None:
                continue
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
                back[i] = (j, piece)
    out = []
    i = n
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    return out[::-1]


def _replica_train(texts, vocab_size, n_iter, max_piece_len, min_count, seed_size):
    words = Counter()
    for t in texts:
        words.update(" ".join(t.lower().split()).split(" "))
    # seed: substrings weighted by word count; singles always kept
    freq = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for L in range(1, min(max_piece_len, len(w) - i) + 1):
                freq[w[i : i + L]] += c
    singles = {p: f for p, f in freq.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in freq.items() if len(p) > 1 and f >= min_count),
        key=lambda x: (-x[1], x[0]),
    )[:seed_size]
    seed = dict(multi) | singles
    total = sum(seed.values())
    logp = {p: math.log(f / total) for p, f in seed.items()}
    for _ in range(n_iter):
        got = Counter()
        for w, c in words.items():
            for piece in _replica_viterbi(w, logp):
                got[piece] += c
        survivors = {p for p in logp if p in got or len(p) == 1}
        tot = sum(got.get(p, 0) for p in survivors)
        logp = {p: math.log((got.get(p, 0) or 0.5) / tot) for p in survivors}
    singles_f = sorted(p for p in logp if len(p) == 1)
    multis_f = sorted(
        (p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p)
    )[: max(0, vocab_size - len(singles_f))]
    final = sorted(singles_f + multis_f, key=lambda p: (-logp[p], p))
    return {p: round(math.exp(logp[p]), 9) for p in final}


def test_trained_table_matches_python_replica(spark):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), ["doc_id", "text"]
    )
    params = dict(
        vocab_size=40, n_iter=3, max_piece_len=6, min_count=2, seed_size=100
    )
    got = {
        r.piece: r.prob
        for r in unigram_train(docs, **params).collect()
    }
    want = _replica_train(CORPUS, **params)
    assert got == want


def test_viterbi_roundtrip_lossless():
    logp = {"st": -1.0, "ream": -1.5, "s": -3.0, "t": -3.0, "r": -3.0,
            "e": -3.0, "a": -3.0, "m": -3.0, "stream": -2.0}
    for w in ["stream", "streams", "streamer", "xyz"]:
        assert "".join(viterbi_segment(w, logp)) == w


def test_viterbi_prefers_higher_probability_path():
    # 'ab'+'c' (=-3) beats 'a'+'b'+'c' (=-6) and 'abc' absent
    logp = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -2.0}
    assert viterbi_segment("abc", logp) == ["ab", "c"]
    # with a whole-word piece that wins, it is taken
    logp["abc"] = -0.5
    assert viterbi_segment("abc", logp) == ["abc"]


def test_tokenize_profile_and_partition_invariance(spark):
    docs = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    vocab = unigram_train(docs, vocab_size=40, n_iter=2, seed_size=100)
    out = {r.doc_id: r for r in unigram_tokenize(docs, vocab).collect()}
    assert len(out) == len(CORPUS)
    for i, text in enumerate(CORPUS):
        assert out[i].n_words == len(text.split())
        assert out[i].n_pieces >= out[i].n_words
        assert out[i].n_unk == 0  # char floor covers the training corpus
    # repartitioned input trains to the identical table (integer hard-EM)
    vocab2 = unigram_train(
        docs.repartition(7), vocab_size=40, n_iter=2, seed_size=100
    )
    assert sorted(map(tuple, vocab.collect())) == sorted(
        map(tuple, vocab2.collect())
    )


def test_word_counts(spark):
    docs = spark.createDataFrame([(1, "a b  a"), (2, " "), (3, "b")], ["doc_id", "text"])
    got = {r.word: r["count"] for r in word_counts(docs).collect()}
    assert got == {"a": 2, "b": 2}


def test_viterbi_profile_int_planted_merges(spark):
    """viterbi_profile_int: a corpus dominated by the bigram 'ab' makes
    'ab' a high-probability seed piece, so 'ababab' segments into 3
    pieces (not 6 chars); rare words fall back to char pieces; a
    blank doc yields the zero row; scores are negative integers."""
    from uofi_payroll_etl_main_spark.llm.unigram import viterbi_profile_int

    rows = [(i, "ababab abab ab") for i in range(20)]
    rows.append((100, "xq"))     # rare: 'xq' not a multi piece (freq 1 < 2)
    rows.append((101, "   "))    # blank
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in viterbi_profile_int(df).collect()}
    r0 = out[0]
    assert r0["n_words"] == 3
    # 'ababab' -> 3x 'ab' (or better), 'abab' -> 2, 'ab' -> 1 => <= 6 pieces
    assert r0["n_pieces"] <= 6, r0
    assert r0["score_scaled"] < 0
    assert out[100]["n_words"] == 1 and out[100]["n_pieces"] == 2
    assert out[101]["n_words"] == 0 and out[101]["score_scaled"] == 0


def test_viterbi_profile_int_string_ids_roundtrip(spark):
    """viterbi_profile_int derives the id field's type from the input
    schema (ADVICE r7: the old hardcoded 'id long' silently miscast
    non-long doc ids); string ids survive, and scores match the same
    corpus keyed by long ids."""
    from uofi_payroll_etl_main_spark.llm.unigram import viterbi_profile_int

    texts = [
        "the payroll report arrived",
        "the report the payroll the",
        "arrived arrived payroll report",
        "the the the report arrived",
    ]
    long_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    str_df = spark.createDataFrame(
        [("doc-%d" % i, t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    by_long = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["score_scaled"])
        for r in viterbi_profile_int(long_df).collect()
    }
    by_str = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["score_scaled"])
        for r in viterbi_profile_int(str_df).collect()
    }
    assert set(by_str) == {"doc-%d" % i for i in range(4)}
    assert all(by_str["doc-%d" % i] == by_long[i] for i in range(4))
