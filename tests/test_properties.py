"""Property-based tests (hypothesis): the scalar expression layer vs an
independent Python model of the reference semantics, over adversarial
generated strings.  One Spark job per property (the whole sample batch
goes through a single DataFrame) keeps runtime in seconds."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark import expressions as E

# printable-ish strings incl. whitespace padding, digits, hyphens, nan spellings
S = st.one_of(
    st.none(),
    st.sampled_from(["nan", "NaN", " nan ", "", "  ", "123.0", "x-y-z", "-"]),
    st.text(alphabet="abcXYZ019 .-_\t\xa0\u2009", max_size=12),
)

SETTINGS = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _model_strip_decimal(v):
    if v is None:
        return None
    return re.sub(r"\.0$", "", v.strip())


@SETTINGS
@given(st.lists(S, min_size=1, max_size=25))
def test_strip_decimal_str_model(spark, vals):
    df = spark.createDataFrame([Row(i=i, c=v) for i, v in enumerate(vals)], "i long, c string")
    got = {r.i: r.o for r in df.select("i", E.strip_decimal_str("c").alias("o")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == _model_strip_decimal(v), (i, v)


def _model_concat_key(a, b, sep="-"):
    if a is None or b is None:
        return None
    return a.strip() + sep + b.strip()


@SETTINGS
@given(st.lists(st.tuples(S, S), min_size=1, max_size=25))
def test_concat_key_model(spark, pairs):
    df = spark.createDataFrame(
        [Row(i=i, a=a, b=b) for i, (a, b) in enumerate(pairs)], "i long, a string, b string"
    )
    got = {
        r.i: r.o
        for r in df.select(
            "i", E.concat_key(E.ensure_string("a"), E.ensure_string("b")).alias("o")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == _model_concat_key(a, b), (i, a, b)


def _model_split_first(v, delim="-"):
    if v is None:
        return None, ""
    pos = v.find(delim)
    if pos < 0:
        return v.strip(), ""
    return v[:pos].strip(), v[pos + 1 :].strip()


@SETTINGS
@given(st.lists(S, min_size=1, max_size=25))
def test_split_first_model(spark, vals):
    df = spark.createDataFrame([Row(i=i, c=v) for i, v in enumerate(vals)], "i long, c string")
    head, tail = E.split_first("c")
    got = {r.i: (r.h, r.t) for r in df.select("i", head.alias("h"), tail.alias("t")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == _model_split_first(v), (i, v)


def _model_blankish(v):
    return v is None or v.strip() in ("", "nan", "NaN")


@SETTINGS
@given(st.lists(S, min_size=1, max_size=25))
def test_null_blank_default_model(spark, vals):
    df = spark.createDataFrame(
        [Row(i=i, code=v, desc="keep") for i, v in enumerate(vals)],
        "i long, code string, desc string",
    )
    code, desc = E.null_blank_default("code", "desc")
    got = {r.i: (r.c, r.d) for r in df.select("i", code.alias("c"), desc.alias("d")).collect()}
    for i, v in enumerate(vals):
        expect = ("INT", "Internal") if _model_blankish(v) else (v, "keep")
        assert got[i] == expect, (i, v)


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from("kml"), st.sampled_from("ABCD")),
                min_size=1, max_size=30))
def test_mode_agg_matches_pandas_mode(spark, pairs):
    """mode_agg == pandas groupby mode with .iat[0] (sorted -> lexicographic
    min on ties), the reference's exact tie rule."""
    import pandas as pd

    from uofi_payroll_etl_main_spark.aggregates import mode_agg

    df = spark.createDataFrame([Row(k=k, v=v) for k, v in pairs], "k string, v string")
    got = {r.k: r.v for r in mode_agg(df, "k", "v").collect()}
    pdf = pd.DataFrame(pairs, columns=["k", "v"])
    expect = pdf.groupby("k")["v"].agg(lambda s: s.mode().iat[0]).to_dict()
    assert got == expect


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from("xy"), st.integers(0, 99)),
                min_size=1, max_size=30))
def test_keep_first_matches_pandas_drop_duplicates(spark, rows_in):
    import pandas as pd

    from uofi_payroll_etl_main_spark.dedup import keep_first

    data = [Row(k=k, payload=p, ord=i) for i, (k, p) in enumerate(rows_in)]
    df = spark.createDataFrame(data, "k string, payload long, ord long")
    got = sorted((r.k, r.payload) for r in keep_first(df, ["k"], "ord").collect())
    pdf = pd.DataFrame([(d.k, d.payload) for d in data], columns=["k", "payload"])
    expect = sorted(map(tuple, pdf.drop_duplicates(subset="k", keep="first").values))
    assert got == expect


def _model_split(k, train=80, val=10):
    b = k % 100
    return "train" if b < train else ("val" if b < train + val else "test")


@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True))
def test_split_assign_model(spark, keys):
    from uofi_payroll_etl_main_spark.llm.curation import split_assign

    df = spark.createDataFrame([Row(k=k) for k in keys], "k long")
    got = {r.k: r.split for r in split_assign(df, "k").collect()}
    assert got == {k: _model_split(k) for k in keys}


@SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True),
    st.integers(min_value=0, max_value=100),
)
def test_stratified_sample_is_subset_and_model_exact(spark, keys, pct):
    from uofi_payroll_etl_main_spark.llm.curation import stratified_sample

    df = spark.createDataFrame([Row(doc_id=k, lang="en") for k in keys], "doc_id long, lang string")
    kept = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", {"en": pct}).collect()}
    assert kept == {k for k in keys if k % 100 < pct}


def _model_norm_tokens(text):
    if text is None:
        return []
    t = re.sub(r"\s+", " ", text.lower()).strip()
    return t.split(" ") if t else []


TXT = st.one_of(
    st.none(),
    st.sampled_from(["", "  ", "a a a", "the the", "x"]),
    st.text(alphabet="abc THE.\t\n", max_size=30),
)


@SETTINGS
@given(st.lists(TXT, min_size=1, max_size=15))
def test_top_ngrams_matches_python_model(spark, texts):
    from collections import Counter

    from uofi_payroll_etl_main_spark.llm.text import top_ngrams

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.ngram, r.cnt) for r in top_ngrams(df, n=2, k=50).collect()]
    c = Counter()
    for t in texts:
        toks = _model_norm_tokens(t)
        for i in range(len(toks) - 1):
            c[toks[i] + " " + toks[i + 1]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == want, (got, want)


@SETTINGS
@given(st.lists(TXT, min_size=1, max_size=12))
def test_tfidf_matches_python_model(spark, texts):
    import math
    from collections import Counter

    from uofi_payroll_etl_main_spark.llm.text import tfidf_topk

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.term): (r.tf, r.tfidf, r.rank)
        for r in tfidf_topk(df, k=2).collect()
    }
    n = len(texts)
    docs = {i: Counter(_model_norm_tokens(t)) for i, t in enumerate(texts)}
    dfreq = Counter()
    for c in docs.values():
        dfreq.update(c.keys())
    want = {}
    for i, c in docs.items():
        scored = sorted(
            (
                (term, tf, round(tf * (math.log((n + 1.0) / (dfreq[term] + 1.0)) + 1.0), 6))
                for term, tf in c.items()
            ),
            key=lambda x: (-x[2], x[0]),
        )[:2]
        for rank, (term, tf, s) in enumerate(scored, 1):
            want[(i, term)] = (tf, s, rank)
    assert got == want, (got, want)


# ---- round-2 curation ops vs independent Python models ----------------

WORDS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "x"]), min_size=0, max_size=24
)


def _model_rep_frac(tokens, n):
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    if not grams:
        return 0.0
    from collections import Counter

    c = Counter(grams)
    tot = sum(len(g) * k for g, k in c.items())
    dup = sum(len(g) * k for g, k in c.items() if k > 1)
    return dup / tot


@SETTINGS
@given(st.lists(WORDS, min_size=1, max_size=8))
def test_repetition_signals_model(spark, docs):
    from uofi_payroll_etl_main_spark.llm.text import repetition_signals

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    for i, ws in enumerate(docs):
        assert abs(got[i]["rep_2gram_frac"] - _model_rep_frac(ws, 2)) < 1e-12, (i, ws)
        assert abs(got[i]["rep_3gram_frac"] - _model_rep_frac(ws, 3)) < 1e-12, (i, ws)


def _model_dedup_lines(docs, max_occ):
    """docs: list of line-lists. Returns per-doc (kept_lines, n, dropped)."""
    from collections import Counter

    c = Counter(line for ls in docs for line in ls)
    first = {}
    for d, ls in enumerate(docs):
        for j, line in enumerate(ls):
            first.setdefault(line, (d, j))
    out = []
    for d, ls in enumerate(docs):
        kept = [
            line
            for j, line in enumerate(ls)
            if c[line] <= max_occ or first[line] == (d, j)
        ]
        out.append(("\n".join(kept), len(ls), len(ls) - len(kept)))
    return out


@SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(["l1", "l2", "l3", "u"]), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_dedup_lines_model(spark, docs, max_occ):
    from uofi_payroll_etl_main_spark.llm.curation import dedup_lines

    df = spark.createDataFrame(
        [Row(doc_id=i, text="\n".join(ls)) for i, ls in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_lines(df, max_occurrences=max_occ).collect()}
    for i, (text, n, dropped) in enumerate(_model_dedup_lines(docs, max_occ)):
        assert got[i]["text"] == text, (i, docs)
        assert got[i]["n_lines"] == n and got[i]["n_dropped"] == dropped, (i, docs)


HEAVY = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@HEAVY
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
                unique=True))
def test_shuffle_index_model(spark, keys):
    """shuffle_index == the single-window md5 model, for arbitrary key
    sets (permutation 0..n-1, engine-independent order)."""
    import hashlib

    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.llm.curation import shuffle_index

    df = spark.createDataFrame([Row(doc_id=k) for k in keys], "doc_id long")
    got = {r.doc_id: r.shuffle_pos for r in shuffle_index(df, "doc_id").collect()}
    order = sorted(keys, key=lambda k: (hashlib.md5(f"{k}|0".encode()).hexdigest(), k))
    assert got == {k: i for i, k in enumerate(order)}


@HEAVY
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60))
def test_cms_never_undercounts(spark, vals):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.aggregates import cms_build, cms_estimate

    df = spark.createDataFrame([Row(k=str(v)) for v in vals], "k string")
    cms = cms_build(df, "k", hex_chars=1, depth=3)  # 16 cells
    est = {r.k: r.est for r in cms_estimate(
        cms, df.dropDuplicates(), "k", hex_chars=1, depth=3).collect()}
    from collections import Counter

    for k, n in Counter(str(v) for v in vals).items():
        assert est[k] >= n


@HEAVY
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30,
                unique=True))
def test_bloom_never_drops_a_true_key(spark, keys):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.joins import bloom_semi_join

    kdf = spark.createDataFrame([Row(kk=k) for k in keys], "kk long")
    fact = spark.createDataFrame([Row(k=k) for k in keys], "k long")
    got = sorted(r.k for r in bloom_semi_join(
        fact, kdf, {"k": "kk"}, num_bits=512, num_hashes=3).collect())
    assert got == sorted(keys)


@HEAVY
@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=2, max_size=40))
def test_winsorize_idempotent_and_bounded(spark, vals):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.aggregates import winsorize

    df = spark.createDataFrame([Row(g="a", v=float(v)) for v in vals], "g string, v double")
    once = winsorize(df, "g", "v", 0.1, 0.9, "w1")
    lo, hi = min(r.w1 for r in once.collect()), max(r.w1 for r in once.collect())
    # clipped values never exceed the clip bounds themselves
    twice = winsorize(once.select("g", F.col("w1").alias("v")), "g", "v", 0.0, 1.0, "w2")
    for r in twice.collect():
        assert lo - 1e-9 <= r.w2 <= hi + 1e-9


# ---------------------------------------------------------------------------
# Round-5 operators vs independent Python models, over generated inputs
# ---------------------------------------------------------------------------

WORDS = st.lists(
    st.sampled_from(["low", "lower", "newest", "widest", "the", "a", "ab",
                     "abc", "zz", "banana", "bandana"]),
    min_size=1, max_size=40,
)


@SETTINGS
@given(st.lists(WORDS, min_size=1, max_size=5), st.integers(min_value=1, max_value=8))
def test_bpe_train_matches_reference(spark, docs_words, n_merges):
    from collections import Counter

    from tests.test_llm_ops import TestBpeTrain
    from uofi_payroll_etl_main_spark.llm.text import bpe_train

    texts = [" ".join(ws) for ws in docs_words]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wc = Counter(w for t in texts for w in t.split())
    exp_merges, exp_vocab = TestBpeTrain._reference_bpe(dict(wc), n_merges)
    got_merges, got_words = bpe_train(df, n_merges=n_merges)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in got_merges
    ] == exp_merges
    got_vocab = {r["w"]: list(r["symbols"]) for r in got_words.collect()}
    assert got_vocab == exp_vocab


@SETTINGS
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=7),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=7),
    st.sampled_from([1, 3, 4]),
    st.randoms(use_true_random=False),
)
def test_png_decode_inverts_any_filter_sequence(w, h, filters, nch, rnd):
    import numpy as np

    from tests.test_multimodal import _png_forward_filter
    from uofi_payroll_etl_main_spark.llm.multimodal import decode_media

    px = np.array(
        [rnd.randrange(256) for _ in range(h * w * nch)], dtype=np.uint8
    ).reshape(h, w, nch)
    payload = _png_forward_filter(px, filters=filters, nch=nch)
    got = decode_media(payload, "image")["pixels"]
    if nch == 1:
        assert np.array_equal(got, np.repeat(px, 3, axis=2))
    elif nch == 4:
        assert np.array_equal(got, px[:, :, :3])
    else:
        assert np.array_equal(got, px)


URLY = st.builds(
    lambda scheme, www, host, port, path, q, frag: f"{scheme}://{www}{host}{port}{path}{q}{frag}",
    st.sampled_from(["http", "https", "HTTPS"]),
    st.sampled_from(["", "www.", "WWW."]),
    st.sampled_from(["example.com", "Sub.Example.COM", "a.b.co"]),
    st.sampled_from(["", ":443", ":80", ":8080"]),
    st.sampled_from(["", "/", "/P/1/", "/p"]),
    st.sampled_from(["", "?id=1", "?utm_source=x", "?href=a&ref=b", "?xref=c&utm_a=d&id=2",
                     "?ref=x&href=y", "?utm_a=1&utm_b=2"]),
    st.sampled_from(["", "#f", "#Sec"]),
)


def _py_normalize_url(u: str) -> str:
    """Independent reference canonicalizer (urllib-free, mirrors the
    documented contract, not the implementation's regex chain)."""
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", u)
    scheme, auth, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
    if auth.startswith("www."):
        auth = auth[4:]
    auth = _re.sub(r":(443|80)$", "", auth)
    rest = rest.split("#", 1)[0]
    path, sep, query = rest.partition("?")
    path = path.rstrip("/")
    if sep:
        params = [p for p in query.split("&") if p]
        kept = [
            p for p in params
            if not _re.match(r"(?i)^(utm_[a-z]+|gclid|fbclid|ref)=", p)
        ]
        query = ("?" + "&".join(kept)) if kept else ""
    return f"{scheme}://{auth}{path}{query}"


@SETTINGS
@given(st.lists(URLY, min_size=1, max_size=30))
def test_normalize_url_matches_independent_model(spark, urls):
    from uofi_payroll_etl_main_spark.llm.web import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "x string")
    got = [r[0] for r in df.select(normalize_url(F.col("x"))).collect()]
    assert got == [_py_normalize_url(u) for u in urls]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 5),
                  st.floats(-10, 10, allow_nan=False)),
        min_size=1, max_size=60,
    )
)
def test_skew_agg_equals_plain_groupby(spark, rows):
    """skew_agg == plain groupBy on random multisets (exactness of the
    salted two-phase rewrite is a property, not a fixture)."""
    from uofi_payroll_etl_main_spark.aggregates import skew_agg

    df = spark.createDataFrame(
        [(k, m, round(v, 3)) for k, m, v in rows], "k string, m long, v double"
    )
    got = {
        r["k"]: (r["n_rows"], r["n_members"], round(r["total_value"] or 0, 6))
        for r in skew_agg(df, "k", "v", "m", salt_buckets=4).collect()
    }
    want = {
        r["k"]: (r["n"], r["d"], round(r["s"] or 0, 6))
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("m").cast("long").alias("d"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("s"),
        ).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.sampled_from(["hot", "warm", "t1", "t2", "t3", "t4", "t5"]),
             min_size=5, max_size=80),
    st.sampled_from([0.1, 0.25, 0.4]),
)
def test_heavy_hitters_equals_plain_filter(spark, keys, phi):
    """heavy_hitters == the plain groupBy + HAVING answer for any
    multiset and threshold (the MG candidate stage never loses a true
    heavy hitter)."""
    from uofi_payroll_etl_main_spark.aggregates import heavy_hitters

    df = spark.createDataFrame([(k,) for k in keys], "k string").repartition(4)
    got = {r["k"]: r["n_rows"] for r in
           heavy_hitters(df, "k", phi=phi, member_cap=32).collect()}
    n = len(keys)
    from collections import Counter
    want = {k: c for k, c in Counter(keys).items() if c > phi * n}
    assert got == want
