"""Web-curation operators (llm/web.py): HTML stripping, URL
canonicalization / dedup, domain stats, hashed-feature quality scoring.

Known-value checks against hand-computed expectations plus an
independent pure-Python model for the classifier (md5 hashing chain
recomputed outside Spark)."""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark.llm.web import (
    HASH_BUCKETS,
    domain_stats,
    normalize_url,
    quality_classify,
    strip_html,
    synth_url,
    url_dedup,
)

from tests.conftest import rows


def _one(spark, value, expr):
    return (
        spark.createDataFrame([(value,)], "x string").select(expr.alias("y")).head()[0]
    )


class TestStripHtml:
    def test_tags_and_entities(self, spark):
        html = (
            '<html><head><script src="a.js">if (1 < 2) { x(); }</script>'
            "<style>.c { font-weight: bold; }</style></head>"
            "<!-- note --><body><h1>Title</h1><p>A &amp; B &lt;tag&gt; "
            "&quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"
        )
        got = _one(spark, html, strip_html(F.col("x")))
        assert got == "Title A & B <tag> \"q\" 's' end"

    def test_amp_decodes_once(self, spark):
        # literal '&amp;lt;' is a single-escaped '&lt;' -- one decode pass
        got = _one(spark, "a &amp;lt; b", strip_html(F.col("x")))
        assert got == "a &lt; b"

    def test_whitespace_collapse(self, spark):
        got = _one(spark, "<p>a</p>\n\n  <p>b</p>", strip_html(F.col("x")))
        assert got == "a b"

    def test_plain_text_unchanged(self, spark):
        got = _one(spark, "no markup here", strip_html(F.col("x")))
        assert got == "no markup here"


class TestNormalizeUrl:
    CASES = [
        # (raw, canonical)
        ("HTTPS://WWW.Example.COM:443/A/1/", "https://example.com/A/1"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("https://example.com:8080/x", "https://example.com:8080/x"),
        ("https://example.com/p?utm_source=a&id=3", "https://example.com/p?id=3"),
        ("https://example.com/p?id=3&utm_medium=m", "https://example.com/p?id=3"),
        ("https://example.com/p?utm_source=a", "https://example.com/p"),
        ("https://example.com/p#frag", "https://example.com/p"),
        ("https://example.com/p/?ref=tw&a=1&gclid=z", "https://example.com/p?a=1"),
        ("https://sub.example.com/CaseKept", "https://sub.example.com/CaseKept"),
        ("https://example.com", "https://example.com"),
        # params whose name CONTAINS a tracking name must survive:
        # `ref` must not match inside `href=` / `xref=` (boundary anchor)
        ("https://example.com/p?href=abc&id=2", "https://example.com/p?href=abc&id=2"),
        ("https://example.com/p?xref=abc&ref=tw", "https://example.com/p?xref=abc"),
        ("https://example.com/p?href=h&utm_source=n&id=3", "https://example.com/p?href=h&id=3"),
    ]

    def test_known_cases(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "x string")
        got = [r[0] for r in df.select(normalize_url(F.col("x"))).collect()]
        assert got == [want for _, want in self.CASES]


class TestUrlDedup:
    def test_collisions_and_keeper(self, spark):
        data = [
            (1, "https://A.com/p?utm_source=x&id=1"),
            (2, "HTTP://a.com:80/p/?id=1#f"),  # same canonical as 1 (but http)
            (3, "https://a.com/p?id=1"),  # same as 1
            (4, "https://b.com/q"),
        ]
        df = spark.createDataFrame(data, "doc_id long, url string")
        got = rows(url_dedup(df))
        assert got == [
            ("http://a.com/p?id=1", 2, 1),
            ("https://a.com/p?id=1", 1, 2),
            ("https://b.com/q", 4, 1),
        ]

    def test_synth_has_real_collisions(self, spark, sf_dir):
        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("url", synth_url())
        )
        out = url_dedup(d)
        n_docs = d.count()
        agg = out.agg(
            F.sum("n_dups").alias("s"), F.max("n_dups").alias("m")
        ).head()
        assert agg["s"] == n_docs  # partition of the corpus
        assert agg["m"] >= 2  # the gate actually exercises merging

    def test_domain_stats_blocklist(self, spark, sf_dir):
        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("url", synth_url())
        )
        out = domain_stats(d, blocklist=["src0.com", "src7.com"]).collect()
        domains = {r["domain"] for r in out}
        assert "src0.com" not in domains and "src7.com" not in domains
        assert len(domains) == 18  # 20 sources minus 2 blocked
        for r in out:
            assert r["n_docs"] >= r["n_urls"] >= 1


class TestNormalizeUrlProperties:
    def test_idempotent_on_generated_urls(self, spark):
        # deterministic sweep over the URL feature grid (scheme case,
        # www, port, trailing slash, tracking params, fragment) --
        # normalize(normalize(u)) must equal normalize(u)
        urls = []
        for scheme in ["https", "HTTPS", "http"]:
            for www in ["", "WWW.", "www."]:
                for port in ["", ":443", ":80", ":8080"]:
                    for tail in ["", "/", "/P/1/", "/p?id=1", "/p?utm_source=x", "/p?utm_source=x&id=2#f"]:
                        urls.append(f"{scheme}://{www}Example.com{port}{tail}")
        df = spark.createDataFrame([(u,) for u in urls], "x string")
        once = [r[0] for r in df.select(normalize_url(F.col("x")).alias("y")).collect()]
        df2 = spark.createDataFrame([(u,) for u in once], "x string")
        twice = [r[0] for r in df2.select(normalize_url(F.col("x")).alias("y")).collect()]
        assert once == twice

    def test_strip_html_idempotent_on_stripped(self, spark):
        html = "<p>A &amp; B</p> <div>c <b>d</b></div>"
        once = _one(spark, html, strip_html(F.col("x")))
        # a second pass over already-clean text must not alter it
        # (no tags or double-escaped entities remain)
        assert _one(spark, once, strip_html(F.col("x"))) == once


class TestRobotsFilter:
    def _run(self, spark, urls, rules):
        from uofi_payroll_etl_main_spark.llm.web import robots_filter

        udf = spark.createDataFrame(urls, "doc_id long, domain string, path string")
        rdf = spark.createDataFrame(rules, "domain string, prefix string, allow boolean")
        return {r["doc_id"]: r for r in robots_filter(udf, rdf).collect()}

    def test_longest_prefix_wins(self, spark):
        got = self._run(
            spark,
            [(1, "a.com", "/blog/post/7")],
            [("a.com", "/", False), ("a.com", "/blog/", True)],
        )
        assert got[1]["allowed"] is True
        assert got[1]["matched_prefix"] == "/blog/"

    def test_deny_beats_allow_on_tie(self, spark):
        got = self._run(
            spark,
            [(1, "a.com", "/x/1")],
            [("a.com", "/x/", True), ("a.com", "/x/", False)],
        )
        assert got[1]["allowed"] is False

    def test_no_rule_defaults_allow(self, spark):
        got = self._run(
            spark,
            [(1, "a.com", "/y"), (2, "other.com", "/x")],
            [("a.com", "/x", False)],
        )
        assert got[1]["allowed"] is True and got[1]["matched_prefix"] is None
        assert got[2]["allowed"] is True

    def test_rules_scoped_per_domain(self, spark):
        got = self._run(
            spark,
            [(1, "a.com", "/x/p"), (2, "b.com", "/x/p")],
            [("a.com", "/x", False), ("b.com", "/x", True)],
        )
        assert got[1]["allowed"] is False
        assert got[2]["allowed"] is True

    def test_duplicate_input_rows_preserved(self, spark):
        # exact-duplicate input rows must come out once EACH -- the
        # filter annotates, it never changes cardinality
        from uofi_payroll_etl_main_spark.llm.web import robots_filter

        udf = spark.createDataFrame(
            [(1, "a.com", "/x"), (1, "a.com", "/x"), (2, "a.com", "/y")],
            "doc_id long, domain string, path string",
        )
        rdf = spark.createDataFrame(
            [("a.com", "/x", False)], "domain string, prefix string, allow boolean"
        )
        out = robots_filter(udf, rdf)
        assert out.count() == 3
        assert out.filter("doc_id = 1").count() == 2
        assert out.columns == ["doc_id", "domain", "path", "allowed", "matched_prefix"]

    def test_rule_join_broadcasts(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import robots_filter

        udf = spark.createDataFrame(
            [(1, "a.com", "/x")], "doc_id long, domain string, path string"
        )
        rdf = spark.createDataFrame([("a.com", "/x", True)], "domain string, prefix string, allow boolean")
        plan = robots_filter(udf, rdf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def _py_margin(text: str) -> tuple[int, float]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    acc = 0.0
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        acc += (h % HASH_BUCKETS) % 997 / 997.0 - 0.5
    return len(toks), (acc / len(toks) if toks else 0.0)


class TestQualityClassifier:
    def test_matches_python_model(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "spark spark spark spark",
            "",
            "Mixed CASE tokens, with punctuation!  And  numbers 42.",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in quality_classify(df).collect()}
        for i, t in enumerate(texts):
            n, margin = _py_margin(t)
            assert got[i]["n_tokens"] == n
            assert math.isclose(got[i]["margin"], margin, rel_tol=0, abs_tol=1e-12)
            want_score = round(1.0 / (1.0 + math.exp(-4.0 * margin)), 6)
            assert math.isclose(got[i]["score"], want_score, abs_tol=1e-6)
            assert got[i]["keep"] == (margin >= 0)

    def test_pure_catalyst(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = quality_classify(d)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # one narrow projection, no shuffle


class TestVocabCoverage:
    def test_matches_python_model(self, spark):
        from collections import Counter

        from uofi_payroll_etl_main_spark.llm.text import vocab_coverage

        texts = ["a b b c", "b c  d", "", "a a a x"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = vocab_coverage(df, top_v=3).collect()
        cnt = Counter(t for s in texts for t in s.split())
        order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        total = sum(cnt.values())
        assert [(r["rank"], r["tok"], r["cnt"]) for r in got] == [
            (i + 1, t, c) for i, (t, c) in enumerate(order)
        ]
        run = 0
        for r, (t, c) in zip(got, order):
            run += c
            assert abs(r["cum_share"] - run / total) < 1e-12

    def test_topv_is_take_ordered(self, spark, sf_dir):
        from uofi_payroll_etl_main_spark.llm.text import vocab_coverage

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = vocab_coverage(d, top_v=500)._jdf.queryExecution().executedPlan().toString()
        # the V cut must be a distributed partial top-V, not a global sort
        assert "TakeOrderedAndProject" in plan


class TestTokenizeGreedy:
    def test_matches_python_model(self, spark):
        from uofi_payroll_etl_main_spark.llm.text import tokenize_greedy

        vocab = ["hel", "lo", "he", "l", "o", "wor", "ld", "spark"]
        vs = set(vocab)

        def model(text):
            words = text.lower().split()
            subs = unk = 0
            for w in words:
                pos = 0
                while pos < len(w):
                    for ln in range(min(12, len(w) - pos), 0, -1):
                        if w[pos:pos + ln] in vs:
                            subs += 1
                            pos += ln
                            break
                    else:
                        unk += 1
                        pos += 1
            return len(words), subs, unk

        texts = ["hello world", "SPARK sparkle", "zzz", "", "hel lo l o"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {r["doc_id"]: (r["n_words"], r["n_subwords"], r["n_unk"])
               for r in tokenize_greedy(df, vocab).collect()}
        for i, t in enumerate(texts):
            assert got[i] == model(t), (i, t)

    def test_greedy_prefers_longest(self, spark):
        from uofi_payroll_etl_main_spark.llm.text import tokenize_greedy

        # "hello" -> hel+lo (2 subwords), never he+l+lo
        df = spark.createDataFrame([(0, "hello")], "doc_id long, text string")
        r = tokenize_greedy(df, ["hel", "lo", "he", "l"]).head()
        assert (r["n_subwords"], r["n_unk"]) == (2, 0)

    def test_arrow_path_not_row_python(self, spark):
        from uofi_payroll_etl_main_spark.llm.text import tokenize_greedy

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = tokenize_greedy(df, ["x"])._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan  # Arrow MapInPandas, not per-row UDF


class TestTrainedClassifier:
    def _corpus(self, spark):
        # separable by vocabulary: 'good' docs share clean tokens,
        # 'spam' docs share junk tokens, plus shared filler words
        rows, label = [], {}
        good = "useful insight careful analysis thorough method result"
        spam = "buy cheap pills casino winner jackpot click"
        filler = "the and with from about"
        for i in range(40):
            t = f"{good} {filler} doc number {i % 7}"
            rows.append((i, t, 1.0))
        for i in range(40, 80):
            t = f"{spam} {filler} doc number {i % 7}"
            rows.append((i, t, 0.0))
        return spark.createDataFrame(rows, "doc_id long, text string, label double")

    def test_matches_numpy_closed_form(self, spark):
        import re as _re

        import numpy as np

        from uofi_payroll_etl_main_spark.llm.web import (
            _py_bucket,
            train_quality_classifier,
        )

        df = self._corpus(spark)
        D = 64
        got = np.array(train_quality_classifier(df, "label", n_buckets=D, l2=0.5))

        rows = df.collect()
        d1 = D + 1
        xtx, xty = np.zeros((d1, d1)), np.zeros(d1)
        for r in rows:
            toks = [t for t in _re.split(r"[^a-z0-9]+", r["text"].lower()) if t]
            x = np.zeros(d1)
            for t in toks:
                x[_py_bucket(t, D)] += 1.0
            x[:D] /= len(toks)
            x[D] = 1.0
            xtx += np.outer(x, x)
            xty += r["label"] * x
        reg = 0.5 * np.eye(d1)
        reg[D, D] = 0.0
        expect = np.linalg.solve(xtx + reg, xty)
        assert np.allclose(got, expect, atol=1e-8)

    def test_train_then_score_separates(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import (
            quality_classify_trained,
            train_quality_classifier,
        )

        df = self._corpus(spark)
        w = train_quality_classifier(df, "label", n_buckets=64, l2=0.5)
        scored = {r["doc_id"]: r for r in quality_classify_trained(df, w).collect()}
        # every good doc above threshold, every spam doc below
        for i in range(40):
            assert scored[i]["keep"] is True, scored[i]
        for i in range(40, 80):
            assert scored[i]["keep"] is False, scored[i]

    def test_training_deterministic(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import train_quality_classifier

        df = self._corpus(spark).repartition(8)
        w1 = train_quality_classifier(df, "label", n_buckets=32)
        w2 = train_quality_classifier(df, "label", n_buckets=32)
        assert w1 == w2

    def test_scorer_stays_single_projection(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import (
            quality_classify_trained,
            train_quality_classifier,
        )

        df = self._corpus(spark)
        w = train_quality_classifier(df, "label", n_buckets=32)
        plan = (
            quality_classify_trained(df, w)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # zero-shuffle scoring
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestParseRobots:
    BODY = (
        "# site policy\n"
        "User-agent: gptbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "User-agent: otherbot\n"
        "Allow: /docs\n"
        "Disallow: /private\n"
        "Disallow:\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /tmp\n"
    )

    def test_parse_star_groups_only(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import parse_robots

        df = spark.createDataFrame(
            [("example.com", self.BODY), ("empty.com", "# nothing here")],
            "domain string, robots_txt string",
        )
        rules = sorted(
            (r.domain, r.prefix, r.allow) for r in parse_robots(df).collect()
        )
        # gptbot group excluded; consecutive UA lines share one group;
        # empty Disallow dropped; both * groups contribute
        assert rules == [
            ("example.com", "/docs", True),
            ("example.com", "/private", False),
            ("example.com", "/tmp", False),
        ]

    def test_parse_feeds_filter_end_to_end(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import parse_robots, robots_filter

        rules = parse_robots(
            spark.createDataFrame(
                [("example.com", self.BODY)], "domain string, robots_txt string"
            )
        )
        urls = spark.createDataFrame(
            [("example.com", "/docs/page"), ("example.com", "/private/x"),
             ("example.com", "/other")],
            "domain string, path string",
        )
        out = {r.path: r.allowed for r in robots_filter(urls, rules).collect()}
        assert out == {"/docs/page": True, "/private/x": False, "/other": True}

    def test_case_insensitive_keys_and_crlf_tolerance(self, spark):
        from uofi_payroll_etl_main_spark.llm.web import parse_robots

        body = "USER-AGENT: *\nDISALLOW: /a\nallow: /a/b\n"
        rules = sorted(
            (r.prefix, r.allow)
            for r in parse_robots(
                spark.createDataFrame([("d", body)], "domain string, robots_txt string")
            ).collect()
        )
        assert rules == [("/a", False), ("/a/b", True)]
