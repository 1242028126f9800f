r"""Web-corpus curation: HTML stripping, URL normalization / dedup,
per-domain statistics, and a hashed-feature quality classifier.

These are the front half of a web-scale training-data pipeline
(CCNet / C4 / RefinedWeb shape): raw crawl records carry markup and
messy URLs; before any near-dedup or quality cut the corpus is
cleaned (strip tags), canonicalized (one URL spelling per resource),
URL-deduplicated (the cheapest dedup tier -- no text compare at all),
and scored by a linear classifier over hashed token features.

Beyond-reference extension (the reference, a payroll ETL at
/root/reference/etl_payroll_pipeline.py, has no web stage); the shapes
follow the public CCNet/C4 pipeline descriptions.

Scale design (100 TB):
  * Every expression here is pure Catalyst (regexp / array / higher-
    order functions) -- whole-stage-codegen'd, zero Python in the hot
    path, so strip/normalize/score run at parquet scan speed.
  * url_dedup and domain_stats shuffle ONLY the normalized-URL /
    domain key plus counters -- never document text.
  * The classifier needs no model file: feature hashing (md5 -> bucket)
    and a deterministic weight per bucket keep executors stateless.
    Swapping in trained weights is a broadcast of a D-row map.

Regex dialect note: every pattern used here is RE2-safe (no
backreferences, no lookaround) and replacement strings are empty or
literal, so the SAME pattern text runs identically on Spark (Java
regex) and the DuckDB oracle (RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strip_html",
    "synth_url",
    "normalize_url",
    "url_parts",
    "url_dedup",
    "domain_stats",
    "quality_classify",
    "train_quality_classifier",
    "quality_classify_trained",
    "robots_filter",
    "parse_robots",
    "TRACKING_PARAMS_RE",
    "TRACKING_PARAM_FULL_RE",
    "HASH_BUCKETS",
]

# Tracking query parameters dropped during URL canonicalization.  The
# full pattern anchors the name to a parameter boundary (`?` or `&`)
# and keeps the captured separator, so `ref` never matches inside a
# longer name such as `href=` or `xref=`.
TRACKING_PARAMS_RE = r"(utm_[a-z]+|gclid|fbclid|ref)"
TRACKING_PARAM_FULL_RE = r"([?&])" + TRACKING_PARAMS_RE + r"=[^&#]*"

# Feature-hash dimensionality for the quality classifier.
HASH_BUCKETS = 4096


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# HTML stripping
# ---------------------------------------------------------------------------

def strip_html(col: str | Column) -> Column:
    """Markup -> text: drop <script>/<style> blocks and comments whole,
    strip remaining tags, decode the six ubiquitous entities, collapse
    whitespace.  One projection, fully codegen'd.

    Entity order matters: named/numeric entities first, `&amp;` LAST so
    a literal `&amp;lt;` decodes once (to `&lt;`), not twice.
    """
    x = _c(col)
    x = F.regexp_replace(x, r"(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    x = F.regexp_replace(x, r"&nbsp;", " ")
    x = F.regexp_replace(x, r"&lt;", "<")
    x = F.regexp_replace(x, r"&gt;", ">")
    x = F.regexp_replace(x, r"&quot;", '"')
    x = F.regexp_replace(x, r"&#39;", "'")
    x = F.regexp_replace(x, r"&amp;", "&")
    x = F.trim(F.regexp_replace(x, r"\s+", " "))
    return x


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def synth_url(id_col: str | Column = "doc_id", src_col: str | Column = "source") -> Column:
    """Deterministic messy URL for gate/test inputs (the corpus tables
    carry no URL column): mixed-case scheme+host, default port, www
    prefix, trailing slash, tracking params, fragment -- every wrinkle
    normalize_url must erase, derived only from (doc_id, source)."""
    i = _c(id_col)
    s = _c(src_col)
    base = F.concat(
        F.lit("HTTPS://WWW.m"),
        (i % 2).cast("string"),
        F.lit("."),
        s,
        F.lit(".COM:443/A/"),
        (i % 10).cast("string"),
        F.lit("/"),
    )
    q = (
        F.when(
            i % 3 == 0,
            # `href=` is the adversarial case: a non-tracking param whose
            # name CONTAINS `ref` -- it must survive canonicalization.
            F.concat(
                F.lit("?href=h&utm_source=news&id="),
                (i % 20).cast("string"),
                F.lit("&utm_medium=m"),
            ),
        )
        .when(i % 3 == 1, F.concat(F.lit("?id="), (i % 20).cast("string")))
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 5 == 0, F.lit("#Sec2")).otherwise(F.lit(""))
    return F.concat(base, q, frag)


def url_parts(col: str | Column) -> dict[str, Column]:
    """Decompose a URL with anchored regexps (shared by normalize_url
    and the oracle SQL): scheme, host (lowercased, www./default-port
    stripped), path (no trailing slash), query (tracking params
    removed).  Returns named Column pieces."""
    u = _c(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(F.regexp_replace(auth, r"^www\.", ""), r":(443|80)$", "")
    # everything after the authority, fragment dropped
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    # drop tracking params (boundary-anchored, separator kept), then
    # tidy separators left behind
    query = F.regexp_replace(query, r"(?i)" + TRACKING_PARAM_FULL_RE, "$1")
    query = F.regexp_replace(query, r"\?&+", "?")
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"[?&]+$", "")
    root = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return {"scheme": scheme, "host": host, "path": path, "query": query, "root_domain": root}


def normalize_url(col: str | Column) -> Column:
    """Canonical URL spelling: lowercase scheme+host, no www., no
    default port, no fragment, no tracking params, no trailing slash.
    Path case is preserved (case-significant on real servers)."""
    p = url_parts(col)
    return F.concat(p["scheme"], F.lit("://"), p["host"], p["path"], p["query"])


def url_dedup(
    df: DataFrame, url_col: str | Column = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Cheapest dedup tier: one canonical document per normalized URL
    (keeper = min id).  Shuffles only (norm_url, id) -- no text moves.
    Returns (norm_url, keeper_id, n_dups)."""
    return (
        df.select(normalize_url(url_col).alias("norm_url"), F.col(id_col))
        .groupBy("norm_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str | Column = "url",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-registered-domain corpus profile after canonicalization:
    document count, distinct canonical URLs, total characters.  An
    optional domain blocklist is applied with an `isin` prune (a
    broadcast anti-join once the list outgrows a literal IN).

    Partial aggregation makes this one narrow shuffle of
    (domain, counters); the distinct-URL count piggybacks on the same
    exchange because norm_url is grouped with its own domain.
    """
    p = url_parts(url_col)
    base = df.select(
        p["root_domain"].alias("domain"),
        normalize_url(url_col).alias("norm_url"),
        F.col(id_col),
        F.col(chars_col),
    )
    if blocklist:
        base = base.filter(~F.col("domain").isin(list(blocklist)))
    per_url = base.groupBy("domain", "norm_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).alias("chars"),
    )
    return per_url.groupBy("domain").agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Robots-style path-prefix rule filter
# ---------------------------------------------------------------------------

def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Crawl-policy filter with robots.txt longest-match semantics:
    for each (domain, path), the matching rule with the LONGEST prefix
    wins; at equal length deny beats allow (the conservative
    convention); no matching rule means allowed.

    `rules` has columns (domain, prefix, allow).  Shape at scale: the
    rule table is small (a crawl policy) -> the domain equi-join
    broadcasts; the longest-match argmax is a groupBy max(struct)
    rather than a window, so it partial-aggregates map-side and the
    only full shuffle carries one struct per URL-rule match, never a
    per-key sort.

    Adds `allowed` (bool) and `matched_prefix` (null when no rule
    fired).
    """
    key_cols = [c for c in df.columns]
    # A synthesized per-row id keeps the argmax re-aggregation exactly
    # row-preserving: grouping on the input columns alone would collapse
    # exact-duplicate input rows, changing cardinality beyond the
    # allow/deny contract.
    rid = "__robots_row_id"
    df = df.withColumn(rid, F.monotonically_increasing_id())
    # rename the rule-side key: both frames may share lineage (rules
    # derived from the same table), which makes unqualified references
    # ambiguous under Spark 4's self-join resolution
    r = rules.select(
        F.col("domain").alias("__rule_domain"),
        F.col("prefix"),
        F.col("allow"),
    )
    matched = (
        df.join(
            F.broadcast(r),
            (F.col(domain_col) == F.col("__rule_domain"))
            & F.col(path_col).startswith(F.col("prefix")),
            "left",
        )
        .drop("__rule_domain")
        .groupBy(rid, *key_cols)
        .agg(
            F.max(
                F.when(
                    F.col("prefix").isNotNull(),
                    F.struct(
                        F.length("prefix").alias("l"),
                        (~F.col("allow")).alias("deny"),
                        F.col("prefix").alias("prefix"),
                    ),
                )
            ).alias("best")
        )
    )
    return matched.select(
        *key_cols,
        F.coalesce(~F.col("best.deny"), F.lit(True)).alias("allowed"),
        F.col("best.prefix").alias("matched_prefix"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

def _bucket(tok: Column) -> Column:
    """Stable feature hash: first 15 hex chars of md5 (60 bits, fits a
    signed long) -> bucket in [0, HASH_BUCKETS)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % HASH_BUCKETS


def _weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-0.5, 0.5): stands in for a
    trained vector so the classifier is runnable with zero model
    artifacts; replace with a broadcast lookup to deploy real weights."""
    return (bucket % 997).cast("double") / F.lit(997.0) - F.lit(0.5)


def quality_classify(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """fastText-style linear scorer: mean hashed-token weight as the
    margin, sigmoid for a probability, threshold at 0.  The whole chain
    (tokenize -> hash -> weight -> fold) is higher-order array algebra
    inside one projection: no explode, no shuffle, no Python.

    `margin` is exact IEEE arithmetic in token order (aggregate = left
    fold), so it is bit-identical across engines; `score` is rounded to
    6 digits because exp() may differ in the last ulp between libm
    implementations.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    wsum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + _weight(_bucket(t)),
    )
    n = F.size(toks)
    margin = F.when(n > 0, wsum / n.cast("double")).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        margin.alias("margin"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(4.0) * margin)), 6).alias("score"),
        (margin >= 0).alias("keep"),
    )


def _py_bucket(tok: str, n_buckets: int) -> int:
    """Python twin of _bucket (first 15 md5 hex chars mod n) -- used by
    the trainer's Arrow kernel so trained weights index the SAME
    feature space the Catalyst scorer hashes into."""
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 256,
    l2: float = 1.0,
) -> list[float]:
    """Closed-form ridge regression over mean-pooled hashed-token
    features: returns `n_buckets + 1` weights (last = intercept) that
    quality_classify(weights=...) consumes -- the "swap in trained
    weights" deployment path made real, no ML library needed.

    Distributed shape (the tree-aggregate-the-Gram-matrix pattern):
    each partition accumulates its local X'X (D+1 x D+1) and X'y in
    NumPy inside ONE mapInPandas pass and emits a single flattened
    partial row; the driver sums P partials (P x ~0.5 MB at D=256) and
    solves the (D+1) system.  The corpus is scanned once, nothing
    document-sized shuffles, and executor memory holds one D^2 block.
    D is the capacity/cost knob: the Gram partial is O(D^2) per
    partition, so raise D only with executor memory to match.

    Driver-side determinism: partials carry their partition id and sum
    in that order, so repeated runs add identical floats identically.
    """
    import re as _re

    import numpy as np
    import pandas as pd

    d1 = n_buckets + 1

    def gram(batches):
        xtx = np.zeros((d1, d1))
        xty = np.zeros(d1)
        pid = -1
        for pdf in batches:
            if not len(pdf):
                continue
            if pid < 0:
                pid = int(pdf["__pid"].iloc[0])
            for text, y in zip(pdf[text_col], pdf[label_col]):
                toks = [t for t in _re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
                x = np.zeros(d1)
                if toks:
                    for t in toks:
                        x[_py_bucket(t, n_buckets)] += 1.0
                    x[:n_buckets] /= len(toks)  # mean pooling
                x[n_buckets] = 1.0  # intercept
                xtx += np.outer(x, x)
                xty += float(y) * x
        yield pd.DataFrame(
            {"pid": [pid], "xtx": [xtx.ravel().tolist()], "xty": [xty.tolist()]}
        )

    partials = (
        df.select(
            F.col(text_col),
            F.col(label_col).cast("double").alias(label_col),
            F.spark_partition_id().alias("__pid"),
        )
        .mapInPandas(gram, schema="pid int, xtx array<double>, xty array<double>")
        .collect()
    )
    xtx = np.zeros((d1, d1))
    xty = np.zeros(d1)
    for r in sorted(partials, key=lambda r: r["pid"]):
        xtx += np.array(r["xtx"]).reshape(d1, d1)
        xty += np.array(r["xty"])
    reg = float(l2) * np.eye(d1)
    reg[n_buckets, n_buckets] = 0.0  # never shrink the intercept
    w = np.linalg.solve(xtx + reg, xty)
    return [float(v) for v in w]


def quality_classify_trained(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents with TRAINED weights (train_quality_classifier's
    output): margin = mean-pooled hashed-token weights + intercept,
    exactly the feature map the trainer fit.  The weight vector ships
    as a plan-literal array (KBs); the scorer is the same zero-shuffle
    single-projection HOF chain as quality_classify.
    """
    n_buckets = len(weights) - 1
    warr = F.array(*[F.lit(float(v)) for v in weights[:n_buckets]])
    bias = F.lit(float(weights[n_buckets]))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: F.length(t) > 0,
    )
    bucket = lambda t: (  # noqa: E731 -- tiny local expression builder
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % n_buckets
    )
    wsum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(warr, (bucket(t) + F.lit(1)).cast("int")),
    )
    n = F.size(toks)
    margin = F.when(n > 0, wsum / n.cast("double")).otherwise(F.lit(0.0)) + bias
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(margin, 6).alias("margin"),
        (margin >= threshold).alias("keep"),
    )


def parse_robots(
    robots: DataFrame,
    domain_col: str = "domain",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse raw robots.txt bodies into the (domain, prefix, allow)
    rule table `robots_filter` consumes -- the step between fetching
    robots.txt at crawl time and enforcing it.

    Standard-subset semantics (RFC 9309 shape):
      * lines split on newline; `# comment` stripped; fields matched as
        `Key: value` with case-insensitive keys;
      * consecutive `User-agent` lines form ONE group header; the
        Allow/Disallow lines that follow belong to that group;
      * only groups whose header names agent `*` contribute rules here
        (a per-agent variant would thread the agent string through);
      * an empty `Disallow:` value disallows nothing -> no rule row.

    Pure Catalyst line parsing: one posexplode of the split body, a
    running-sum window to assign each line to its user-agent group, a
    per-group max to test for `*`, and a filter -- no UDF.  Robots
    corpora are domain-cardinality (millions of small texts at crawl
    scale, never corpus-scale), so the per-domain window partitions are
    tiny and the parse is scan-bound."""
    from pyspark.sql.window import Window

    lines = (
        robots.select(
            F.col(domain_col).alias("domain"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("lno", "raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")))
        .withColumn("key", F.lower(F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1)))
        .withColumn("value", F.trim(F.regexp_extract(F.col("line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1)))
    )
    w = Window.partitionBy("domain").orderBy("lno")
    is_ua = (F.col("key") == "user-agent").cast("int")
    run_start = (
        (F.col("key") == "user-agent")
        & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    grouped = lines.withColumn("block", F.sum(run_start).over(w))
    star = F.max(
        F.when((F.col("key") == "user-agent") & (F.col("value") == "*"), 1).otherwise(0)
    ).over(Window.partitionBy("domain", "block"))
    return (
        grouped.withColumn("__star", star)
        .filter(
            (F.col("__star") == 1)
            & F.col("key").isin("allow", "disallow")
            & (F.length("value") > 0)
        )
        .select(
            "domain",
            F.col("value").alias("prefix"),
            (F.col("key") == "allow").alias("allow"),
        )
    )
