"""ANSI-on oracle smoke: the driver's correctness gate runs on a DEFAULT
Spark 4 session (ANSI enabled), while the engine's tuned session runs
ANSI off for pandas `errors='coerce'` parity.  This suite makes the
"registry is try_-safe under ANSI" claim a committed, repeatable check:
a representative slice of the registry (cast-heavy expression ops,
timestamp parses, array indexing, window/join/agg shapes, composed
pipelines) re-runs with ANSI flipped ON and every result is compared
against its DuckDB oracle value-for-value.

ANSI is a runtime-settable SQL conf, so the session fixture is reused
and the flag restored afterwards -- same JVM, same plan cache rules as
the driver's default session for these semantics.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Cast/parse-sensitive ops first (the shapes ANSI actually changes:
# string->number casts, timestamp parsing, array element access), then
# one representative per major family.
ANSI_PROBES = [
    "e8_to_ts_coerce",
    "e2_ensure_string",
    "e16_finalize",
    "q1_pricing_summary",
    "sql3_exists_cte",
    "flagship",
    "pipe_pua",
    "d4_keep_first",
    "j14_interval_join",
    "w_rolling",
    "a20_winsorize",
    "llm_url_dedup",
    "llm_quality_classifier",
    "llm_extract_spans",
    "llm_cosine_topk",
    "llm_gopher_rules",
    "llm_c4_pipeline",
    "llm_dataset_card",
    # round-5 close: Knuth-hash arithmetic (overflow-sensitive under
    # ANSI), HOF struct compares, decimal LM sums, ceil/array math
    "llm_fim_transform",
    "llm_substring_strip",
    "llm_perplexity_buckets",
    "llm_chat_render",
    "llm_leakage_safe_split",
    # post-close: array-fold arithmetic (Holt/CUSUM recurrences),
    # corrupt-record JSON routing, log/pow digit math, epoch-seconds
    # interval weighting
    "w_holt",
    "w_cusum",
    "e21_quarantine",
    "v13_benford",
    "w_twap",
    "j22_spatial_join",
    "a46_itemsets",
]


def _load_checker():
    spec = importlib.util.spec_from_file_location(
        "check_oracles", os.path.join(ROOT, "tools", "check_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ansi_spark(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ANSI_PROBES)
def test_ansi_on_matches_oracle(ansi_spark, duck, name):
    assert ansi_spark.conf.get("spark.sql.ansi.enabled") == "true"
    checker = _load_checker()
    sdf = entrymod.queries()[name](ansi_spark, SF).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).df()
    ok, why = checker.frames_match(sdf, ddf)
    assert ok, f"{name} under ANSI: {why}"
