"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship query on /root/testdata/sf0.001 (smoke check).
queries()      -- one named query per implemented operator (SURVEY.md
                  section 2 + LLM/windowed north-star scope); each
                  callable is (spark, sf_dir) -> DataFrame.
oracle_sql()   -- matching DuckDB ANSI SQL per query.  384 of 396
                  queries carry full value oracles (md5-register
                  sketches, literal-replayed LSH planes, unrolled
                  exact-decimal greedies, recursive-CTE folds,
                  unrolled training stages, and generator-formula
                  media replays -- see SCALE.md); the remaining 12
                  are genuinely float-iterative / trained /
                  corrupt-media / engine-hash production tiers whose
                  integer or md5 TWINS ARE value-checked, each with a
                  pytest replica (driver records rows-only checks for
                  those).

Implementation lives in uofi_payroll_etl_main_spark/ (registry_core.py,
registry_llm.py and the operator modules they compose).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from uofi_payroll_etl_main_spark.oracles_core import CORE_ORACLES
from uofi_payroll_etl_main_spark.oracles_llm import LLM_ORACLES
from uofi_payroll_etl_main_spark.registry_core import (
    CORE_QUERIES,
    FLAGSHIP_SQL,
    SQL2_TEXT,
    SQL3_TEXT,
    SQL4_TEXT,
    flagship,
)
from uofi_payroll_etl_main_spark.registry_llm import LLM_QUERIES
from uofi_payroll_etl_main_spark.registry_pipelines import PIPE_ORACLES, PIPE_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(CORE_QUERIES)
    out.update(LLM_QUERIES)
    out.update(PIPE_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update({k: v for k, v in CORE_ORACLES.items() if v is not None})
    out["flagship"] = FLAGSHIP_SQL
    out["sql2_window_rank"] = SQL2_TEXT
    out["sql3_exists_cte"] = SQL3_TEXT
    out["sql4_grouping_sets"] = SQL4_TEXT
    out.update(LLM_ORACLES)
    out.update(PIPE_ORACLES)
    return out
