"""SQL entry point: the same engine surface through `spark.sql`.

Every DataFrame operator in this package has a declarative twin --
Catalyst plans SQL text and DataFrame calls identically -- so pipelines
that live as SQL (dbt-style repos, analyst queries, migration from a
warehouse) run unchanged: register the catalog once, then `run_sql`.

Views are session-scoped temp views over the parquet sources (no data
copy; predicate pushdown, partition pruning, and AQE all apply exactly
as for the DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table

__all__ = ["register_views", "run_sql"]


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register each source table as a session temp view named after it."""
    for t in tables or TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the catalog and run one SQL statement against it."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
