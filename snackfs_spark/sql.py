"""SQL entry point: the whole engine is reachable through plain
``spark.sql`` — base tables and the derived filesystem relations register
as temp views, so a snackfs user can run the §2.B surface as SQL.
Catalyst produces the same plans as the DataFrame API (SURVEY.md §3.1
mapping: shell command → SQL statement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from snackfs_spark.sources import fsmodel
from snackfs_spark.sources.tables import TABLES, load_table


def register_all_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the star-schema tables AND the filesystem model as temp
    views: region/nation/.../embeddings + files/content/locks/ring/blocks."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    fsmodel.files_df(spark, sf_dir).createOrReplaceTempView("files")
    fsmodel.content_df(spark, sf_dir).createOrReplaceTempView("content")
    fsmodel.locks_df(spark, sf_dir).createOrReplaceTempView("locks")
    fsmodel.ring_df(spark, sf_dir).createOrReplaceTempView("ring")
    fsmodel.blocks_df(spark, sf_dir).createOrReplaceTempView("blocks")


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """Run a SQL statement against the registered engine views."""
    register_all_views(spark, sf_dir)
    return spark.sql(statement)
