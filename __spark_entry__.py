"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship HRV feature plan (pre-tokenized sequences ->
skew-aware chunking -> Arrow-vectorized window kernels -> FixedSPH
labeling) on sf0.001. ``queries``/``oracle_sql`` expose one entry per
implemented operator family from SURVEY.md §2 with DuckDB twins; see
seizury_hrv_featuresextraction_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seizury_hrv_featuresextraction_spark.plans.driver_queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["hrv_features_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys missing here (iterative/kernel ops) get the
    driver's weaker rows-only check."""
    return dict(ORACLE)
