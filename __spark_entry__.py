"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship validation pipeline end-to-end on sf0.001;
``queries``/``oracle_sql`` expose the SURVEY.md §2 operator registry with
DuckDB oracles (see invoice_anomaly_detection_sieve_spark/plans/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full constraint-validation run (normalize → blocking
    self-join → pair scoring → registry/profile joins → fusion/verdicts)
    over an interleaved documents table derived from sf0.001."""
    from pyspark.sql import functions as F

    from invoice_anomaly_detection_sieve_spark.datagen import (
        docs_from_tpch,
        registry_from_tpch,
    )
    from invoice_anomaly_detection_sieve_spark.plans import validate as V

    sf_dir = "/root/testdata/sf0.001"
    documents = docs_from_tpch(spark, sf_dir)
    registry = registry_from_tpch(spark)
    out = V.run_validation(
        documents, registry, config=V.ValidationConfig(dq_as_of="2025-01-01", enable_dq=False)
    )
    v = out["doc_verdicts"]
    return v.select(
        "part",
        "doc_id",
        F.round("risk_score", 6).alias("risk_score"),
        "decision",
        "reason_codes",
        F.round("dup_prob", 6).alias("dup_prob"),
        F.round("anom_prob", 6).alias("anom_prob"),
        "top_match_doc_id",
        "bank_change",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from invoice_anomaly_detection_sieve_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from invoice_anomaly_detection_sieve_spark.plans.queries import ORACLES

    return dict(ORACLES)
