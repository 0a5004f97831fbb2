"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line.

Also measures the north_rule scaling criterion: the same flagship
validation job at two parallelism levels (local[N] and local[4N] cores on
identical input) and reports throughput at both plus scaling efficiency
``(docs/sec @4N) / (4 × docs/sec @N)`` (no real cluster in the sandbox —
see BASELINE.md). Set SIEVE_BENCH_SCALING=0 to skip the second session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def build_inputs(spark, sf_dir):
    from invoice_anomaly_detection_sieve_spark.datagen import (
        docs_from_tpch,
        registry_from_tpch,
    )

    documents = docs_from_tpch(spark, sf_dir)
    registry = registry_from_tpch(spark)
    return documents, registry


def validate_full(spark, sf_dir) -> tuple[float, int]:
    """Flagship: full constraint-validation run; returns (sec, n_docs)."""
    from invoice_anomaly_detection_sieve_spark.plans import validate as V

    documents, registry = build_inputs(spark, sf_dir)
    t0 = time.time()
    out = V.run_validation(
        documents, registry, config=V.ValidationConfig(dq_as_of="2025-01-01", enable_dq=False)
    )
    n = out["doc_verdicts"].count()
    return time.time() - t0, n


def bench_queries(spark, sf_dir) -> dict[str, float]:
    """Headline operator queries (one action each, timed individually)."""
    from invoice_anomaly_detection_sieve_spark.documents import extract_docs
    from invoice_anomaly_detection_sieve_spark.operators import blocking, profile
    from invoice_anomaly_detection_sieve_spark.plans.queries import QUERIES

    out: dict[str, float] = {}

    documents, registry = build_inputs(spark, sf_dir)
    t0 = time.time()
    docs = extract_docs(documents)
    docs.write.format("noop").mode("overwrite").save()
    out["extract_docs"] = time.time() - t0

    t0 = time.time()
    blocking.candidate_pairs(extract_docs(documents)).write.format("noop").mode(
        "overwrite"
    ).save()
    out["blocking_pairs"] = time.time() - t0

    t0 = time.time()
    profile.profile(extract_docs(documents), "total").write.format("noop").mode(
        "overwrite"
    ).save()
    out["profile"] = time.time() - t0

    for name in ("j1_blocking_pairs", "a1_profile_baselines", "w1_topk_per_group",
                 "j5_m5_zscore_outliers", "a4_nested_line_sum"):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = time.time() - t0
    return out


def fresh_session(cores: int):
    from pyspark.sql import SparkSession

    from invoice_anomaly_detection_sieve_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # shuffle parallelism tracks the core count so both runs are "sized to
    # the cluster" the way a real deployment would be
    return get_spark("sieve-bench", cores=cores, shuffle_partitions=max(cores, 8))


def main():
    results: dict = {"sf": _sf_of(SF_DIR), "cpus": CPUS}

    spark = fresh_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/python workers once with a tiny action
    spark.range(1000).select(F.sum("id")).collect()

    qtimes = bench_queries(spark, SF_DIR)
    sec_full, n_docs = validate_full(spark, SF_DIR)
    qtimes["validate_full"] = sec_full
    results["queries"] = {k: round(v, 3) for k, v in qtimes.items()}
    results["docs"] = n_docs
    results["docs_per_sec"] = round(n_docs / sec_full, 1)

    if os.environ.get("SIEVE_BENCH_SCALING", "1") != "0":
        small = max(1, CPUS // 4)
        spark_small = fresh_session(small)
        spark_small.sparkContext.setLogLevel("ERROR")
        spark_small.range(1000).select(F.sum("id")).collect()
        sec_small, _ = validate_full(spark_small, SF_DIR)
        thr_small = n_docs / sec_small
        thr_big = n_docs / sec_full
        results["scaling"] = {
            "cores_n": small,
            "cores_4n": CPUS,
            "docs_per_sec_n": round(thr_small, 1),
            "docs_per_sec_4n": round(thr_big, 1),
            "efficiency": round(thr_big / (4.0 * thr_small), 3),
        }
        spark_small.stop()

    results["metric"] = "validated_docs_per_sec"
    results["value"] = round(sum(qtimes.values()), 3)
    results["unit"] = "sec"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
