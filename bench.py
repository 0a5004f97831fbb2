"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line.

Methodology:
- the interleaved documents table is materialized to parquet once per sf
  (generation time reported separately as ``datagen_sec`` — a real
  deployment reads an existing table);
- each timed measurement is best-of-N (default 2) after a warmup, because
  single-JVM local mode has high run-to-run variance;
- the north_rule scaling criterion runs the flagship validation at two
  parallelism levels (local[N] vs local[4N]) on identical input and
  reports throughput at both plus efficiency
  ``(docs/sec @4N) / (4 × docs/sec @N)`` (no real cluster in the sandbox —
  see BASELINE.md). SIEVE_BENCH_SCALING=0 skips it.
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
REPEATS = int(os.environ.get("SIEVE_BENCH_REPEATS", "2"))
WORK_DIR = os.environ.get("SIEVE_BENCH_WORKDIR", "/tmp/sieve_bench")


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def materialize_inputs(spark, sf_dir: str) -> tuple[str, str, float]:
    """Write the interleaved documents + registry tables once per sf."""
    from invoice_anomaly_detection_sieve_spark.datagen import (
        docs_from_tpch,
        registry_from_tpch,
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    docs_path = os.path.join(WORK_DIR, tag, "documents.parquet")
    reg_path = os.path.join(WORK_DIR, tag, "registry.parquet")
    if os.path.isdir(docs_path) and os.path.isdir(reg_path):
        return docs_path, reg_path, 0.0
    t0 = time.time()
    # explicit repartition: AQE would otherwise coalesce the write to ONE
    # file, making every downstream scan a single task at any core count
    docs_from_tpch(spark, sf_dir).repartition(64).write.mode("overwrite").parquet(docs_path)
    registry_from_tpch(spark).write.mode("overwrite").parquet(reg_path)
    return docs_path, reg_path, time.time() - t0


def validate_once(spark, docs_path: str, reg_path: str) -> tuple[float, int]:
    from invoice_anomaly_detection_sieve_spark.plans import validate as V

    documents = spark.read.parquet(docs_path)
    registry = spark.read.parquet(reg_path)
    t0 = time.time()
    out = V.run_validation(
        documents, registry, config=V.ValidationConfig(dq_as_of="2025-01-01", enable_dq=False)
    )
    n = out["doc_verdicts"].count()
    sec = time.time() - t0
    out["extracted_docs"].unpersist()
    return sec, n


def bench_queries(spark, sf_dir: str, docs_path: str) -> dict[str, float]:
    from invoice_anomaly_detection_sieve_spark.documents import extract_docs
    from invoice_anomaly_detection_sieve_spark.operators import (
        blocking,
        dedup,
        profile,
        textstats,
    )
    from invoice_anomaly_detection_sieve_spark.plans.queries import QUERIES

    documents = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def timed(name, action):
        t0 = time.time()
        action()
        out[name] = round(time.time() - t0, 3)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    timed("extract_docs", lambda: noop(extract_docs(documents)))
    docs = extract_docs(documents).persist()
    docs.count()
    timed("blocking_pairs", lambda: noop(blocking.candidate_pairs(docs)))
    timed("profile", lambda: noop(profile.profile(docs, "total")))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("dedup_minhash_lsh", lambda: noop(dedup.minhash_lsh_pairs(d)))
    timed("text_stats", lambda: noop(textstats.with_text_stats(d)))
    for name in ("j1_blocking_pairs", "a1_profile_baselines", "w1_topk_per_group",
                 "j5_m5_zscore_outliers", "a4_nested_line_sum"):
        timed(name, lambda n=name: noop(QUERIES[n](spark, sf_dir)))
    docs.unpersist()
    return out


def fresh_session(cores: int):
    from pyspark.sql import SparkSession

    from invoice_anomaly_detection_sieve_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark("sieve-bench", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()  # JVM warmup
    return spark


def main():
    results: dict = {"sf": _sf_of(SF_DIR), "cpus": CPUS}

    spark = fresh_session(CPUS)
    docs_path, reg_path, gen_sec = materialize_inputs(spark, SF_DIR)
    results["datagen_sec"] = round(gen_sec, 3)

    qtimes = bench_queries(spark, SF_DIR, docs_path)

    # validate measurements run in fresh sessions, interleaved big/small and
    # taking the best per level: the sandbox host has noisy-neighbor
    # variance that can double any single run's wall time.
    small = max(1, CPUS // 4)
    scaling_on = os.environ.get("SIEVE_BENCH_SCALING", "1") != "0"
    order = [CPUS, small, CPUS, small] if scaling_on else [CPUS, CPUS]
    best: dict[int, float] = {}
    n_docs = 0
    for cores in order:
        s = fresh_session(cores)
        sec, n_docs = validate_once(s, docs_path, reg_path)
        best[cores] = min(best.get(cores, float("inf")), sec)
    sec_full = best[CPUS]
    qtimes["validate_full"] = round(sec_full, 3)
    results["queries"] = qtimes
    results["docs"] = n_docs
    results["docs_per_sec"] = round(n_docs / sec_full, 1)

    if scaling_on:
        thr_small = n_docs / best[small]
        thr_big = n_docs / sec_full
        results["scaling"] = {
            "cores_n": small,
            "cores_4n": CPUS,
            "docs_per_sec_n": round(thr_small, 1),
            "docs_per_sec_4n": round(thr_big, 1),
            "efficiency": round(thr_big / (4.0 * thr_small), 3),
        }

    results["metric"] = "validated_docs_per_sec"
    results["value"] = round(sum(qtimes.values()), 3)
    results["unit"] = "sec"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
