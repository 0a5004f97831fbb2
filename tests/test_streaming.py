"""Streaming registry maintenance (§2.9 optional mode): watermarked
first/last-seen aggregation + first-seen alerts + foreachBatch merge sink,
driven deterministically with a file source and availableNow trigger."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from invoice_anomaly_detection_sieve_spark.sources.catalog import ParquetCatalog
from invoice_anomaly_detection_sieve_spark.streaming import registry_stream as R

OBS_SCHEMA = "media_key string, ts timestamp"


def _write_obs(spark, path, rows):
    spark.createDataFrame(rows, OBS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_registry_stream_merges_into_catalog(spark, tmp_path):
    src = str(tmp_path / "obs")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    _write_obs(spark, src, [
        ("K1", t0),
        ("K1", t0 + dt.timedelta(hours=2)),
        ("K2", t0 + dt.timedelta(minutes=5)),
    ])

    catalog = ParquetCatalog(spark, str(tmp_path / "wh"))
    stream = spark.readStream.schema(OBS_SCHEMA).parquet(src)
    q = (
        R.sink_registry(R.registry_updates(stream), catalog, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    reg = {r["media_key"]: r.asDict() for r in catalog.read("media_registry").collect()}
    assert set(reg) == {"K1", "K2"}
    assert reg["K1"]["first_seen"] == t0
    assert reg["K1"]["last_seen"] == t0 + dt.timedelta(hours=2)
    assert reg["K2"]["first_seen"] == reg["K2"]["last_seen"]

    # second batch arrives: K1 extends, K3 appears; merge stays idempotent
    _write_obs(spark, src, [
        ("K1", t0 + dt.timedelta(hours=5)),
        ("K3", t0 + dt.timedelta(hours=1)),
    ])
    q2 = (
        R.sink_registry(R.registry_updates(stream), catalog, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    reg = {r["media_key"]: r.asDict() for r in catalog.read("media_registry").collect()}
    assert set(reg) == {"K1", "K2", "K3"}
    assert reg["K1"]["first_seen"] == t0
    assert reg["K1"]["last_seen"] == t0 + dt.timedelta(hours=5)


def test_first_seen_alerts(spark, tmp_path):
    src = str(tmp_path / "obs2")
    t0 = dt.datetime(2024, 3, 1, 9, 0, 0)
    _write_obs(spark, src, [
        ("A", t0),
        ("A", t0 + dt.timedelta(minutes=10)),
        ("B", t0 + dt.timedelta(minutes=1)),
    ])
    stream = spark.readStream.schema(OBS_SCHEMA).parquet(src)
    alerts = R.first_seen_alerts(stream)
    q = (
        alerts.writeStream.format("memory")
        .queryName("alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["media_key"] for r in spark.table("alerts").collect()}
    assert got == {"A", "B"}  # one alert per key, not per observation
    assert spark.table("alerts").count() == 2


def test_observations_from_documents(spark):
    from invoice_anomaly_detection_sieve_spark.schema import DOCUMENTS

    rows = [
        ("D1", [
            {"kind": "media", "text": None, "media_ref": "M1", "offset": 1},
            {"kind": "line", "text": "x", "media_ref": None, "offset": 2},
            {"kind": "pdf", "text": None, "media_ref": "H1", "offset": 3},
        ]),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS).withColumn(
        "event_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    obs = R.observations_from_documents(df)
    got = sorted(r["media_key"] for r in obs.collect())
    assert got == ["H1", "M1"]
