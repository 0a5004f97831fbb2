"""Golden vectors ported from reference tests/test_normalization.py,
evaluated through the engine's Column expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from invoice_anomaly_detection_sieve_spark.functions import normalize as N


def _eval(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col(F.col("v")).alias("out")).first()["out"]


def test_invnum_norm_vectors(spark):
    vals = {
        " inv-000123 ": "123",
        "invoice-001A": "1A",
        "INV 77": "77",
        "BILL-0009": "9",
        "0000": "0",
        "": "0",
        "ABC-123": "ABC123",
    }
    df = spark.createDataFrame([(k,) for k in vals], "v string")
    out = {r["v"]: r["out"] for r in df.select("v", N.invnum_norm(F.col("v")).alias("out")).collect()}
    assert out == vals


def test_desc_norm_vectors(spark):
    assert _eval(spark, N.desc_norm, "Printer Ink, Black!!!") == "printer ink black"
    assert _eval(spark, N.desc_norm, "  A  -  B  ") == "a b"


def test_mask_account_last4(spark):
    assert _eval(spark, N.mask_account_last4, "12-3456789") == "****6789"
    assert _eval(spark, N.mask_account_last4, "no digits") == "****"
    assert _eval(spark, N.mask_account_last4, "12") == "****12"
    df = spark.createDataFrame([(None,)], "v string")
    assert df.select(N.mask_account_last4(F.col("v")).alias("o")).first()["o"] is None


def test_hash_account_matches_sha256(spark):
    import hashlib

    val = "ACCT-1"
    assert _eval(spark, N.hash_account, val) == hashlib.sha256(val.encode()).hexdigest()
    df = spark.createDataFrame([(None,)], "v string")
    assert df.select(N.hash_account(F.col("v")).alias("o")).first()["o"] is None


def test_char_ngrams_and_dice(spark):
    df = spark.createDataFrame([("abcd", "bcde")], "a string, b string")
    row = df.select(
        N.char_ngrams(F.col("a")).alias("ga"),
        N.dice_overlap(N.char_ngram_set(F.col("a")), N.char_ngram_set(F.col("b"))).alias("d"),
    ).first()
    assert row["ga"] == ["abc", "bcd"]
    # grams a={abc,bcd}, b={bcd,cde}: overlap 1, denom 4 -> 0.5
    assert abs(row["d"] - 0.5) < 1e-12

    short = spark.createDataFrame([("ab",)], "a string")
    assert short.select(N.char_ngrams(F.col("a")).alias("g")).first()["g"] == []


def test_span_canonical_orders_by_offset(spark):
    rows = [
        (
            "d1",
            [
                {"kind": "line", "text": "b", "media_ref": None, "offset": 2},
                {"kind": "header", "text": "a", "media_ref": "m1", "offset": 1},
            ],
        )
    ]
    from invoice_anomaly_detection_sieve_spark.schema import DOCUMENTS

    df = spark.createDataFrame(rows, DOCUMENTS)
    out = df.select(N.span_canonical(F.col("spans")).alias("c")).first()["c"]
    assert out == "header\x1fa\x1fm1\x1f1\x1eline\x1fb\x1f\x00\x1f2"
