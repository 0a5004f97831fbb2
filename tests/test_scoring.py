"""Decision/rule/anomaly golden vectors from the reference test suite,
evaluated through the engine's Column expressions on tiny DataFrames.

reference: tests/test_decision.py, tests/test_rules.py, tests/test_anomaly.py
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from invoice_anomaly_detection_sieve_spark.functions import scoring as S


def test_fuse_scores_bank_change_floor(spark):
    # reference tests/test_decision.py:4-7
    df = spark.createDataFrame([(0.8, 0.1, True, 0.2)], "dup double, anom double, bank boolean, text double")
    score = df.select(
        S.fuse_scores(F.col("dup"), F.col("anom"), F.col("bank"), F.col("text")).alias("s")
    ).first()["s"]
    assert 80.0 <= score <= 100.0
    decision = df.select(S.decide(F.lit(score), 50.0, 80.0).alias("d")).first()["d"]
    assert decision == "HOLD"
    # exact value: (0.7*0.8 + 0.2*0.8 + 0.1*0.1)*100 = 73 -> +15 = 88
    assert abs(score - 88.0) < 1e-9


def test_fuse_scores_no_bank(spark):
    df = spark.createDataFrame([(0.5, 0.2, False, 0.9)], "dup double, anom double, bank boolean, text double")
    score = df.select(
        S.fuse_scores(F.col("dup"), F.col("anom"), F.col("bank"), F.col("text")).alias("s")
    ).first()["s"]
    # 0.7*0.5 + 0.2*max(0.5,0.9) + 0.1*0.2 = 0.35+0.18+0.02 = 0.55
    assert abs(score - 55.0) < 1e-9


def test_decide_thresholds(spark):
    df = spark.createDataFrame([(85.0,), (60.0,), (10.0,)], "s double")
    out = [r["d"] for r in df.select(S.decide(F.col("s")).alias("d"), "s").orderBy(F.desc("s")).collect()]
    assert out == ["HOLD", "REVIEW", "PASS"]
    with pytest.raises(ValueError):
        S.decide(F.lit(1.0), review_threshold=80.0, hold_threshold=50.0)


def test_rule_same_po_near_total(spark):
    # reference tests/test_rules.py:6-18 (Decimal cases collapse to double)
    rows = [
        ("PO1", "PO1", 100.0, 100.4, 5, True),
        ("PO1", "PO1", 100.0, 106.0, 5, False),
        ("PO1", "PO1", 100.0, 100.4, 40, False),
        (None, "PO1", 100.0, 100.0, 5, False),
        ("PO1", "PO2", 100.0, 100.0, 5, False),
    ]
    df = spark.createDataFrame(
        [r[:5] for r in rows], "pa string, pb string, ta double, tb double, gap int"
    )
    got = [
        r["o"]
        for r in df.select(
            S.rule_same_po_near_total(
                F.col("pa"), F.col("pb"), F.col("ta"), F.col("tb"), F.col("gap")
            ).alias("o")
        ).collect()
    ]
    assert got == [r[5] for r in rows]


def test_rule_same_invnum_and_pdf(spark):
    df = spark.createDataFrame(
        [("123", "123", "h1", "h1"), ("123", "124", "h1", "h2"), ("", "", None, None)],
        "ia string, ib string, ha string, hb string",
    )
    rows = df.select(
        S.rule_same_invnum_norm(F.col("ia"), F.col("ib")).alias("inv"),
        S.rule_pdf_near_dup(F.col("ha"), F.col("hb")).alias("pdf"),
    ).collect()
    assert [(r["inv"], r["pdf"]) for r in rows] == [(True, True), (False, False), (False, False)]


@pytest.mark.parametrize("std,expect_outlier", [(12.5, False), (0.0, False)])
def test_anomaly_probability_decimal_baseline(spark, std, expect_outlier):
    # reference tests/test_anomaly.py:19-48: mean=100, total=110, n=20, hist=11
    df = spark.createDataFrame(
        [(110.0, 100.0, std, 20, False, 11)],
        "total double, mean double, std double, n long, bank boolean, hist long",
    )
    z_col = S.amount_z(F.col("total"), F.col("mean"), F.col("std"), F.col("n"))
    row = df.select(
        z_col.alias("z"),
        S.anomaly_probability(z_col, F.col("bank"), F.col("hist")).alias("p"),
    ).first()
    assert 0.0 <= row["p"] <= 1.0
    if std > 0:
        assert abs(row["z"] - 10.0 / std) < 1e-9
    else:
        # std=0, count>10 -> |110-100|/max(100,1) = 0.1
        assert abs(row["z"] - 0.1) < 1e-9
    assert (row["z"] >= 2.5) == expect_outlier


def test_anomaly_probability_cold_group_and_bank(spark):
    df = spark.createDataFrame([(0.0, True, 2)], "z double, bank boolean, hist long")
    p = df.select(S.anomaly_probability(F.col("z"), F.col("bank"), F.col("hist")).alias("p")).first()["p"]
    # (0.1 + 0 + 0.25) * 0.8 = 0.28
    assert abs(p - 0.28) < 1e-9


def test_dup_probability_all_zero_features(spark):
    df = spark.createDataFrame([(1,)], "x int")
    feats = {name: F.lit(0.0) for name in S.FEATURE_ORDER}
    p = df.select(S.dup_probability(feats).alias("p")).first()["p"]
    assert abs(p - 1.0 / (1.0 + math.exp(0.3))) < 1e-9


def test_dup_probability_strong_duplicate(spark):
    df = spark.createDataFrame([(1,)], "x int")
    feats = {name: F.lit(0.0) for name in S.FEATURE_ORDER}
    feats.update(
        {
            "same_po": F.lit(1.0),
            "same_currency": F.lit(1.0),
            "same_tax_total": F.lit(1.0),
            "line_coverage_pct": F.lit(1.0),
            "text_cosine": F.lit(1.0),
        }
    )
    p = df.select(S.dup_probability(feats).alias("p")).first()["p"]
    logit = -0.3 + 0.8 + 0.3 + 0.2 + 1.6 + 2.2
    assert abs(p - 1.0 / (1.0 + math.exp(-logit))) < 1e-9
