"""Luhn-validated credit-card scrub (operators/pii.py): known card
vectors, checksum rejection, separator handling, check-digit
generation, and the JVM-only plan claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.operators.pii import (
    cc_scrub, luhn_check_digit_expr, CC_MASK)


def _scrub_one(spark, text: str) -> tuple[int, str]:
    df = spark.createDataFrame([(text,)], "text: string")
    r = cc_scrub(df).collect()[0]
    return r["n_cc"], r["text_scrubbed"]


def test_known_valid_cards_masked(spark):
    # classic test numbers: Visa, Mastercard, Amex (15-digit)
    for card in ("4111111111111111", "5500005555555559", "378282246310005"):
        n, out = _scrub_one(spark, f"card {card} on file")
        assert n == 1 and out == f"card {CC_MASK} on file", card


def test_invalid_checksum_left_untouched(spark):
    text = "ref 4111111111111112 is an id, not a card"
    n, out = _scrub_one(spark, text)
    assert n == 0 and out == text


def test_separated_card_masked_as_matched_span(spark):
    n, out = _scrub_one(spark, "pay 4111-1111-1111-1111 or 4111 1111 1111 1111")
    assert n == 2
    assert out == f"pay {CC_MASK} or {CC_MASK}"


def test_short_and_long_digit_runs_ignored(spark):
    # 12 digits: too short to match; 20 digits: greedy match takes the
    # 19-digit prefix, which fails Luhn here
    text = "a 123456789012 b 12345678901234567890 c"
    n, out = _scrub_one(spark, text)
    assert n == 0 and out == text


def test_check_digit_generator_produces_valid_cards(spark):
    df = spark.createDataFrame(
        [(str(411111111111111 + i).zfill(15),) for i in range(7)],
        "payload: string")
    carded = df.select(
        F.concat("payload",
                 luhn_check_digit_expr(F.col("payload")).cast("string"))
        .alias("text"))
    out = cc_scrub(carded).collect()
    assert all(r["n_cc"] == 1 and r["text_scrubbed"] == CC_MASK for r in out)


def test_scrub_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("x 4111111111111111 y",)], "text: string")
    plan = cc_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no Python UDF anywhere
