"""Golden-row tests for the quirky scalar semantics (SURVEY §5).

Each case pins a reference quirk: F1's return-original-on-failure,
F5's percent-vs-absolute with clamp-at-zero, F8's empty-string
secundaria, F4's comma decimals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from z316_sales_data_pipeline_spark.functions import scalar, text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _vals(spark, data, schema, col):
    df = spark.createDataFrame(data, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_f1_lenient_date_fallthrough(spark):
    vals = _vals(
        spark,
        [("25/12/2023",), ("not-a-date",), ("31/02/2023",)],
        "d string",
        scalar.reformat_date_lenient("d"),
    )
    # parse failure (including impossible dates) returns input unchanged
    assert vals == ["2023-12-25", "not-a-date", "31/02/2023"]


def test_f4_brl_number(spark):
    vals = _vals(
        spark,
        [("12,5",), ("7.25",), ("abc",), ("",)],
        "s string",
        scalar.parse_brl_number("s"),
    )
    assert vals == [12.5, 7.25, None, None]


def test_f5_discount_percent_absolute_clamp(spark):
    rows = [
        ("10%", 200.0, 20.0),  # percent of total
        ("12,5", 200.0, 12.5),  # absolute with comma decimal
        ("garbage", 200.0, 0.0),  # parse error -> 0.0
        ("-5", 200.0, 0.0),  # clamped at zero
        ("0", 200.0, 0.0),
    ]
    vals = _vals(
        spark,
        [(s, t) for s, t, _ in rows],
        "s string, total double",
        scalar.parse_discount("s", "total"),
    )
    assert vals == [e for _, _, e in rows]


def test_f6_gross_up(spark):
    v = _vals(spark, [(90.0, 10.0)], "valor double, d double", scalar.gross_up("valor", "d"))
    assert abs(v[0] - 100.0) < 1e-9
    amt = _vals(
        spark, [(90.0, 10.0)], "valor double, d double", scalar.item_discount_amount("valor", "d")
    )
    assert abs(amt[0] - 10.0) < 1e-9


def test_f8_category_split(spark):
    data = [("Bebidas >> Vinhos",), ("Mercearia",)]
    p = _vals(spark, data, "c string", scalar.category_principal("c"))
    s = _vals(spark, data, "c string", scalar.category_secundaria("c"))
    assert p == ["Bebidas", "Mercearia"]
    assert s == ["Vinhos", ""]  # '' not NULL when separator absent


def test_f10_blob_name_parse(spark):
    name = "z316-tiny-api-123-produto-456-20240101T120000-abc123-def.json"
    df = spark.createDataFrame([(name,)], "n string")
    parsed = scalar.parse_blob_name("n")
    row = df.select(*[c.alias(k) for k, c in parsed.items()]).collect()[0]
    assert row["dados_id"] == "123"
    assert row["data_type"] == "produto"
    assert row["produto_id"] == "456"
    assert row["ts"] == "20240101T120000"
    assert row["uuid"] == "abc123-def"


def test_shingles_short_text(spark):
    vals = _vals(spark, [("a b",), ("a b c d",)], "t string", text.shingles("t", 3))
    assert vals[0] == []  # shorter than k -> empty, not descending-range garbage
    assert vals[1] == ["a b c", "b c d"]


def test_token_counts(spark):
    vals = _vals(spark, [("  ",), ("one two  three",)], "t string", text.whitespace_token_count("t"))
    assert vals == [0, 3]


def test_language_id(spark):
    vals = _vals(
        spark,
        [("the cat and the dog is in that house",), ("el perro y la casa de los gatos",), ("zzz qqq",)],
        "t string",
        text.language_id("t"),
    )
    assert vals == ["en", "es", "und"]


def test_pii_scrub(spark):
    vals = _vals(
        spark,
        [
            ("mail a.b+c@x-y.co.uk now",),
            ("cpf 123.456.789-09 fim",),
            ("call +55 (11) 98765-4321 ok",),
            ("no pii here",),
        ],
        "t string",
        text.pii_scrub("t"),
    )
    assert vals[0] == "mail <EMAIL> now"
    assert vals[1] == "cpf <CPF> fim"  # CPF rule fires before the phone rule
    assert vals[2] == "call <PHONE> ok"
    assert vals[3] == "no pii here"
