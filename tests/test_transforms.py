"""Unit tests for the reference per-row transforms (SURVEY.md §2.3
operators #11-#21) as pure Column expressions, on literal frames with
exact expected rows — including the reference's own edge cases (short
category codes, timezone suffixes, chunk-reset row ids)."""

from __future__ import annotations

from google_cloud_ecommerce_spark import transforms as T


def test_cast_all_to_string_11(spark):
    df = spark.createDataFrame([(1, 2.5)], "a int, b double")
    out = df.select(*T.cast_all_to_string(["a", "b"]))
    assert dict(out.dtypes) == {"a": "string", "b": "string"}
    assert out.collect()[0].a == "1"


def test_null_fill_12(spark):
    df = spark.createDataFrame([("x",), (None,)], "brand string")
    rows = [r.brand for r in df.select(T.null_fill("brand", "Not Specified")).collect()]
    assert rows == ["x", "Not Specified"]


def test_split_category_code_13_14(spark):
    df = spark.createDataFrame(
        [("electronics.smartphone",), ("a.b.c.d",), (None,)], "category_code string"
    )
    out = df.select(*T.split_category_code()).collect()
    assert (out[0].category, out[0].sub_category) == ("electronics", "smartphone")
    assert out[0].product is None  # short split -> null (BigQuery parity)
    assert out[1].product_details == "d"
    assert out[2].category is None


def test_category_map_14(spark):
    df = spark.createDataFrame([("a.b",)], "category_code string")
    m = df.select(T.category_map()).collect()[0].category_map
    assert m["category"] == "a" and m["sub_category"] == "b" and m["product"] is None


def test_parse_event_time_15(spark):
    df = spark.createDataFrame(
        [("2019-11-01 09:00:05 UTC",), ("2019-11-01 09:00:05+00:00",)], "event_time string"
    )
    rows = [r.event_time for r in df.select(T.parse_event_time()).collect()]
    assert rows[0] == rows[1]
    assert rows[0].hour == 9 and rows[0].second == 5


def test_cast_price_16_and_hour_17(spark):
    df = spark.createDataFrame([("12.5", "2019-11-01 21:04:00")], "price string, ts string")
    out = df.select(T.cast_price(), T.extract_hour("ts")).collect()[0]
    assert out.price == 12.5 and out.hour == 21


def test_csv_line_roundtrip_18_19(spark):
    df = spark.createDataFrame([(7, "cart", 3.5)], "id long, et string, v double")
    wire = df.select(T.serialize_csv_line(["id", "et", "v"]))
    assert wire.collect()[0].value == b"7,cart,3.5"
    back = wire.select(T.parse_csv_line("value", "id long, et string, v double"))
    rec = back.collect()[0].record
    assert (rec.id, rec.et, rec.v) == (7, "cart", 3.5)


def test_to_named_record_20(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    rec = df.select(T.to_named_record(["a", "b"])).collect()[0].record
    assert rec.asDict() == {"a": 1, "b": "x"}


def test_synthetic_row_id_21_dense_global(spark):
    """Unlike the reference's per-chunk pandas index (record_id=0 every
    100 rows), the window row id is dense across the whole dataset."""
    df = spark.createDataFrame([(3,), (1,), (2,)], "k long").repartition(3)
    rows = df.select("k", T.synthetic_row_id(["k"])).collect()
    assert {(r.k, r.record_id) for r in rows} == {(1, 0), (2, 1), (3, 2)}
