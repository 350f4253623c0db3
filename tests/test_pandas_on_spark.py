"""The reference is a pandas codebase (chunked pd.read_csv ->
element-wise transforms -> astype(str), write_session_batch.py:26-46).
pandas-on-Spark (pyspark.pandas) runs that dialect distributed and
unchanged — these tests express the reference's own transform steps in
ps.DataFrame form and pin them value-equal to this repo's Spark-native
operators, proving a reference user could port their pandas code
first and optimize to the native API second."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ps(spark):
    return pytest.importorskip("pyspark.pandas")


def test_astype_str_matches_cast_all_to_string(spark, ps, sf_smoke):
    """write_session_batch.py:29 astype(str) == transforms.cast_all_to_string."""
    from google_cloud_ecommerce_spark.transforms import cast_all_to_string

    sdf = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_id", "event_type"
    )
    native = (
        sdf.select(*cast_all_to_string(["event_id", "event_type"]))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    ported = (
        ps.DataFrame(sdf)
        .astype(str)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (native["event_id"] == ported["event_id"]).all()
    assert (native["event_type"] == ported["event_type"]).all()


def test_groupby_agg_matches_native_daily_events(spark, ps, sf_smoke):
    """The reference's warehouse Q1 (events per day+type), written as a
    pandas groupby, equals the native daily_events query."""
    from google_cloud_ecommerce_spark.queries.reference import daily_events

    native = {
        (str(r.day), r.event_type): r.n_events
        for r in daily_events(spark, sf_smoke).collect()
    }

    psdf = ps.read_parquet(f"{sf_smoke}/events.parquet")
    psdf = psdf.assign(day=psdf["ts"].dt.floor("D"))
    counts = psdf.groupby(["day", "event_type"]).size().reset_index(name="n_events")
    ported = {
        (str(pd.Timestamp(r.day).date()), r.event_type): int(r.n_events)
        for r in counts.to_pandas().itertuples()
    }
    assert ported == native


def test_string_split_matches_split_category_code(spark, ps):
    """write_session_stream.py:34-41 category dot-split, pandas dialect."""
    from google_cloud_ecommerce_spark.transforms import (
        CATEGORY_LEVELS,
        split_category_code,
    )

    pdf = pd.DataFrame({"category_code": ["a.b.c.d", "x.y", "solo"]})
    sdf = spark.createDataFrame(pdf)
    native = [
        tuple(row)
        for row in sdf.select(*split_category_code("category_code")).collect()
    ]

    # pandas-on-Spark's str.split pat is regex (it compiles to F.split)
    parts = ps.DataFrame(sdf)["category_code"].str.split(r"\.")
    out = ps.concat(
        [parts.str.get(i).rename(name) for i, name in enumerate(CATEGORY_LEVELS)],
        axis=1,
    ).to_pandas()
    ported = [
        tuple(None if pd.isna(v) else v for v in row)
        for row in out.itertuples(index=False)
    ]
    assert sorted(ported, key=str) == sorted(native, key=str)
