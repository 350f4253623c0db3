"""transformWithStateInPandas (Spark 4's arbitrary-state successor to
applyInPandasWithState): per-user lifetime stats with ValueState.

ENVIRONMENT-GATED: the TWS Python runner speaks protobuf to the JVM
state server, and this container has no ``google.protobuf`` — the
whole module skips cleanly there and runs wherever protobuf exists.
The actively-tested custom-state operator in this repo remains
``streaming_session_state`` (applyInPandasWithState, oracle-checked).
"""

from __future__ import annotations

import shutil

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas requires protobuf (absent in container)",
)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: E402

from google_cloud_ecommerce_spark.catalog import load_table  # noqa: E402
from google_cloud_ecommerce_spark.streaming.jobs import _run_to_memory  # noqa: E402
from google_cloud_ecommerce_spark.streaming.replay import (  # noqa: E402
    read_replay_stream,
    write_replay_dir,
)


class UserStats(StatefulProcessor):
    """ValueState (n, cents): integer-cent accumulation is exact, so the
    final emitted row per user equals the batch decimal aggregate."""

    def init(self, handle):
        self._state = handle.getValueState("s", "n BIGINT, cents BIGINT")

    def handleInputRows(self, key, rows, timer_values):
        cur = self._state.get() if self._state.exists() else None
        n, cents = (cur[0], cur[1]) if cur else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += int(round(pdf["value"] * 10000).sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
        )

    def close(self):
        pass


def test_tws_user_stats_equal_batch(spark, sf_smoke):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    replay = write_replay_dir(spark, sf_smoke, n_files=4)
    try:
        stream = read_replay_stream(spark, replay)
        out = stream.groupBy("user_id").transformWithStateInPandas(
            UserStats(),
            "user_id bigint, n_events bigint, sum_cents bigint",
            "Update",
            "None",
        )
        res = _run_to_memory(out, "update")
        final = (
            res.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sum_cents")).alias("l"))
            .select(
                "user_id",
                F.col("l.n_events").alias("n_events"),
                (F.col("l.sum_cents") / 10000.0).alias("sum_value"),
            )
        )
        got = {r.user_id: (r.n_events, r.sum_value) for r in final.collect()}
        ev = load_table(spark, sf_smoke, "events")
        want = {
            r.user_id: (r.n, r.sv)
            for r in ev.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sv"),
            )
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(replay, ignore_errors=True)
