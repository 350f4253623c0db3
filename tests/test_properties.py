"""Property-based checks (hypothesis): the distributed implementations
of the two trickiest operators — as-of matching (union+window) and
gap-based sessionization (applyInPandas) — must agree with brute-force
single-machine references on arbitrary event streams, including
duplicate timestamps and single-event users."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from google_cloud_ecommerce_spark.operators import pandas_ops
from google_cloud_ecommerce_spark.queries import joins

T0 = datetime(2024, 3, 1)

event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # user_id
        st.integers(min_value=0, max_value=7200),         # seconds offset
        st.sampled_from(["view", "cart", "purchase"]),    # event_type
    ),
    min_size=1,
    max_size=25,
)


def _write_events(spark, tmpdir: str, rows) -> str:
    data = [
        (i, T0 + timedelta(seconds=sec), uid, et, 1.0, None)
        for i, (uid, sec, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    return tmpdir


def _brute_force_asof(rows):
    """O(n^2) reference: for each purchase, the latest view by the same
    user at or before it; ties on time -> highest event_id view wins."""
    events = [(i, sec, uid, et) for i, (uid, sec, et) in enumerate(rows)]
    out = {}
    for pid, p_sec, p_uid, p_et in events:
        if p_et != "purchase":
            continue
        candidates = [
            (sec, vid)
            for vid, sec, uid, et in events
            if et == "view" and uid == p_uid and sec <= p_sec
        ]
        out[pid] = max(candidates)[1] if candidates else None
    return out


@settings(max_examples=8, deadline=None)
@given(rows=event_strategy)
def test_asof_matches_brute_force(spark, tmp_path_factory, rows):
    sf = _write_events(spark, str(tmp_path_factory.mktemp("prop_asof")), rows)
    got = {
        r.purchase_event_id: r.view_event_id
        for r in joins.asof_purchase_view(spark, sf).collect()
    }
    assert got == _brute_force_asof(rows)


def _brute_force_sessions(rows, gap_s=1800):
    by_user: dict[int, list[int]] = {}
    for i, (uid, sec, _et) in enumerate(rows):
        by_user.setdefault(uid, []).append(sec)
    out = {}
    for uid, secs in by_user.items():
        secs.sort()
        n_sessions, max_len, cur = 1, 1, 1
        for a, b in zip(secs, secs[1:]):
            if b - a > gap_s:
                n_sessions += 1
                cur = 1
            else:
                cur += 1
            max_len = max(max_len, cur)
        out[uid] = (len(secs), n_sessions, max_len)
    return out


@settings(max_examples=8, deadline=None)
@given(rows=event_strategy)
def test_session_stats_matches_brute_force(spark, tmp_path_factory, rows):
    sf = _write_events(spark, str(tmp_path_factory.mktemp("prop_sess")), rows)
    got = {
        r.user_id: (r.n_events, r.n_sessions, r.max_session_events)
        for r in pandas_ops.session_stats_pandas(spark, sf).collect()
    }
    assert got == _brute_force_sessions(rows)
