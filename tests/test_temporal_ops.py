"""Generic temporal-operator API tests (operators/temporal.py): as-of join
and bucketized interval-overlap join on ad-hoc frames — edge shapes the
fixture-bound q_join_asof / q_join_interval keys don't reach (tolerance
bounds, forward direction, left how, multi-bucket spans, zero-length
intervals, pair uniqueness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_hadoop_consumer_spark.operators.temporal import (
    asof_join,
    interval_overlap_join,
)


def _quotes_and_trades(spark):
    quotes = spark.createDataFrame(
        [(1, "A", 100, 10.0), (2, "A", 200, 11.0), (3, "A", 200, 12.0),
         (4, "B", 150, 20.0)],
        "quote_id long, sym string, q_ts long, px double",
    )
    trades = spark.createDataFrame(
        [(10, "A", 90), (11, "A", 200), (12, "A", 500), (13, "B", 100),
         (14, "C", 100)],
        "trade_id long, sym string, t_ts long",
    )
    return quotes, trades


def test_asof_backward_picks_latest_at_or_before(spark):
    quotes, trades = _quotes_and_trades(spark)
    out = asof_join(
        trades, quotes, by="sym", left_ts="t_ts", right_ts="q_ts",
        left_key="trade_id", direction="backward", tie_break="quote_id",
    )
    got = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    # trade 10 (t=90): no quote at/before -> absent (inner)
    # trade 11 (t=200): quotes 2 and 3 tie at 200 -> max quote_id wins (3)
    # trade 12 (t=500): latest quote at 200 -> tie -> 3
    # trade 13 (B,t=100): no B quote at/before 100? quote 4 is at 150 -> absent
    assert got == {11: 3, 12: 3}


def test_asof_forward_with_tolerance_and_left_how(spark):
    quotes, trades = _quotes_and_trades(spark)
    out = asof_join(
        trades, quotes, by="sym", left_ts="t_ts", right_ts="q_ts",
        left_key="trade_id", direction="forward", tolerance=50,
        how="left", tie_break="quote_id",
    )
    got = {r["trade_id"]: r["quote_id"] for r in out.collect()}
    # every trade survives (left); forward within +50:
    # 10 (t=90) -> quote 1 (q_ts=100); 11 (t=200) -> tie at 200 -> min id (2)
    # 12 (t=500) -> none; 13 (B,t=100) -> quote 4 (150); 14 (C) -> none
    assert got == {10: 1, 11: 2, 12: None, 13: 4, 14: None}


def test_asof_rejects_bad_args(spark):
    quotes, trades = _quotes_and_trades(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, by="sym", left_ts="t_ts", right_ts="q_ts",
                  left_key="trade_id", direction="sideways")
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(trades, trades.withColumnRenamed("trade_id", "x"),
                  by="sym", left_ts="t_ts", right_ts="t_ts", left_key="x")


def _intervals(spark):
    # a-side: spans 0-3 buckets wide (bucket width 100), incl. zero-length
    a = spark.createDataFrame(
        [(1, 0, 50), (2, 90, 210), (3, 150, 150), (4, 380, 700), (5, 800, 801)],
        "a_id long, s long, e long",
    )
    # b-side: half-open windows
    b = spark.createDataFrame(
        [(10, 40, 100), (11, 100, 200), (12, 199, 420), (13, 900, 1000)],
        "b_id long, ws long, we long",
    )
    return a, b


def _naive_pairs(a, b):
    return {
        (r["a_id"], r["b_id"])
        for r in a.crossJoin(b)
        .where((F.col("s") < F.col("we")) & (F.col("e") >= F.col("ws")))
        .collect()
    }


@pytest.mark.parametrize("width", [10, 100, 1000])
def test_interval_join_matches_naive_theta_at_any_bucket_width(spark, width):
    a, b = _intervals(spark)
    got = [
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, a_start="s", a_end="e", b_start="ws", b_end="we",
            bucket_width=width,
        ).collect()
    ]
    # exactly the theta-join pairs, each exactly once (multi-bucket spans
    # must not duplicate)
    assert len(got) == len(set(got))
    assert set(got) == _naive_pairs(a, b)


def test_interval_join_rejects_column_collisions(spark):
    a, _ = _intervals(spark)
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(a, a, "s", "e", "s", "e", bucket_width=100)


def test_concurrency_day_boundary_end_edge_clamped(spark, tmp_path):
    """A session ending on a day's LAST microsecond must not leak its -1
    edge into the next day (where it has no +1 and no carry-in): before the
    clamp, day N+1's running sum started one low — undercounting its peak —
    and a day containing only stray -1 edges reported a NEGATIVE
    max_concurrent. Engine and oracle share the clamp, so also re-prove
    cross-engine parity on exactly this edge shape."""
    import duckdb
    from datetime import datetime

    from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES

    rows = [
        # session ending on day0's final microsecond (pre-fix: -1 at day1 00:00)
        (1, 1, datetime(2024, 1, 1, 23, 59, 59, 999999)),
        # lone day1 session (pre-fix: day1 peak reported 0, actual 1)
        (2, 2, datetime(2024, 1, 2, 0, 0, 10)),
        # session ending on day2's final microsecond with an empty day3
        # (pre-fix: day3 appeared with max_concurrent = -1)
        (3, 3, datetime(2024, 1, 3, 23, 59, 59, 999999)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        r["day_id"]: r["max_concurrent"]
        for r in QUERIES["q_time_concurrency"](spark, str(tmp_path)).collect()
    }
    day0 = datetime(2024, 1, 1).toordinal() - datetime(1970, 1, 1).toordinal()
    assert out == {day0: 1, day0 + 1: 1, day0 + 2: 1}
    assert all(v > 0 for v in out.values())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = {r[0]: r[1] for r in con.execute(ORACLES["q_time_concurrency"]).fetchall()}
    con.close()
    assert oracle == out


def test_attribution_semantics_on_synthetic_timeline(spark, tmp_path):
    """Known-answer check for q_win_attribution: a purchase credits the
    MOST RECENT prior touch (click beats the earlier view), a purchase
    with no touch inside 7 days is dropped, and an error event never
    gets credit even when it is the nearest prior event."""
    from datetime import datetime, timedelta

    from kafka_hadoop_consumer_spark.queries import QUERIES

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, 1, "view", t0),
        (2, 1, "click", t0 + timedelta(minutes=5)),
        (3, 1, "error", t0 + timedelta(minutes=6)),
        (4, 1, "purchase", t0 + timedelta(minutes=10)),   # -> click (2)
        (5, 1, "purchase", t0 + timedelta(days=8)),       # > 7d: dropped
        (6, 2, "purchase", t0),                           # no touch: dropped
        (7, 2, "view", t0 + timedelta(hours=1)),
        (8, 2, "purchase", t0 + timedelta(days=6)),       # -> view (7)
    ]
    df = spark.createDataFrame(
        [(i, u, ty, ts, 1.0) for i, u, ty, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp_ntz,"
        " value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["purchase_id"]: (r["touch_event_id"], r["touch_type"])
        for r in QUERIES["q_win_attribution"](spark, str(tmp_path)).collect()
    }
    assert got == {4: (2, "click"), 8: (7, "view")}


def test_changepoint_locates_planted_level_shift(spark, tmp_path):
    """Known-answer check for q_time_changepoint: a daily series that
    jumps from 1.0 to 5.0 after day 10 peaks its |CUSUM| exactly on the
    last pre-shift day."""
    from datetime import datetime, timedelta

    from kafka_hadoop_consumer_spark.queries import QUERIES

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(20):
        for k in range(3):  # 3 events/day so the daily mean is exact
            eid += 1
            rows.append(
                (eid, 1, "click", base + timedelta(days=day, hours=k),
                 1.0 if day < 10 else 5.0)
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp_ntz,"
        " value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QUERIES["q_time_changepoint"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    day0 = (base - datetime(1970, 1, 1)).days
    # mu = 3.0; cusum dips to -2*10 = -20 at the 10th day (last pre-shift)
    assert out[0]["cp_day"] == day0 + 9
    assert abs(out[0]["max_abs_cusum"] - 20.0) < 1e-9


def test_asof_nearest_exact_tie_prefers_earlier_view(spark):
    """direction='nearest' must measure distance in exact integer µs: at
    T = 2024-06-01T12:00:00.000003 with candidates at T ± 1.234567 s the
    epoch-seconds DOUBLE distances differ by one ulp (~0.24 µs) and rank
    the LATER candidate strictly closer, silently breaking the pinned
    earlier-wins tie (r9 review). Also pins boundary inclusion: a match
    at exactly `tolerance` seconds is kept."""
    from datetime import datetime, timedelta

    T = datetime(2024, 6, 1, 12, 0, 0, 3)
    D = timedelta(microseconds=1_234_567)
    left = spark.createDataFrame(
        [(1, "u", T), (2, "u", T + timedelta(hours=6))],
        "p_id long, k string, p_ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, "u", T - D),                       # earlier, tied
            (11, "u", T + D),                       # later, tied
            (20, "u", T + timedelta(hours=6 - 2)),  # exactly tolerance away
        ],
        "v_id long, k string, v_ts timestamp_ntz",
    )
    out = asof_join(
        left, right, by="k", left_ts="p_ts", right_ts="v_ts",
        left_key="p_id", direction="nearest", tolerance=7200,
        tie_break="v_id",
    )
    got = {r["p_id"]: r["v_id"] for r in out.collect()}
    assert got == {1: 10, 2: 20}


def test_concurrency_carry_in_peak_and_carry_only_days(spark, tmp_path):
    """Days inside a multi-day session must report its carry-in even with
    NO edges of their own (pre-fix: no row at all), and a day whose only
    edge is a carried-in session's -1 must count the day-START instant
    (pre-fix: carry_in + max(running) = 1 + (-1) = 0). Engine and oracle
    share the formula, so also re-prove cross-engine parity on exactly
    this shape (r9 review)."""
    import duckdb
    from datetime import datetime, timedelta

    from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES

    rows = []
    # user 1: one 30-min-cadence session from Jan 1 12:00 to Jan 4 02:00
    # (events every 20 min < the 30-min gap) -> days 2 and 3 are fully
    # inside it (carry-only, no edges); day 4 sees only its -1 edge
    t = datetime(2024, 1, 1, 12, 0, 0)
    end = datetime(2024, 1, 4, 2, 0, 0)
    eid = 0
    while t <= end:
        eid += 1
        rows.append((eid, 1, t))
        t += timedelta(minutes=20)
    # user 2: a lone event on Jan 4 at 01:00 -> its +1 must stack on top
    # of user 1's carry-in for a day-4 peak of 2
    rows.append((eid + 1, 2, datetime(2024, 1, 4, 1, 0, 0)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        r["day_id"]: r["max_concurrent"]
        for r in QUERIES["q_time_concurrency"](spark, str(tmp_path)).collect()
    }
    day0 = datetime(2024, 1, 1).toordinal() - datetime(1970, 1, 1).toordinal()
    assert out == {day0: 1, day0 + 1: 1, day0 + 2: 1, day0 + 3: 2}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r[1]
        for r in con.execute(ORACLES["q_time_concurrency"]).fetchall()
    }
    con.close()
    assert oracle == out


def test_zero_span_divisions_yield_null_on_both_engines(spark, tmp_path):
    """q_time_weighted_avg with a user whose events share one microsecond
    (sum(held_us) = 0) and q_time_sla_uptime with a single-event series
    (span_us = 0) must emit NULL for the divided metric on BOTH engines —
    pre-fix the ANSI '/' aborted the whole Spark query with
    DIVIDE_BY_ZERO while DuckDB returned a row (r9 review)."""
    import duckdb
    from datetime import datetime, timedelta

    from kafka_hadoop_consumer_spark.queries import ORACLES, QUERIES

    t0 = datetime(2024, 2, 1, 8, 0, 0)
    rows = [
        # user 7 / series "dup": two events at the SAME microsecond
        (1, 7, "dup", t0, 5.0),
        (2, 7, "dup", t0, 7.0),
        # user 8 / series "ok": a 10-second hold, then a 3-hour outage gap
        (3, 8, "ok", t0, 1.0),
        (4, 8, "ok", t0 + timedelta(seconds=10), 3.0),
        (5, 8, "ok", t0 + timedelta(hours=3, seconds=10), 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp_ntz,"
        " value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )

    twa = {
        r["user_id"]: r["time_weighted_avg"]
        for r in QUERIES["q_time_weighted_avg"](spark, str(tmp_path)).collect()
    }
    assert twa[7] is None  # zero span -> NULL, not a crash
    assert twa[8] is not None
    otwa = {
        r[0]: r[3]
        for r in con.execute(ORACLES["q_time_weighted_avg"]).fetchall()
    }
    assert otwa == twa

    up = {
        r["event_type"]: r["uptime_pct"]
        for r in QUERIES["q_time_sla_uptime"](spark, str(tmp_path)).collect()
    }
    assert up["dup"] is None  # zero span -> NULL
    # span 3h10s = 10810s, downtime 3h -> 1 - 10800/10810, rounded 6dp
    assert up["ok"] == 0.000925
    oup = {
        r[0]: r[5]
        for r in con.execute(ORACLES["q_time_sla_uptime"]).fetchall()
    }
    con.close()
    assert oup == up


def test_sessionize_refuses_colliding_columns(spark):
    # r11 ADVICE: the shared session-model helper must refuse input that
    # already carries its scratch names or the appended session_id —
    # withColumn would silently overwrite caller data otherwise.
    from kafka_hadoop_consumer_spark.queries.timeseries import sessionize

    base = spark.createDataFrame(
        [(1, 10, 100.0)], "event_id long, user_id long, value double"
    ).select("*", F.timestamp_seconds(F.lit(1)).alias("ts"))
    for bad in ("_tsu", "_prev_tsu", "session_id"):
        with pytest.raises(ValueError, match=bad):
            sessionize(base.withColumn(bad, F.lit(0)))
    # clean input still sessionizes (guard has no false positive)
    out = sessionize(base)
    assert out.columns == [*base.columns, "session_id"]
    assert out.select("session_id").first()[0] == 1
