"""Sessionization: gap-based session assignment over an event stream.

The classic web-analytics operator: events of one user belong to the same
session while consecutive gaps stay under ``gap_seconds``. Spark shape: one
window partitioned by the user key (parallel across users — the only
ordering ever required is WITHIN a user), a lag comparison marks session
starts, and a running sum converts marks into dense per-user session ids.
One shuffle on the user key; no global ordering anywhere. Skewed power
users are bounded by their own event counts (a per-user window, not a
global one); pathological single-user floods would be pre-split upstream by
day before sessionizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-event session assignment: adds ``session_id`` (1-based, dense per
    user).

    ``session_id`` is deterministic even without ``order_tiebreak``: events
    sharing a timestamp have pairwise gap 0 ≤ ``gap_seconds``, so whatever
    order the window visits them, none can open a session boundary and all
    land in the same session with the same running-sum value (r4 — the old
    nondeterminism warning here was wrong). Pass ``order_tiebreak`` (e.g.
    an event id) only if downstream logic additionally needs a reproducible
    intra-tie ROW order within the window."""
    order_cols = [F.col(ts_col)]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds)
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def streaming_session_stats(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`session_stats` on Spark's native gap-merge
    windows (``F.session_window``): state is per (user, open session) and a
    session CLOSES — and its row becomes final — once the watermark passes
    ``last_event + gap``, so late stragglers within the watermark still
    merge. Use append output mode with a file sink; complete mode replays
    all sessions each trigger (tests).

    Boundary semantics vs the batch lag form: ``session_window`` spans
    ``[start, last + gap)`` — an event arriving EXACTLY ``gap`` after the
    last one starts a new session, while the batch form's ``> gap``
    comparison keeps it. Sub-second-resolution data never hits the
    boundary; document which form defined any historical sessions before
    mixing outputs.
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("start_epoch"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("end_epoch"),
        )
        .select(
            user_col, "n_events", "start_epoch", "end_epoch",
            (F.col("end_epoch") - F.col("start_epoch")).alias("duration_s"),
        )
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per session: (user, session_id, n_events, start/end epoch
    seconds, duration). Built on :func:`sessionize`; the aggregation rides
    the same user-key shuffle."""
    s = sessionize(df, user_col, ts_col, order_tiebreak, gap_seconds)
    return (
        s.groupBy(F.col(user_col), F.col("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
            F.max(F.unix_timestamp(ts_col)).alias("end_epoch"),
        )
        .withColumn("duration_s", F.col("end_epoch") - F.col("start_epoch"))
    )
