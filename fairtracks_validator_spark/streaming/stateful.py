"""Custom stateful streaming operator: cross-batch first-seen dedup.

``applyInPandasWithState`` is the Structured-Streaming surface for operators
whose state is not a windowed aggregate — here a streaming EXACT-DEDUP:
emit each content hash the first time it is seen across the whole stream,
suppress every later occurrence. This is the streaming twin of
``operators/dedup.py::exact_duplicates`` (and complements
``validate_stream.py``'s foreachBatch registry, which keeps its state in a
TABLE for seedability; this one keeps it in the state store for latency).

Scale shape: state is partitioned by a hash-prefix bucket key (256-4096
buckets → the shuffle key), each group's state holds only the digests seen
in that bucket — 16-byte-digest cardinality, never content. State growth is
linear in distinct content; ``ttl_minutes`` bounds it with a processing-time
TTL (``GroupStateTimeout.ProcessingTimeTimeout``): buckets idle past the TTL
drop their digest set, so re-occurrences after expiry re-emit — the standard
recall trade of TTL'd dedup state (VERDICT r2 #9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "id long, content_hash string"
STATE_SCHEMA = "hashes array<string>"


def _make_first_seen_fn(ttl_ms: int | None):
    def _first_seen_fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # bucket idle past its TTL: drop the digest set (bounded state);
            # later re-occurrences of these contents re-emit by design
            state.remove()
            yield pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "content_hash": pd.Series([], dtype="object")}
            )
            return

        seen = set(state.get[0]) if state.exists else set()
        ids, hashes = [], []
        for pdf in pdf_iter:
            for id_, h in zip(pdf["id"], pdf["content_hash"]):
                if h not in seen:
                    seen.add(h)
                    ids.append(int(id_))
                    hashes.append(h)
        if ids or not state.exists:
            # only rewrite state when the digest set actually changed — a
            # hot bucket receiving exclusively already-seen content would
            # otherwise re-sort and re-serialize its ENTIRE digest array
            # into the state store every trigger (write amplification
            # proportional to state size, not delta — code-review r4).
            # setTimeoutDuration below still refreshes the TTL either way.
            state.update((sorted(seen),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                            "content_hash": pd.Series(hashes, dtype="object")})

    return _first_seen_fn


def first_seen_stream(
    stream_df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    buckets_hex_chars: int = 2,
    ttl_minutes: float | None = None,
) -> DataFrame:
    """First occurrence of each distinct content value across the stream.

    Rows are keyed by an md5-prefix bucket (``16^buckets_hex_chars`` state
    groups — the shuffle key); within each group the state store carries the
    seen digest set. Later occurrences of the same content are dropped,
    intra-batch duplicates included (first row in batch order wins).

    ``ttl_minutes``: processing-time state TTL. ``None`` keeps state forever
    (exact dedup, state grows with distinct content); a finite TTL bounds
    state to the digests seen within the trailing window — the right setting
    for unbounded 100-TB streams where exactness beyond a horizon isn't
    required.

    availableNow caveat: with a TTL set, Spark's no-data micro-batches poll
    pending timeouts, which keeps an availableNow query alive indefinitely
    (each expiry-registering batch schedules another poll). For bounded
    catch-up runs set ``spark.sql.streaming.noDataMicroBatches.enabled=
    false`` — timeouts then fire during data batches, and the query
    terminates when the backlog is drained. Long-running (processing-time
    triggered) queries should leave the conf on: no-data batches are what
    make expiry prompt when traffic pauses.
    """
    keyed = stream_df.select(
        F.col(id_col).try_cast("long").alias("id"),
        F.md5(F.col(content_col)).alias("content_hash"),
    ).where(
        # a null id would reach pandas as NaN and int(NaN) kills the whole
        # streaming query (code-review r3); try_cast keeps non-castable ids
        # out via the same filter instead of an ANSI crash
        F.col("content_hash").isNotNull() & F.col("id").isNotNull()
    ).withColumn(
        "bucket", F.substring("content_hash", 1, buckets_hex_chars)
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_first_seen_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        # append: each emitted row is FINAL (a content hash is emitted at
        # most once per state lifetime) — which also keeps file sinks
        # (parquet) usable
        outputMode="append",
        timeoutConf=timeout,
    )
