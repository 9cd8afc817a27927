"""Event-stream operators over the ``events`` table.

The reference is batch-only (SURVEY §2.7: zero streaming operators); this
module adds the streaming surface a 100 TB pipeline needs. Each operator
exists twice:

- a *batch* form (runs on the parquet table, oracle-checkable), and
- for the windowed rollup, a *streaming* form (``readStream`` + watermark +
  window + memory sink) with identical semantics — tested in
  ``tests/test_streaming.py`` by asserting batch == streaming output.

Tumbling windows are epoch-aligned (`F.window(ts, '1 hour')` start ==
`date_trunc('hour', ts)`), which is what makes the batch/stream/oracle
triangle close.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..cachereg import cache_eager, materialize_local
from ..sources.loader import table

SESSION_GAP_SECONDS = 1800  # 30 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a proper TimestampType ``ts``.

    The driver's events.parquet stores TIMESTAMP(NANOS) which Spark 4
    refuses by default (PARQUET_TYPE_ILLEGAL). We read nanos as long
    (runtime conf, set here so any caller-provided session works) and
    convert to microseconds — the same truncation DuckDB applies
    internally, so both engines see identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = table(spark, sf_dir, "events")
    return _normalize_ts(ev)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Coerce ``ts`` to TimestampType (LTZ) regardless of how the driver's
    parquet encodes it: TIMESTAMP(NANOS) read as long (nanosAsLong), or
    TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ. The
    session timezone is UTC, so the NTZ→LTZ cast is instant-preserving;
    streaming watermarks require LTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)."""
    dt = dict(df.dtypes)["ts"]
    if dt in ("bigint", "long"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# tumbling-window rollup (batch form)


def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned hourly tumbling-window rollup (count, value sum, active users)."""
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "value_sum"
            ),
            F.countDistinct("user_id").alias("active_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
            "active_users",
        )
    )


ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS event_count,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum,
       count(DISTINCT user_id) AS active_users
FROM events
GROUP BY 1, 2
"""


_STAGE_ROOT: str | None = None


def _stage_root() -> str:
    """Per-process staging root under the system tmpdir (NOT the repo tree —
    a working-tree dir risks being swept up by repo-wide globs and pollutes
    ``git status``). mkdtemp gives each process its own dir, so concurrent
    sessions never race on a half-copied parquet file."""
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        import tempfile

        _STAGE_ROOT = tempfile.mkdtemp(prefix="sap_spark_stream_stage_")
    return _STAGE_ROOT


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table with the same ts normalization as
    the batch reader. File-stream sources require a directory, so a staging
    dir containing only events.parquet is materialized once (testdata dirs
    mix all tables in one directory)."""
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = table(spark, sf_dir, "events").schema
    stage = os.path.join(
        _stage_root(), os.path.basename(os.path.normpath(sf_dir))
    )
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "events.parquet")
    if not os.path.exists(dst):
        shutil.copy(os.path.join(sf_dir, "events.parquet"), dst)
    stream = spark.readStream.schema(schema).parquet(stage)
    return _normalize_ts(stream)


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str):
    """Streaming twin of q_events_hourly_rollup: parquet source ->
    watermark -> tumbling window -> memory sink. Returns the started query;
    caller drives it with processAllAvailable()."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "value_sum"
            ),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
            "approx_users",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_hourly_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# sessionization (lag-gap method)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-gap sessionization.

    Gap math is integer microseconds (``unix_micros`` here, ``epoch_us`` in
    the oracle, threshold 1800e6) — the data contains a real 1800.886 s
    inter-event gap, and double-seconds vs truncated-integer-seconds
    comparisons disagree on it. All three output aggregates are cast to
    BIGINT on both sides (DuckDB window SUM yields HUGEINT).
    """
    return sessionize_from(_events(spark, sf_dir))


def sessionize_from(ev: DataFrame) -> DataFrame:
    """Sessionize any (user_id, event_id, ts) relation — q_events_sessionize
    body, factored for property tests over generated event sets."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_new = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0),
    )
    with_sid = with_new.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    per_session = with_sid.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("events_in_session")
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_seq").cast("bigint").alias("session_count"),
        F.sum("events_in_session").cast("bigint").alias("total_events"),
        F.max("events_in_session").cast("bigint").alias("max_session_events"),
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS * 1_000_000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
per_session AS (
  SELECT user_id, session_seq, count(*) AS events_in_session
  FROM sid GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(session_seq) AS BIGINT) AS session_count,
       CAST(sum(events_in_session) AS BIGINT) AS total_events,
       CAST(max(events_in_session) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
"""


def q_events_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` twin of the lag-gap sessionize — Spark's
    built-in session windowing must agree with the algebraic rewrite
    row-for-row (same twin pattern as recursive_line_chain vs its fold).

    Boundary exactness: ``session_window`` merges an event into a session
    when ``next_ts <= prev_ts + gap`` (the session-end bound is INCLUSIVE —
    verified by the exact-boundary unit test), which is precisely the
    lag-gap form's "gap > threshold starts a new session" complement — so
    the gap duration is the SAME 1800 s, and the semantics are bit-equal
    at integer-microsecond granularity, not just same-on-this-data. Gate
    oracle is the SAME DuckDB statement the lag-gap query hashes against.

    Scale shape: one shuffle on user_id; Spark merges/sorts sessions
    within the partition (MergingSessionsExec) — no window-function
    carry-forward pass at all."""
    ev = _events(spark, sf_dir)
    sw = F.session_window(F.col("ts"), f"{SESSION_GAP_SECONDS} seconds")
    per_session = ev.groupBy("user_id", sw).agg(
        F.count(F.lit(1)).alias("events_in_session")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("session_count"),
        F.sum("events_in_session").cast("bigint").alias("total_events"),
        F.max("events_in_session").cast("bigint").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# CDC compaction: latest state per key
#
# The write-path twin of dedup_incremental's read path: treat the event log
# as a changelog and emit each user's CURRENT state (latest event wins) —
# the upsert/SCD1 compaction every incremental ingest runs before serving.
# ONE aggregation with map-side partial max over a (ts, event_id, payload)
# struct (lexicographic struct ordering IS the latest-by-ts-then-id rule) —
# no window, no row_number, no second shuffle; the oracle states the same
# rule with a window to prove plan-independence of the result.


def q_events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-state compaction: one partial-max struct aggregation per key (SCD1 upsert read)."""
    ev = _events(spark, sf_dir)
    latest = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    ).alias("s")
    return (
        ev.groupBy("user_id")
        .agg(latest, F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.event_id").alias("last_event_id"),
            F.col("s.event_type").alias("last_event_type"),
            F.date_format(F.col("s.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            "n_events",
        )
    )


ORACLE_EVENTS_LATEST_STATE = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       n_events
FROM ranked WHERE rn = 1
"""


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build from the changelog: one row per CONSECUTIVE run
    of a user's ``event_type`` with ``[valid_from, valid_to)`` interval
    columns — the slowly-changing-dimension type-2 table an ingest
    pipeline derives from the same events ``q_events_latest_state``
    compacts to SCD1.

    Gaps-and-islands: a change flag (event_type differs from the previous
    event) prefix-sums into a run id; runs aggregate to intervals;
    ``valid_to`` is the next run's start (NULL = current, flagged).
    Ties on ts break by event_id so the history is deterministic.

    Scale shape: ONE exchange on user_id — the change-flag and prefix-sum
    windows, the (user_id, run_id) aggregation (hash(user_id) clustering
    already satisfies the group-by's distribution — no second exchange),
    and the lead() window all reuse that partitioning; history length per
    user is bounded by that user's event count, so no skew beyond the
    event log's own."""
    return scd2_from(_events(spark, sf_dir))


def scd2_from(ev: DataFrame) -> DataFrame:
    """SCD2 build over any (user_id, event_id, ts, event_type) relation —
    q_events_scd2 body, factored for property tests on generated logs."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (F.col("event_type") != prev), 1).otherwise(0)
    runs = ev.withColumn("chg", chg).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),  # constant within a run
        F.min("ts").alias("vf"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = W.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(w_runs)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return per_run.withColumn("nxt", nxt).select(
        "user_id",
        F.col("run_id").cast("bigint").alias("version"),
        "event_type",
        F.date_format(F.col("vf"), fmt).alias("valid_from"),
        F.date_format(F.col("nxt"), fmt).alias("valid_to"),
        F.col("nxt").isNull().cast("int").alias("is_current"),
        "n_events",
    )


ORACLE_EVENTS_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR event_type <> lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, sum(chg) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS run_id FROM ordered
),
per_run AS (
  SELECT user_id, run_id, min(event_type) AS event_type,
         min(ts) AS vf, count(*) AS n_events
  FROM runs GROUP BY 1, 2
)
SELECT user_id,
       CAST(run_id AS BIGINT) AS version,
       event_type,
       strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(vf) OVER w2, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CAST(CASE WHEN lead(vf) OVER w2 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
       n_events
FROM per_run
WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
"""


def streaming_latest_state(spark: SparkSession, sf_dir: str):
    """Streaming twin of ``q_events_latest_state``: the changelog is a
    stream and the current-state table maintains itself — the same
    partial-max struct aggregation, running continuously in update mode
    (per-key state is ONE struct; no watermark because keyed state is the
    product, not a window). The standard streaming-upsert read path; at
    scale the sink is a foreachBatch MERGE instead of a memory table."""
    stream = _event_stream(spark, sf_dir)
    latest = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    ).alias("s")
    agg = (
        stream.groupBy("user_id")
        .agg(latest, F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.event_id").alias("last_event_id"),
            F.col("s.event_type").alias("last_event_type"),
            F.date_format(F.col("s.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("events_latest_state_stream")
        .start()
    )


def streaming_sessionize(spark: SparkSession, sf_dir: str):
    """Custom stateful streaming operator: per-user sessionization with
    ``applyInPandasWithState`` — the streaming twin of
    ``q_events_sessionize``. State per user = (last event time, session
    count, events in the open session, totals); each micro-batch folds its
    rows into that state in event-time order and emits the user's updated
    session summary.

    Scale posture: state is one tiny tuple per user key, partitioned by
    user_id across executors by the state store; the pandas fold is
    Arrow-batched. At 100 TB of events this is the standard shape — the
    only growth axis is distinct users, and a state TTL (GroupStateTimeout)
    would bound that; the test corpus replays a finite file so NoTimeout
    keeps it deterministic."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _event_stream(spark, sf_dir)

    out_schema = (
        "user_id long, session_count int, total_events long, max_session_events long"
    )
    state_schema = (
        "last_ts double, session_count int, cur_events long, total_events long, "
        "max_events long"
    )

    def fold(key, pdfs, state):
        if state.exists:
            last_ts, n_sessions, cur, total, mx = state.get
        else:
            last_ts, n_sessions, cur, total, mx = None, 0, 0, 0, 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for t in rows["ts"]:
            ts = t.value // 1000  # integer microseconds, same gap math as batch
            if last_ts is None or ts - last_ts > SESSION_GAP_SECONDS * 1_000_000:
                mx = max(mx, cur)
                n_sessions += 1
                cur = 1
            else:
                cur += 1
            total += 1
            last_ts = ts
        state.update((last_ts, n_sessions, cur, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_count": [n_sessions],
                "total_events": [total],
                "max_session_events": [max(mx, cur)],
            }
        )

    updated = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName("events_sessionize_stream")
        .start()
    )


def streaming_scd2(spark: SparkSession, sf_dir: str):
    """Streaming twin of ``q_events_scd2``: the SCD2 history table
    maintains itself as the changelog streams in. State per user = the
    COMPRESSED run list (event_type, first_ts_micros, n_events) — bounded
    by the number of type CHANGES, not events; each micro-batch folds its
    rows in (ts, event_id) order (within-user order across ordered-file
    replay matches the batch sort) and re-emits the user's history rows,
    last-writer-wins per (user_id, version) in the update-mode sink.

    Scale posture: same as the sessionize twin — keyed state in the state
    store, Arrow-batched pandas fold; run-list state is the SCD2-specific
    part and is exactly what an upsert MERGE into a dimension table needs
    per key."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _event_stream(spark, sf_dir)

    out_schema = (
        "user_id long, version long, event_type string, valid_from string, "
        "valid_to string, is_current int, n_events long"
    )
    # run list flattened into parallel arrays (state schema must be flat-ish)
    state_schema = "types array<string>, starts array<long>, counts array<long>"

    def fold(key, pdfs, state):
        if state.exists:
            types, starts, counts = (list(x) for x in state.get)
        else:
            types, starts, counts = [], [], []
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for t, typ in zip(rows["ts"], rows["event_type"]):
            us = t.value // 1000  # integer microseconds
            if types and types[-1] == typ:
                counts[-1] += 1
            else:
                types.append(typ)
                starts.append(us)
                counts.append(1)
        state.update((types, starts, counts))

        def fmt(us):
            return pd.Timestamp(us * 1000).strftime("%Y-%m-%d %H:%M:%S.%f")

        n = len(types)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * n,
                "version": list(range(1, n + 1)),
                "event_type": types,
                "valid_from": [fmt(s) for s in starts],
                "valid_to": [fmt(starts[i + 1]) if i + 1 < n else None for i in range(n)],
                "is_current": [0] * (n - 1) + [1],
                "n_events": counts,
            }
        )

    updated = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName("events_scd2_stream")
        .start()
    )


def streaming_session_native(spark: SparkSession, sf_dir: str):
    """Streaming twin of ``q_events_session_native``: the BUILT-IN
    ``session_window`` in a streaming aggregation — no custom state code at
    all (contrast with the two hand-rolled stateful twins above; this is
    the operator Spark itself maintains sessions with, RocksDB-backed on a
    cluster). Session-window streaming supports complete/append only
    (update raises STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION); complete
    mode + memory sink keeps the full session table, so the equivalence
    test folds it per user and must match the batch twin exactly."""
    stream = _event_stream(spark, sf_dir)
    sw = F.session_window(F.col("ts"), f"{SESSION_GAP_SECONDS} seconds")
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("events_in_session"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "events_in_session",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_session_native_stream")
        .start()
    )


def streaming_sessionize_tws(spark: SparkSession, sf_dir: str):
    """Sessionize twin on the MODERN stateful API (Spark 4
    ``transformWithStateInPandas``): same fold as the
    ``applyInPandasWithState`` twin above, expressed as a
    ``StatefulProcessor`` with a typed ValueState. Requires the RocksDB
    state store (the API's contract — state lives off-heap and scales past
    executor memory, which is exactly why the new API exists)."""
    import pandas as pd  # noqa: F811 - worker-side import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    gap_us = SESSION_GAP_SECONDS * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "sess",
                "last_ts long, session_count int, cur_events long, "
                "total_events long, max_events long",
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._state.exists():
                last_ts, n_sessions, cur, total, mx = self._state.get()
            else:
                last_ts, n_sessions, cur, total, mx = None, 0, 0, 0, 0
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                ts = t.value // 1000  # integer microseconds, batch-identical
                if last_ts is None or ts - last_ts > gap_us:
                    mx = max(mx, cur)
                    n_sessions += 1
                    cur = 1
                else:
                    cur += 1
                total += 1
                last_ts = ts
            self._state.update((last_ts, n_sessions, cur, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_count": [n_sessions],
                    "total_events": [total],
                    "max_session_events": [max(mx, cur)],
                }
            )

        def close(self) -> None:
            pass

    stream = _event_stream(spark, sf_dir)
    updated = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=(
            "user_id long, session_count int, total_events long, "
            "max_session_events long"
        ),
        outputMode="Update",
        timeMode="None",
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName("events_sessionize_tws")
        .start()
    )


# ---------------------------------------------------------------------------
# semi-structured props (JSON column)


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column with typed accessors."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(k).cast("bigint").alias("k_sum"),
            F.min(k).cast("bigint").alias("k_min"),
            F.max(k).cast("bigint").alias("k_max"),
        )
    )


def q_events_json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT lane twin of :func:`q_events_json_props`: props
    parses ONCE per row into the binary variant encoding
    (``try_parse_json``) and the typed accessor (``try_variant_get``)
    reads the value — at 100 TB this replaces per-access JSON string
    re-parsing with one decode plus O(1) typed reads. BOTH accessors are
    the ``try_`` forms so the lane stays total on malformed rows (parse
    failure -> null variant) AND on valid-JSON/wrong-type rows (e.g.
    ``{"k":[1,2]}`` or ``{"k":"abc"}`` -> null int), matching the string
    lane's ``get_json_object(...).cast('int')`` null-on-mismatch
    behavior. Identical aggregate contract and oracle as the string
    lane, so the gate proves the two extraction paths agree."""
    ev = _events(spark, sf_dir)
    k = F.try_variant_get(
        F.try_parse_json(F.col("props")), "$.k", "int"
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(k).cast("bigint").alias("k_sum"),
            F.min(k).cast("bigint").alias("k_min"),
            F.max(k).cast("bigint").alias("k_max"),
        )
    )


# every aggregate pinned to BIGINT: DuckDB sum(INT) is HUGEINT, whose value
# encoding the driver's hasher sees differently from Spark's BIGINT
ORACLE_EVENTS_JSON = """
SELECT event_type,
       count(*) AS event_count,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# streaming dedup: at-least-once delivery -> exactly-once counts
#
# The classic streaming-ingest problem: an upstream source redelivers
# events, and the pipeline must count each event once. Batch form is a
# COUNT(DISTINCT event_id); the streaming twin is dropDuplicates on the id
# before aggregating. The test stages the events file TWICE (simulated
# redelivery: the stream sees 2x rows) and asserts the deduped streaming
# counts equal the single-copy batch counts exactly.
#
# Scale note: plain dropDuplicates keeps one state entry per id forever; a
# production deployment bounds state with dropDuplicatesWithinWatermark
# (ids can only be redelivered within the watermark horizon). The unbounded
# form is used here because the replayed file's event times span the whole
# range — a watermark would classify the second delivery as late data and
# make the test nondeterministic across micro-batch boundaries.


def q_events_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once event counts under duplicate delivery (dedup by event_id)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_EVENTS_DEDUP = """
SELECT event_type,
       count(DISTINCT event_id) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def streaming_dedup_counts(spark: SparkSession, sf_dir: str, copies: int = 2):
    """Streaming twin of the n_events side of q_events_dedup_counts, fed
    ``copies`` deliveries of every event. Returns the started query; caller
    drives it with processAllAvailable() and reads the memory sink
    ``events_dedup_stream``."""
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = table(spark, sf_dir, "events").schema
    stage = os.path.join(
        _stage_root(), "dup_" + os.path.basename(os.path.normpath(sf_dir))
    )
    os.makedirs(stage, exist_ok=True)
    for i in range(copies):
        dst = os.path.join(stage, f"events_copy{i}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(sf_dir, "events.parquet"), dst)
    stream = _normalize_ts(spark.readStream.schema(schema).parquet(stage))
    agg = (
        stream.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_dedup_stream")
        .start()
    )


def streaming_dedup_counts_watermarked(
    spark: SparkSession, sf_dir: str, copies: int = 2, delay: str = "1 hour"
):
    """BOUNDED-STATE twin of :func:`streaming_dedup_counts`:
    ``dropDuplicatesWithinWatermark`` instead of ``dropDuplicates``.

    The plain operator keys state on event_id FOREVER — on an unbounded
    stream that state grows without limit, the memory failure mode of
    naive exactly-once dedup. The watermarked form evicts each key once
    the event-time watermark passes its timestamp + ``delay``, so state
    is bounded by (delay × arrival rate) at ANY stream length — the
    correct 100 TB/day posture when redelivery (at-least-once sources,
    producer retries) happens within a bounded window, which is the real
    redelivery profile. Correctness contract: duplicates arriving within
    ``delay`` of the original collapse exactly like the unbounded form —
    the twin test asserts count-equality with the batch distinct."""
    import os
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = table(spark, sf_dir, "events").schema
    stage = os.path.join(
        _stage_root(), "dupwm_" + os.path.basename(os.path.normpath(sf_dir))
    )
    os.makedirs(stage, exist_ok=True)
    for i in range(copies):
        dst = os.path.join(stage, f"events_copy{i}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(sf_dir, "events.parquet"), dst)
    stream = _normalize_ts(spark.readStream.schema(schema).parquet(stage))
    agg = (
        stream.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_dedup_wm_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# as-of join: each purchase matched to the user's most recent PRIOR click
#
# Spark has no native as-of join; the naive expression is an inequality join
# (events x events ON a.user=b.user AND b.ts <= a.ts), which plans as a
# per-user nested loop and dies at scale. The scalable re-expression: UNION
# the two event streams (they are already one table here), sort once within
# user partitions, and carry the last click forward with last(..., ignore
# nulls) — ONE shuffle on user_id, no join operator in the plan at all.
# Ordering is (ts, event_id) so ties are deterministic; a click at the same
# timestamp as the purchase counts as prior iff its event_id is smaller.
# Timestamps/gaps are integer microseconds (the sessionize convention).

ASOF_LEFT = "purchase"
ASOF_RIGHT = "click"


def q_events_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the user's most recent prior click (windowed carry-forward)."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin(ASOF_LEFT, ASOF_RIGHT)
    )
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    is_click = F.col("event_type") == ASOF_RIGHT
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("ts_us"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("prior_click_id"),
        F.last(F.when(is_click, us), ignorenulls=True)
        .over(w)
        .alias("prior_click_ts_us"),
    )
    return (
        enriched.filter(
            (F.col("event_type") == ASOF_LEFT) & F.col("prior_click_id").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "prior_click_id",
            (F.col("ts_us") - F.col("prior_click_ts_us")).alias("gap_us"),
        )
    )


ORACLE_EVENTS_ASOF = f"""
WITH t AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, ts
  FROM events WHERE event_type IN ('{ASOF_LEFT}', '{ASOF_RIGHT}')
),
w AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = '{ASOF_RIGHT}' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click_id,
         last_value(CASE WHEN event_type = '{ASOF_RIGHT}' THEN ts_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click_ts_us
  FROM t
)
SELECT event_id, user_id, ts_us, prior_click_id,
       ts_us - prior_click_ts_us AS gap_us
FROM w
WHERE event_type = '{ASOF_LEFT}' AND prior_click_id IS NOT NULL
"""


# ---------------------------------------------------------------------------
# attribution interval join: every purchase credited with the clicks in
# its trailing attribution window — the ad-tech click-attribution shape,
# and (in its streaming twin) the one Structured Streaming capability the
# suite didn't yet exercise: a STREAM-STREAM inner join with watermarks
# bounding both sides' state.

ATTR_WINDOW_DAYS = 7


def q_events_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many of the user's clicks fall inside the
    trailing {W}-day attribution window (purchases with none are dropped —
    inner-join semantics, matching the streaming twin).

    Scale shape: clicks ⋈ purchases is an equi-join on user_id with the
    interval predicate as the join residual — SMJ/shuffle on the user
    key, never an inequality-only nested loop; the per-purchase regroup
    rides the same key. Timestamps compare as exact integer microseconds
    (FLOATS.md class A; DuckDB epoch_us twin).

    The streaming twin (``streaming_attribution_join``) runs the SAME
    join as a watermarked stream-stream join, where the interval bound
    is what lets Spark expire join state: a click older than the
    watermark minus the window can never match a future purchase.
    ``tests/test_streaming.py``-style stream==batch equality is pinned in
    ``tests/test_round6_ops.py``."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    win_us = ATTR_WINDOW_DAYS * 86_400 * 1_000_000
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), us.alias("c_ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        us.alias("p_ts_us"),
    )
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts_us") <= F.col("p_ts_us"))
        & (F.col("c_ts_us") >= F.col("p_ts_us") - F.lit(win_us)),
    )
    return (
        joined.groupBy("purchase_id", "p_user")
        .agg(F.count(F.lit(1)).alias("n_attr_clicks"))
        .select(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            "n_attr_clicks",
        )
        .orderBy("purchase_id")
    )


ORACLE_EVENTS_ATTRIBUTION = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
SELECT p.event_id AS purchase_id,
       p.user_id,
       count(*) AS n_attr_clicks
FROM e p JOIN e c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts_us <= p.ts_us
 AND c.ts_us >= p.ts_us - CAST({ATTR_WINDOW_DAYS} AS BIGINT) * 86400 * 1000000
GROUP BY 1, 2
ORDER BY 1
"""


def streaming_attribution_join(spark: SparkSession, sf_dir: str):
    """Stream-stream twin of q_events_attribution_window's JOIN stage: two
    watermarked streams (clicks, purchases) interval-joined; the memory
    sink collects the matched pairs in append mode. Watermarks + the
    interval bound let Spark expire click state older than
    watermark - window and purchase state at the watermark — bounded
    state at any stream length, the property the batch docstring claims.
    Returns the started query; caller drives processAllAvailable() and
    reads sink ``events_attr_stream``."""
    stream = _event_stream(spark, sf_dir)
    wm = f"{ATTR_WINDOW_DAYS + 1} days"
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", wm)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", wm)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"c_user = p_user AND c_ts <= p_ts "
            f"AND c_ts >= p_ts - INTERVAL {ATTR_WINDOW_DAYS} DAYS"
        ),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("c_ts").alias("c_ts_us"),
    )
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("events_attr_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# conversion funnel: signup -> later click -> later purchase, per user
#
# Three chained windows over the SAME (user_id) partitioning — Spark plans
# one exchange and reuses the sort for all three — then a tiny global
# aggregate of per-user flags. No joins, no self-unions: at 100 TB the
# funnel costs one shuffle of the filtered event stream.


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered click->view->purchase funnel per user via chained windows."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    us = F.unix_micros(F.col("ts"))
    pw = W.partitionBy("user_id")
    step = ev.select(
        "user_id",
        "event_type",
        us.alias("ts_us"),
        F.min(F.when(F.col("event_type") == "signup", us)).over(pw).alias("s_ts"),
    )
    step = step.withColumn(
        "c_ts",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts_us") > F.col("s_ts")), F.col("ts_us"))
        ).over(pw),
    )
    step = step.withColumn(
        "p_ts",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("c_ts")), F.col("ts_us"))
        ).over(pw),
    )
    per_user = step.groupBy("user_id").agg(
        F.max(F.col("s_ts").isNotNull().cast("int")).alias("did_signup"),
        F.max(F.col("c_ts").isNotNull().cast("int")).alias("did_click_after"),
        F.max(F.col("p_ts").isNotNull().cast("int")).alias("did_purchase_after"),
    )
    return per_user.agg(
        F.sum("did_signup").cast("bigint").alias("n_signup"),
        F.sum("did_click_after").cast("bigint").alias("n_click_after_signup"),
        F.sum("did_purchase_after").cast("bigint").alias("n_purchase_after_click"),
    )


ORACLE_EVENTS_FUNNEL = """
WITH t AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('signup', 'click', 'purchase')
),
s AS (
  SELECT *, min(CASE WHEN event_type = 'signup' THEN ts_us END)
              OVER (PARTITION BY user_id) AS s_ts
  FROM t
),
c AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > s_ts THEN ts_us END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM s
),
p AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > c_ts THEN ts_us END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM c
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN s_ts IS NOT NULL THEN 1 ELSE 0 END) AS did_signup,
         max(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS did_click_after,
         max(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS did_purchase_after
  FROM p GROUP BY user_id
)
SELECT CAST(sum(did_signup) AS BIGINT) AS n_signup,
       CAST(sum(did_click_after) AS BIGINT) AS n_click_after_signup,
       CAST(sum(did_purchase_after) AS BIGINT) AS n_purchase_after_click
FROM per_user
"""


# ---------------------------------------------------------------------------
# multi-resolution rollup: daily aggregates REUSING hourly partials
#
# The hypertable / continuous-aggregate pattern: coarser resolutions fold
# the finer resolution's partial aggregates instead of re-scanning raw
# events. Here the daily rollup consumes the hourly (hour, type) partials —
# sums are associative (counts BIGINT, money DECIMAL), so re-aggregating
# partials is EXACTLY equal to a direct daily pass, which is what the
# DuckDB oracle computes from raw events. countDistinct deliberately stays
# out of this query: distincts don't merge across partials (that needs a
# sketch — HLL/theta — with its own error contract).
#
# At 100 TB the hourly relation is the materialized continuous aggregate
# (one row per hour x type); the daily view reads ~24 rows per output row
# instead of millions of raw events — that reuse is the entire point.


def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day (cohort),
    counted per days-since-first-seen offset — the (cohort x offset)
    matrix in long form, plus the retention rate against cohort size.

    Scale shape: first-seen is one user-keyed aggregation; the offset
    tagging joins the (user, first_day) relation back onto the per-user
    days WITHOUT a broadcast hint — `first` is user-cardinality (a fact
    relation at 100 TB; a forced broadcast would OOM executors), and both
    sides are already partitioned by user_id from the distinct/groupBy,
    so the join reuses the same exchange (AQE still flips to broadcast
    when the relation is genuinely small); the matrix is one
    (cohort, offset) regroup of per-user-day partials. Rate = exact
    integer pair divided once at the output boundary."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    tagged = days.join(first, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    return (
        tagged.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format(F.col("cohort_day"), "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "active_users",
            "cohort_users",
            F.round(F.col("active_users") / F.col("cohort_users"), 4).alias(
                "retention"
            ),
        )
    )


ORACLE_EVENTS_RETENTION = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
),
sizes AS (
  SELECT cohort_day, count(*) AS cohort_users FROM first GROUP BY cohort_day
),
mat AS (
  SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
         count(DISTINCT d.user_id) AS active_users
  FROM days d JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(m.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS INT) AS day_offset,
       active_users,
       cohort_users,
       round(active_users * 1.0 / cohort_users, 4) AS retention
FROM mat m JOIN sizes USING (cohort_day)
"""


def q_events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration report: how unevenly event volume is spread
    over users — top-1%/top-10% shares and the exact Gini coefficient.
    The skew early-warning for any user-keyed operator: a Gini near 1
    means a handful of hot keys will dominate every user-partitioned
    shuffle (sessionize, SCD2, rolling features) and salting is due.

    Exactness: users are ranked by (count desc, user_id) via
    ``with_global_rank`` over the ALREADY-AGGREGATED per-user relation
    (orders of magnitude smaller than the stream); the Gini is the
    integer weighted sum sum((2*rank - n - 1) * c_i) over the ascending
    order — computed entirely in BIGINT and divided once at the output.
    Top-k shares are integer sums over rank prefixes."""
    from ..operators.ranks import with_global_rank

    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    # ascending rank (smallest counts first) for the canonical Gini form
    ranked = with_global_rank(per_user, "c", "user_id")
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum((2 * F.col("rn") - 1) * F.col("c")).cast("bigint").alias("wsum"),
    ).first()
    n, total, wsum = int(stats["n_users"]), int(stats["n_events"]), int(stats["wsum"])
    # gini = (2*sum(i*c_i) - (n+1)*total) / (n*total) with ascending ranks
    # floor-quantize every emitted float: Python round() is half-even,
    # DuckDB's is half-away — floor agrees everywhere
    gini = math.floor((wsum - n * total) / (n * total) * 1e6) / 1e6 if n * total else 0.0
    top1_n = max(1, n // 100)
    top10_n = max(1, n // 10)
    shares = ranked.agg(
        F.sum(F.when(F.col("rn") > n - top1_n, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("top1"),
        F.sum(F.when(F.col("rn") > n - top10_n, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("top10"),
    ).first()
    return spark.createDataFrame(
        [
            (
                n,
                total,
                float(gini),
                int(shares["top1"]),
                math.floor(int(shares["top1"]) / total * 1e4) / 1e4,
                int(shares["top10"]),
                math.floor(int(shares["top10"]) / total * 1e4) / 1e4,
            )
        ],
        "n_users long, n_events long, gini double, top1pct_events long, "
        "top1pct_share double, top10pct_events long, top10pct_share double",
    )


def _oracle_power_users() -> str:
    return """
WITH per_user AS (
  SELECT user_id, count(*) AS c FROM events GROUP BY user_id
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c, user_id) AS rn FROM per_user
),
g AS (
  SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS total,
         CAST(sum((2 * rn - 1) * c) AS BIGINT) AS wsum
  FROM ranked
)
SELECT n AS n_users,
       total AS n_events,
       floor((wsum - n * total) * 1.0 / (n * total) * 1000000) / 1000000 AS gini,
       (SELECT CAST(sum(c) AS BIGINT) FROM ranked, g WHERE rn > n - greatest(1, n // 100)) AS top1pct_events,
       floor((SELECT sum(c) FROM ranked, g WHERE rn > n - greatest(1, n // 100)) * 1.0 / total * 10000) / 10000 AS top1pct_share,
       (SELECT CAST(sum(c) AS BIGINT) FROM ranked, g WHERE rn > n - greatest(1, n // 10)) AS top10pct_events,
       floor((SELECT sum(c) FROM ranked, g WHERE rn > n - greatest(1, n // 10)) * 1.0 / total * 10000) / 10000 AS top10pct_share
FROM g
"""


ORACLE_EVENTS_POWER_USERS = _oracle_power_users()


ANOMALY_TRAIL_HOURS = 24  # trailing baseline for the hourly z-score
ANOMALY_Z = 3.0  # |z| >= 3 flags


def q_events_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each hour's event count scored against
    the trailing ``ANOMALY_TRAIL_HOURS``-hour baseline (mean/std of the
    PRECEDING hours — the current hour never contaminates its own
    baseline), flagged at |z| >= 3. The monitoring query a pipeline runs
    over its own ingest volumes.

    Exactness: the window carries integer sum and sum-of-squares of
    counts; z derives from those integers in one closed-form float
    expression — ``(n*c - s) / sqrt(n*ssq - s*s)`` times sqrt(n) —
    identical on both engines (no accumulated float state). Hours with
    an undefined baseline (fewer than 2 trailing hours, or zero
    variance) emit NULL z and no flag, stated identically in the oracle.

    Scale shape: the full-volume work is ONE hourly aggregation; the
    z-window then runs over the already-aggregated hours relation
    (tiny — one row per hour), so the unpartitioned ROWS window is a
    metadata-scale sort, not a data cliff. (c^2 sums wrap BIGINT past
    ~3e9 events/hour — at that volume compute ssq in DECIMAL(38,0) on
    both engines, the quantity_price_corr headroom move.)"""
    ev = _events(spark, sf_dir)
    hours = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        W.orderBy("hour")
        .rowsBetween(-ANOMALY_TRAIL_HOURS, -1)
    )
    n = F.count(F.lit(1)).over(w).cast("bigint")
    s = F.sum("c").over(w).cast("bigint")
    ssq = F.sum(F.col("c") * F.col("c")).over(w).cast("bigint")
    # z = (c - s/n) / sqrt((ssq - s^2/n)/n) == (n*c - s) / sqrt(n*ssq - s*s)
    num = (n * F.col("c") - s).cast("double")
    den = F.sqrt((n * ssq - s * s).cast("double"))
    var_num = n * ssq - s * s
    z = F.when((n >= 2) & (var_num > 0), F.round(num / den, 4))
    flag = (
        F.when((n >= 2) & (var_num > 0), F.abs(z) >= ANOMALY_Z)
        .when((n >= 2) & (var_num == 0), n * F.col("c") != s)
        .otherwise(F.lit(False))
    )
    return (
        hours.select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("c").alias("event_count"),
            n.alias("baseline_hours"),
            z.alias("z_score"),
            flag.cast("int").alias("is_anomaly"),
        )
    )


ORACLE_EVENTS_ANOMALY = f"""
WITH hours AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS c
  FROM events GROUP BY 1
),
win AS (
  SELECT hour, c,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(c) OVER w AS BIGINT) AS s,
         CAST(sum(c * c) OVER w AS BIGINT) AS ssq
  FROM hours
  WINDOW w AS (ORDER BY hour ROWS BETWEEN {ANOMALY_TRAIL_HOURS} PRECEDING AND 1 PRECEDING)
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       c AS event_count,
       n AS baseline_hours,
       CASE WHEN n >= 2 AND n * ssq - s * s > 0
            THEN round((n * c - s) * 1.0 / sqrt(CAST(n * ssq - s * s AS DOUBLE)), 4)
       END AS z_score,
       CAST(CASE
            WHEN n >= 2 AND n * ssq - s * s > 0 THEN
              abs(round((n * c - s) * 1.0 / sqrt(CAST(n * ssq - s * s AS DOUBLE)), 4)) >= {ANOMALY_Z}
            WHEN n >= 2 AND n * ssq - s * s = 0 THEN n * c <> s
            ELSE FALSE END AS INT) AS is_anomaly
FROM win
"""


ACTIVE_WINDOW_DAYS = 7  # trailing window for the rolling-active metric


def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day distinct active users (the DAU/WAU family).

    COUNT(DISTINCT) over a sliding RANGE window is not expressible as a
    window function (Spark and most engines reject it), so the rolling
    metric uses compaction + anchor fan-out: the event stream first
    compacts to distinct (day, user) — the only full-volume aggregation —
    then each user-day EXPLODES to the <= W anchor days whose trailing
    window contains it (a bounded W-fold map, no join predicate at all),
    and a second distinct count per anchor day finishes it. Anchors keep
    only days that actually occur (broadcast equi-join with the DAU
    relation). At 100 TB the compacted user-day relation is orders of
    magnitude smaller than the stream, which is what makes the W-fold
    fan-out affordable; there is no non-equi join anywhere in the plan.
    The oracle states the identical fan-out."""
    ev = _events(spark, sf_dir)
    user_days = ev.select(
        F.to_date(F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = user_days.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    anchors = user_days.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {ACTIVE_WINDOW_DAYS - 1}), interval 1 day)"
            )
        ).alias("day"),
    )
    rolling = anchors.groupBy("day").agg(
        F.countDistinct("user_id").alias(f"wau_{ACTIVE_WINDOW_DAYS}d")
    )
    return (
        dau.join(F.broadcast(rolling), "day")
        .select(
            F.date_format(F.col("day"), "yyyy-MM-dd").alias("day"),
            "dau",
            f"wau_{ACTIVE_WINDOW_DAYS}d",
        )
    )


ORACLE_EVENTS_ACTIVE_USERS = f"""
WITH user_days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM user_days),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM user_days GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau_{ACTIVE_WINDOW_DAYS}d
  FROM days d JOIN user_days u
    ON u.day <= d.day AND u.day >= d.day - {ACTIVE_WINDOW_DAYS - 1}
  GROUP BY d.day
)
SELECT strftime(day, '%Y-%m-%d') AS day, dau, wau_{ACTIVE_WINDOW_DAYS}d
FROM dau JOIN wau USING (day)
"""


def q_events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup folding hourly partials — the continuous-aggregate pattern."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("h")).alias("d"), F.col("event_type"))
        .agg(
            F.sum("cnt").alias("event_count"),
            F.round(F.sum("vsum").cast("double"), 2).alias("value_sum"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


ORACLE_EVENTS_DAILY = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
       event_type,
       count(*) AS event_count,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS value_sum
FROM events
GROUP BY 1, 2
"""


def streaming_daily_rollup(spark: SparkSession, sf_dir: str):
    """Streaming twin of q_events_daily_rollup: day tumbling window with a
    1-day watermark. In production this would be the SECOND tier of a
    cascaded continuous aggregate (hourly stream feeding a daily fold);
    Structured Streaming can't chain two streaming aggregations in one
    query, so the daily tier re-windows the source — semantically equal
    because tumbling day windows partition events exactly like folding
    their hour partials."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window(F.col("ts"), "1 day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_daily_stream")
        .start()
    )


def streaming_rollup_to_table(spark: SparkSession, sf_dir: str, out_dir: str):
    """Streaming hourly rollup written to a PARQUET TABLE via foreachBatch —
    the production sink shape (the memory sink above is test-only).

    Idempotence: each micro-batch's rows REPLACE their hour partitions
    (dynamic partition overwrite) instead of appending, so a replayed batch
    (failure/restart) converges to the same table — the standard
    exactly-once-effect recipe for file sinks when the aggregation is in
    complete mode. Partitioning by the window hour keeps each overwrite
    surgical: only the partitions present in the batch rewrite."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd-HH").alias("hour_part"),
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "event_count",
            "value_sum",
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour_part")
            .parquet(out_dir)
        )

    return (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )


def streaming_ivm_daily_rollup(
    spark: SparkSession, drop_dir: str, out_dir: str, delay: str = "1 day"
):
    """Incremental-view-maintenance twin of ``q_rollup_incremental_merge``:
    the daily rollup maintained as a STREAM of delta merges instead of a
    single base+delta fold. Update output mode emits only the (day, type)
    keys whose running totals changed in the micro-batch, and foreachBatch
    rewrites exactly those partitions (dynamic partition overwrite keyed
    by day/event_type) — every other partition of the materialized rollup
    is untouched, byte-for-byte (the twin test pins this via file mtimes).

    This is the gated batch query's claim generalized from one delta to
    many: each micro-batch is a delta, the sink is the materialized base,
    and convergence to the full recompute is asserted by the twin test
    (crash-replay included — a replayed epoch re-emits the same running
    totals from checkpointed state, and re-overwriting a partition with
    identical rows is idempotent).

    At 100 TB the complete-mode twin above (rewrite the whole aggregate
    each batch) stops being viable; THIS shape — update-mode emission +
    surgical partition merge — is the production continuous-aggregate
    path. Integer cents (DECIMAL(18,2) * 100 AS BIGINT) keep the merged
    table exactly reconcilable against the batch leg."""
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .json(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window(F.col("ts"), "1 day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            )
            .cast("bigint")
            .alias("cents"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "cents",
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "event_type")
            .parquet(out_dir)
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )


def streaming_anomaly_to_table(spark: SparkSession, sf_dir: str, out_dir: str):
    """Self-maintaining anomaly table via foreachBatch: the monitoring
    query ``q_events_anomaly_hours`` needs a cross-hour trailing window,
    which no streaming aggregation expresses — so each micro-batch
    RECOMPUTES the full anomaly table from the hourly-count streaming
    aggregation's current state and overwrites the output atomically
    (write to a temp dir would be the cluster move; locally a plain
    overwrite of the tiny hours-level table). This is the materialized-
    view-maintenance recipe for derived tables whose definition spans the
    whole history: the STREAM maintains the cheap aggregate, foreachBatch
    derives the expensive view from it — replay-idempotent because the
    derivation is deterministic in the aggregate state."""
    stream = _event_stream(spark, sf_dir)
    hours = (
        stream.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = (
            W.orderBy("hour")
            .rowsBetween(-ANOMALY_TRAIL_HOURS, -1)
        )
        n = F.count(F.lit(1)).over(w).cast("bigint")
        s = F.sum("c").over(w).cast("bigint")
        ssq = F.sum(F.col("c") * F.col("c")).over(w).cast("bigint")
        num = (n * F.col("c") - s).cast("double")
        den = F.sqrt((n * ssq - s * s).cast("double"))
        var_num = n * ssq - s * s
        z = F.when((n >= 2) & (var_num > 0), F.round(num / den, 4))
        flag = (
            F.when((n >= 2) & (var_num > 0), F.abs(z) >= ANOMALY_Z)
            .when((n >= 2) & (var_num == 0), n * F.col("c") != s)
            .otherwise(F.lit(False))
        )
        (
            batch_df.select(
                F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                F.col("c").alias("event_count"),
                n.alias("baseline_hours"),
                z.alias("z_score"),
                flag.cast("int").alias("is_anomaly"),
            )
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    return (
        hours.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )


# ---------------------------------------------------------------------------
# range-frame rolling feature: per-event trailing-hour activity count
#
# RANGE BETWEEN (value-based frames) is the window variant the rest of the
# suite doesn't cover: the frame is defined by the ORDER BY value (event
# time), not row offsets, so bursts and gaps size the frame correctly.
# Integer-microsecond ordering keys both engines agree on (the same
# unix_micros/epoch_us bridge the sessionizer uses). One shuffle keyed on
# user_id; the frame scan is a per-partition sliding aggregate.


def q_events_user_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing RANGE-frame rolling aggregates over event time."""
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
    )


ORACLE_EVENTS_ROLLING = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_trailing_hour
FROM events
"""


# ---------------------------------------------------------------------------
# late-data semantics twin: append-mode windowed rollup over a drop folder


def streaming_late_rollup(
    spark: SparkSession, drop_dir: str, out_dir: str, delay: str = "30 minutes"
):
    """Append-mode hourly rollup over a JSONL drop folder — the twin that
    PINS watermark late-data semantics, which `complete`-mode twins never
    exercise: a window emits exactly once, when the watermark passes its
    end, and a row arriving after the watermark has passed its window is
    DROPPED (visible both in the emitted counts and in the state
    operator's ``numRowsDroppedByWatermark`` metric), while a late row
    still inside the watermark bound updates its open window.

    This is the memory contract a 100 TB stream lives by: the watermark
    is what bounds state (windows older than it are evicted after
    emission), so the drop is the price of bounded memory — the test
    asserts both sides of that trade."""
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .json(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window(F.col("ts"), "1 hour"))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_count",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )


# ---------------------------------------------------------------------------
# Markov transition matrix: the product-analytics "what happens next"
# operator. Consecutive same-user events inside the session gap form a
# (from, to) transition; the matrix rows are permille-normalized so the
# output is a first-order Markov chain estimate over event types.


def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition matrix, permille-normalized.

    A transition is a consecutive event pair of one user no more than
    SESSION_GAP_SECONDS apart (the same gap rule as the sessionize lane,
    so "within session" means the same thing in both). p_permille is
    integer row-normalized: n * 1000 DIV row-total per from_type.

    Scale shape: one user-keyed sort window for the lag (the exchange
    every sessionization already pays), then a 25-row aggregate; the
    permille window runs on the matrix relation, not the event stream."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(F.col("prev_type").isNotNull() & (F.col("gap_us") <= gap_us))
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_row = W.partitionBy("from_type")
    return (
        trans.withColumn("row_total", F.sum("n").over(w_row))
        .selectExpr(
            "from_type",
            "to_type",
            "n",
            "CAST(n * 1000 DIV row_total AS BIGINT) AS p_permille",
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_TRANSITION_MATRIX = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
  FROM seq
  WHERE prev_type IS NOT NULL AND gap_us <= {SESSION_GAP_SECONDS * 1_000_000}
  GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS p_permille
FROM trans
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# snapshot drift reconciliation: the CDC audit between two as-of states.
# events_latest_state materializes ONE state; operations teams reconcile
# TWO (yesterday's handoff vs today's) to prove the pipeline only changed
# what the source changed. Both as-of states come out of a SINGLE scan +
# SINGLE shuffle via filtered max_by aggregates.

DRIFT_T1 = "2024-01-10 00:00:00"
DRIFT_T2 = "2024-01-20 00:00:00"


def q_events_state_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user latest-state drift between the T1 and T2 snapshots.

    drift_class: 'added' (user first seen after T1), 'changed' (latest
    event_type differs), 'unchanged'. Both states are filtered
    ``max_by(event_type, (ts, event_id))`` aggregates in ONE groupBy —
    one scan, one exchange, no self-join of two window passes. The
    (ts, event_id) ordering struct makes the argmax tie-free.

    Scale shape at 100 TB: this is the idiomatic two-snapshot reconcile —
    a CDC table would partition by ingest date and the T2 filter prunes
    partitions; the per-user state fits the same shuffle any latest-state
    query pays."""
    ev = _events(spark, sf_dir)
    states = (
        ev.filter(F.col("ts") <= F.lit(DRIFT_T2).cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.expr(
                f"max_by(event_type, struct(ts, event_id)) "
                f"FILTER (WHERE ts <= TIMESTAMP '{DRIFT_T1}')"
            ).alias("type_t1"),
            F.expr("max_by(event_type, struct(ts, event_id))").alias(
                "type_t2"
            ),
        )
    )
    return (
        states.withColumn(
            "drift_class",
            F.when(F.col("type_t1").isNull(), "added")
            .when(F.col("type_t1") != F.col("type_t2"), "changed")
            .otherwise("unchanged"),
        )
        .groupBy("drift_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("min_user_id"),
            F.max("user_id").cast("bigint").alias("max_user_id"),
        )
        .orderBy("drift_class")
    )


ORACLE_STATE_DRIFT = f"""
WITH states AS (
  SELECT user_id,
         (max(struct_pack(ts := ts, eid := event_id, et := event_type))
            FILTER (WHERE ts <= TIMESTAMP '{DRIFT_T1}')).et AS type_t1,
         (max(struct_pack(ts := ts, eid := event_id, et := event_type))).et
           AS type_t2
  FROM events
  WHERE ts <= TIMESTAMP '{DRIFT_T2}'
  GROUP BY 1
)
SELECT CASE WHEN type_t1 IS NULL THEN 'added'
            WHEN type_t1 != type_t2 THEN 'changed'
            ELSE 'unchanged' END AS drift_class,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(user_id) AS BIGINT) AS min_user_id,
       CAST(max(user_id) AS BIGINT) AS max_user_id
FROM states
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# chi-square goodness-of-fit: is hourly traffic uniform? The exact-integer
# companion to the Benford screen (dq_benford_amounts) — chi2 against the
# uniform expectation is a pure rational:
#   chi2 = sum_h (obs_h - T/24)^2 / (T/24) = sum_h (24*obs_h - T)^2 / (24*T)
# so chi2_micro = [sum_h (24*obs_h - T)^2] * 1e6 DIV (24*T) is BIGINT end
# to end, and the 0.05 critical-value verdict is an integer compare.

CHI2_CRIT_MICRO_DF23 = 35_172_462  # chi2_0.95 at df=23, in 1e-6 units


def q_events_hour_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity test of events per hour-of-day (df = 23).

    All 24 cells are guaranteed present by construction only when every
    hour has traffic; missing hours contribute (0 - T/24)^2 like any
    other cell because the spine is the literal 0..23 sequence, not the
    observed hours (a missing hour is exactly the anomaly the test must
    see, so the spine can't come from the data).

    Scale shape: one 24-group aggregation over a single pruned scan,
    left-joined onto a generated 24-row spine; everything after the
    aggregate is constant-size."""
    ev = _events(spark, sf_dir)
    obs = ev.groupBy(F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).alias("obs")
    )
    spine = spark.range(24).select(F.col("id").cast("int").alias("h"))
    cells = spine.join(F.broadcast(obs), "h", "left").select(
        "h", F.coalesce(F.col("obs"), F.lit(0)).cast("bigint").alias("obs")
    )
    return (
        cells.agg(
            F.sum("obs").alias("t"),
            F.count(F.lit(1)).alias("_k"),
            # DECIMAL(38,0) sufficient statistic: obs^2 and the chi2
            # numerator below need the oracle's HUGEINT headroom — a
            # BIGINT (24*ss - t*t)*1e6 wraps silently (non-ANSI) past
            # T ~ 6.3e5 in the skewed case, diverging from DuckDB exactly
            # on the anomalous distributions this gate exists to flag
            F.sum(
                F.col("obs").cast("decimal(19,0)")
                * F.col("obs").cast("decimal(19,0)")
            ).alias("ss"),
        )
        .selectExpr(
            # sum (24*obs - T)^2 / (24*T) reduces to (24*ss - T^2) / T
            # (ss = sum obs^2, sum obs = T); all intermediates DECIMAL(38,0)
            # (mirrors DuckDB's HUGEINT promotion), <= 23*T^2*1e6 — exact
            # up to T ~ 2e15 even in the all-in-one-hour worst case
            "CAST(t AS BIGINT) AS n_events",
            "CAST(23 AS BIGINT) AS df",
            "CAST((24 * ss - CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)))"
            " * 1000000 DIV t AS BIGINT) AS chi2_micro",
        )
        .selectExpr(
            "n_events",
            "df",
            "chi2_micro",
            f"CASE WHEN chi2_micro > {CHI2_CRIT_MICRO_DF23} "
            "THEN 'nonuniform' ELSE 'uniform' END AS verdict",
        )
    )


ORACLE_HOUR_UNIFORMITY = f"""
WITH obs AS (
  SELECT CAST(extract(hour FROM ts) AS INT) AS h, count(*) AS obs
  FROM events GROUP BY 1
),
cells AS (
  SELECT s.h, coalesce(o.obs, 0) AS obs
  FROM (SELECT unnest(range(0, 24)) AS h) s
  LEFT JOIN obs o ON s.h = o.h
),
agg AS (
  SELECT sum(obs) AS t, sum(obs * obs) AS ss FROM cells
)
SELECT CAST(t AS BIGINT) AS n_events,
       CAST(23 AS BIGINT) AS df,
       CAST((24 * ss - t * t) * 1000000 // t AS BIGINT)
         AS chi2_micro,
       CASE WHEN (24 * ss - t * t) * 1000000 // t
                 > {CHI2_CRIT_MICRO_DF23}
            THEN 'nonuniform' ELSE 'uniform' END AS verdict
FROM agg
"""


def streaming_transition_matrix(spark: SparkSession, sf_dir: str):
    """Streaming twin of :func:`q_events_transition_matrix`: per-user
    state = (last event time, last event type); each micro-batch folds
    its rows in event-time order and APPENDS the batch's transition
    deltas (from_type, to_type, n) — the caller aggregates the delta
    stream and compares against the batch matrix (stream == batch).

    Scale posture: state is one (timestamp, type) pair per user; the
    emitted relation is delta-grain (bounded by the matrix size per user
    per batch, not the event volume), so the downstream aggregation is
    tiny. Append output mode means a replayed batch appends its deltas
    again — exactly-once consumers aggregate from a checkpointed sink
    keyed by (batch, user), the same epoch discipline as the admission
    funnel; the memory-sink twin here only asserts semantics."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = _event_stream(spark, sf_dir)
    out_schema = "from_type string, to_type string, n long"
    state_schema = "last_ts double, last_type string"
    gap_us = SESSION_GAP_SECONDS * 1_000_000

    def fold(key, pdfs, state):
        if state.exists:
            last_ts, last_type = state.get
        else:
            last_ts, last_type = None, None
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        deltas: dict = {}
        for t, et in zip(rows["ts"], rows["event_type"]):
            ts = t.value // 1000  # integer microseconds, same math as batch
            if last_type is not None and ts - last_ts <= gap_us:
                k = (last_type, et)
                deltas[k] = deltas.get(k, 0) + 1
            last_ts, last_type = ts, et
        state.update((last_ts, last_type))
        if deltas:
            ks = list(deltas)
            yield pd.DataFrame(
                {
                    "from_type": [k[0] for k in ks],
                    "to_type": [k[1] for k in ks],
                    "n": [deltas[k] for k in ks],
                }
            )

    updated = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        updated.writeStream.outputMode("append")
        .format("memory")
        .queryName("events_transition_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# inter-arrival latency percentiles: the latency-SLO readout for event
# pipelines. The gap stream comes from the same user-keyed sort window
# sessionization pays; the percentile is Spark's exact `percentile`
# (linear interpolation), mirrored by DuckDB's quantile_cont — the
# order_value_percentiles precedent extended to a derived (lag) measure.


def q_events_interarrival_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """p50/p90/p99 same-user inter-arrival seconds per (later) event type.

    Gaps are exact integer microseconds from the lag window, cast to
    double once for the interpolating percentile; emitted as seconds
    rounded to 2 dp (class A: the only float ops are the IEEE division
    and one interpolation on exactly-represented integers).

    Scale shape: one user-keyed sort window (the sessionize exchange),
    one 5-group percentile aggregation."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn(
            "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        )
        .filter(F.col("gap_us").isNotNull())
        .select("event_type", F.col("gap_us").cast("double").alias("g"))
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.expr("percentile(g, array(0.5D, 0.9D, 0.99D))").alias("p"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(F.element_at(F.col("p"), 1) / 1_000_000.0, 2).alias("p50_s"),
        F.round(F.element_at(F.col("p"), 2) / 1_000_000.0, 2).alias("p90_s"),
        F.round(F.element_at(F.col("p"), 3) / 1_000_000.0, 2).alias("p99_s"),
    ).orderBy("event_type")


ORACLE_INTERARRIVAL = """
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) AS g
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(quantile_cont(g, 0.5) / 1000000.0, 2) AS p50_s,
       round(quantile_cont(g, 0.9) / 1000000.0, 2) AS p90_s,
       round(quantile_cont(g, 0.99) / 1000000.0, 2) AS p99_s
FROM gaps
WHERE g IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# funnel latency: not just WHETHER users convert (q_events_funnel) but HOW
# LONG signup -> first purchase takes — the time-to-convert distribution
# product teams act on.


def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row time-to-convert report: users who signed up, users who
    purchased after signup, and p50/p90 signup->first-purchase latency in
    seconds over the converted population.

    Gap math is exact integer microseconds (the interarrival-percentiles
    convention: the only float ops are the IEEE division and Spark's
    interpolating ``percentile`` on exactly-represented integers).

    Scale shape: one user-partitioned window pass (the funnel's
    exchange) collapsed to a per-user row, then a single global
    aggregation."""
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("signup", "purchase")
    )
    us = F.unix_micros(F.col("ts"))
    pw = W.partitionBy("user_id")
    step = ev.select(
        "user_id",
        "event_type",
        us.alias("ts_us"),
        F.min(F.when(F.col("event_type") == "signup", us)).over(pw).alias(
            "s_ts"
        ),
    )
    per_user = (
        step.withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("s_ts")),
                    F.col("ts_us"),
                )
            ).over(pw),
        )
        .groupBy("user_id")
        .agg(
            F.max("s_ts").alias("s_ts"),
            F.max(F.col("p_ts") - F.col("s_ts")).alias("gap_us"),
        )
        .filter(F.col("s_ts").isNotNull())
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signed_up"),
        F.sum(F.col("gap_us").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_converted"),
        F.round(
            F.expr("percentile(CAST(gap_us AS DOUBLE), 0.5D)") / 1_000_000.0, 2
        ).alias("p50_s"),
        F.round(
            F.expr("percentile(CAST(gap_us AS DOUBLE), 0.9D)") / 1_000_000.0, 2
        ).alias("p90_s"),
    )


ORACLE_FUNNEL_LATENCY = """
WITH step AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id) AS s_ts
  FROM events
  WHERE event_type IN ('signup', 'purchase')
),
per_user AS (
  SELECT user_id, max(s_ts) AS s_ts,
         min(CASE WHEN event_type = 'purchase' AND ts_us > s_ts
                  THEN ts_us END) - max(s_ts) AS gap_us
  FROM step
  GROUP BY user_id
  HAVING max(s_ts) IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_signed_up,
       CAST(sum(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1000000.0, 2)
         AS p50_s,
       round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 1000000.0, 2)
         AS p90_s
FROM per_user
"""


# ---------------------------------------------------------------------------
# semi-structured schema inventory: which JSON keys actually occur in the
# props column, per event type — the schema-drift audit run before
# promoting a JSON payload to typed columns (a producer adding/renaming a
# key shows up here as a new inventory row, not a silent NULL lane).


def q_events_props_key_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, prop_key): row count and share of the type's
    events; rows whose props do not parse inventory under the
    '<malformed>' key, and rows whose props is a VALID but EMPTY object
    ('{}' — zero keys, which a bare explode would silently drop from
    n_rows and the share denominator) inventory under '<empty>', so the
    audit is total (nothing silently skipped; the ADVICE r9 finding).

    Scale shape: one map-side json_object_keys explode + one small-group
    aggregation (keys x types groups); the per-type total rides a
    type-partitioned window on the bounded inventory relation."""
    ev = _events(spark, sf_dir)
    keyed = ev.select(
        "event_type",
        F.explode(
            F.expr(
                "CASE WHEN json_object_keys(props) IS NULL"
                " THEN array('<malformed>')"
                " WHEN size(json_object_keys(props)) = 0"
                " THEN array('<empty>')"
                " ELSE json_object_keys(props) END"
            )
        ).alias("prop_key"),
    )
    w_type = W.partitionBy("event_type")
    return (
        keyed.groupBy("event_type", "prop_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .withColumn("tot", F.sum("n_rows").over(w_type))
        .selectExpr(
            "event_type",
            "prop_key",
            "n_rows",
            "CAST(n_rows * 10000 DIV tot AS BIGINT) AS share_bp",
        )
        .orderBy("event_type", "prop_key")
    )


ORACLE_PROPS_KEY_INVENTORY = """
WITH keyed AS (
  SELECT event_type,
         unnest(CASE WHEN NOT (json_valid(props) AND json_type(props) = 'OBJECT')
                     THEN ['<malformed>']
                     WHEN len(json_keys(props)) = 0 THEN ['<empty>']
                     ELSE json_keys(props) END) AS prop_key
  FROM events
),
inv AS (
  SELECT event_type, prop_key, count(*) AS n_rows
  FROM keyed GROUP BY 1, 2
)
SELECT event_type, prop_key,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_rows * 10000 // sum(n_rows) OVER (PARTITION BY event_type)
        AS BIGINT) AS share_bp
FROM inv
ORDER BY event_type, prop_key
"""


# ---------------------------------------------------------------------------
# event-time lateness histogram: the watermark-tuning readout. Streaming
# jobs pick their watermark delay from the observed out-of-order profile;
# this query IS that profile — how many events arrive with an event time
# behind the per-user running maximum (event_id = arrival order, the same
# convention every streaming twin here uses), and by how much.

LATENESS_CLASSES = (
    (0, "in_order"),
    (1, "late_1s"),
    (10, "late_10s"),
    (60, "late_60s"),
    (600, "late_600s"),
)


def q_events_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per lateness class: event count and corpus share (bp). Lateness =
    per-user running-max event time (over arrival order) minus the
    event's own time, exact integer microseconds; classes are <=1s,
    <=10s, <=60s, <=600s and the over-600s tail ('late_inf'), plus
    'in_order' for events at or ahead of the running max. Read off the
    smallest class whose cumulative share clears your completeness SLO
    and that is your ``withWatermark`` delay.

    Scale shape: ONE user-keyed sort window (the sessionize exchange,
    arrival-ordered) and one bounded-class aggregation."""
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = ev.select(
        (
            F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("late_us")
    )
    cls = "CASE WHEN late_us IS NULL OR late_us <= 0 THEN 'in_order' "
    for secs, name in LATENESS_CLASSES[1:]:
        cls += f"WHEN late_us <= {secs * 1_000_000} THEN '{name}' "
    cls += "ELSE 'late_inf' END"
    order = {name: i for i, (_, name) in enumerate(LATENESS_CLASSES)}
    order["late_inf"] = len(LATENESS_CLASSES)
    ord_case = "CASE " + " ".join(
        f"WHEN lateness_class = '{n}' THEN {i}" for n, i in order.items()
    ) + " END"
    w_all = W.partitionBy()  # 6-row class relation
    return (
        late.selectExpr(f"{cls} AS lateness_class")
        .groupBy("lateness_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .withColumn("total", F.sum("n_events").over(w_all))
        .selectExpr(
            f"CAST({ord_case} AS INT) AS class_order",
            "lateness_class",
            "n_events",
            "CAST(n_events * 10000 DIV total AS BIGINT) AS share_bp",
        )
        .orderBy("class_order")
    )


def _oracle_lateness() -> str:
    cls = "CASE WHEN late_us IS NULL OR late_us <= 0 THEN 'in_order' "
    for secs, name in LATENESS_CLASSES[1:]:
        cls += f"WHEN late_us <= {secs * 1_000_000} THEN '{name}' "
    cls += "ELSE 'late_inf' END"
    order = {name: i for i, (_, name) in enumerate(LATENESS_CLASSES)}
    order["late_inf"] = len(LATENESS_CLASSES)
    ord_case = "CASE " + " ".join(
        f"WHEN lateness_class = '{n}' THEN {i}" for n, i in order.items()
    ) + " END"
    return f"""
WITH late AS (
  SELECT max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         - epoch_us(ts) AS late_us
  FROM events
),
classed AS (
  SELECT {cls} AS lateness_class, count(*) AS n_events
  FROM late GROUP BY 1
)
SELECT CAST({ord_case} AS INT) AS class_order,
       lateness_class,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events * 10000 // sum(n_events) OVER () AS BIGINT) AS share_bp
FROM classed
ORDER BY class_order
"""


ORACLE_LATENESS_HISTOGRAM = _oracle_lateness()


# completeness SLOs the watermark recommendation answers for
WATERMARK_SLOS_BP = (9500, 9900, 9990)


def _lateness_delay_case(col: str = "lateness_class") -> str:
    """Class name -> the watermark delay (seconds) that admits it;
    late_inf maps to the -1 sentinel (no finite delay covers the tail)."""
    arms = " ".join(
        f"WHEN '{name}' THEN {secs}" for secs, name in LATENESS_CLASSES
    )
    return f"CASE {col} {arms} ELSE -1 END"


def q_events_watermark_recommendation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The lateness histogram made actionable: per completeness SLO, the
    smallest ``withWatermark`` delay whose cumulative event share clears
    it, plus the share actually achieved at that delay. delay -1 = the
    SLO is only reachable by admitting the over-600s tail (no finite
    tracked delay suffices). This is the number an engineer would
    otherwise read off events_lateness_histogram by hand.

    Exactness: cumulative shares are integral bp quotients of exact
    counts (cum_n * 10000 DIV total), never sums of rounded per-class
    shares; the per-SLO pick is min_by/arg_min over the bounded class
    relation (<= 6 rows; the adjudicated bounded-window class).

    Scale shape: the histogram's ONE user-keyed sort window + bounded-
    class aggregation, then pure algebra on <= 6 x |SLOs| rows."""
    ev = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = ev.select(
        (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
            "late_us"
        )
    )
    cls = "CASE WHEN late_us IS NULL OR late_us <= 0 THEN 'in_order' "
    for secs, name in LATENESS_CLASSES[1:]:
        cls += f"WHEN late_us <= {secs * 1_000_000} THEN '{name}' "
    cls += "ELSE 'late_inf' END"
    w_all = W.partitionBy()  # <= 6-row class relation
    w_cum = W.orderBy("delay_ord").rowsBetween(W.unboundedPreceding, 0)
    slos = ", ".join(str(s) for s in WATERMARK_SLOS_BP)
    cum = (
        late.selectExpr(f"{cls} AS lateness_class")
        .groupBy("lateness_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        # order classes by admitting delay, tail (-1) last via the trick
        # of sorting on (delay == -1, delay)
        .selectExpr(
            "lateness_class",
            "n_events",
            f"CAST({_lateness_delay_case()} AS BIGINT) AS delay_s",
        )
        .withColumn(
            "delay_ord",
            F.expr("CASE WHEN delay_s = -1 THEN 9223372036854775807 ELSE delay_s END"),
        )
        .withColumn("cum_n", F.sum("n_events").over(w_cum))
        .withColumn("total", F.sum("n_events").over(w_all))
        .selectExpr(
            "delay_s",
            "delay_ord",
            "CAST(cum_n * 10000 DIV total AS BIGINT) AS cum_bp",
        )
    )
    return (
        cum.selectExpr("*", f"explode(array({slos})) AS slo_bp")
        .filter(F.col("cum_bp") >= F.col("slo_bp"))
        .groupBy("slo_bp")
        .agg(
            F.expr("min_by(delay_s, delay_ord)").alias("d"),
            F.expr("min_by(cum_bp, delay_ord)").alias("a"),
        )
        .selectExpr(
            "CAST(slo_bp AS BIGINT) AS slo_bp",
            "CAST(d AS BIGINT) AS recommended_delay_s",
            "CAST(a AS BIGINT) AS achieved_share_bp",
        )
        .orderBy("slo_bp")
    )


def _oracle_watermark_recommendation() -> str:
    cls = "CASE WHEN late_us IS NULL OR late_us <= 0 THEN 'in_order' "
    for secs, name in LATENESS_CLASSES[1:]:
        cls += f"WHEN late_us <= {secs * 1_000_000} THEN '{name}' "
    cls += "ELSE 'late_inf' END"
    slos = ", ".join(f"({s})" for s in WATERMARK_SLOS_BP)
    return f"""
WITH late AS (
  SELECT max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         - epoch_us(ts) AS late_us
  FROM events
),
classed AS (
  SELECT {cls} AS lateness_class, count(*) AS n_events
  FROM late GROUP BY 1
),
delayed AS (
  SELECT CAST({_lateness_delay_case()} AS BIGINT) AS delay_s,
         CASE WHEN {_lateness_delay_case()} = -1
              THEN 9223372036854775807
              ELSE CAST({_lateness_delay_case()} AS BIGINT) END AS delay_ord,
         n_events
  FROM classed
),
cum AS (
  SELECT delay_s, delay_ord,
         CAST(sum(n_events) OVER (ORDER BY delay_ord
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
              // sum(n_events) OVER () AS BIGINT) AS cum_bp
  FROM delayed
)
SELECT CAST(slo_bp AS BIGINT) AS slo_bp,
       CAST(arg_min(delay_s, delay_ord) AS BIGINT) AS recommended_delay_s,
       CAST(arg_min(cum_bp, delay_ord) AS BIGINT) AS achieved_share_bp
FROM cum CROSS JOIN (VALUES {slos}) t(slo_bp)
WHERE cum_bp >= slo_bp
GROUP BY slo_bp
ORDER BY slo_bp
"""


ORACLE_WATERMARK_RECOMMENDATION = _oracle_watermark_recommendation()


# bot/burst detection: superhuman per-minute event rates. Rate limiting
# and abuse triage both start from "what is the fastest any user ever
# hit us" — the per-user peak minute, ranked.

BURST_TOP_N = 10


def q_events_burst_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BURST_TOP_N users by their PEAK events-in-one-minute (exact
    epoch-minute buckets), with their total events and the peak's share
    of their activity (bp) — a user whose peak minute carries most of
    their history is a burst (bot/replay), not a heavy user.

    Scale shape: one (user, minute) aggregation with map-side combine,
    one user-keyed max_by regroup, TakeOrderedAndProject for the
    top-N."""
    ev = _events(spark, sf_dir)
    per_min = ev.selectExpr(
        "user_id", "unix_micros(ts) DIV 60000000 AS minute"
    ).groupBy("user_id", "minute").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return burst_from_minutes(per_min)


def burst_from_minutes(per_min: DataFrame) -> DataFrame:
    """The burst report's peak-per-user regroup + top-N over any
    (user_id, minute, c) per-minute-count relation — q_events_burst_report
    body, factored so the streaming twin's SINK (the finalized per-minute
    windows) feeds the identical ranking."""
    return (
        per_min.groupBy("user_id")
        .agg(
            F.max("c").cast("bigint").alias("peak_minute_events"),
            F.sum("c").cast("bigint").alias("total_events"),
        )
        .selectExpr(
            "user_id",
            "peak_minute_events",
            "total_events",
            "CAST(peak_minute_events * 10000 DIV total_events AS BIGINT)"
            " AS peak_share_bp",
        )
        .orderBy(
            F.col("peak_minute_events").desc(), F.col("user_id").asc()
        )
        .limit(BURST_TOP_N)
    )


def streaming_burst_minutes(
    spark: SparkSession, drop_dir: str, out_dir: str, delay: str = "2 minutes"
):
    """Streaming half of the burst/abuse report: per-(user, minute) event
    counts as a WATERMARKED tumbling-window aggregation over a JSONL drop
    folder, append-mode parquet sink — each minute window emits exactly
    once when the watermark passes its end, so the sink accumulates the
    finalized per-minute rate table that rate-limit triage tails. The
    peak-per-user regroup (:func:`burst_from_minutes`) runs ON THE SINK —
    a bounded relation (users x active minutes), re-rankable at any time
    without touching the stream.

    This is the production split for abuse detection at 100 TB/day: the
    stream pays one keyed stateful aggregation with watermark-bounded
    state (windows older than the watermark are evicted after emission);
    the expensive ranking reruns on the compact sink. The twin test
    asserts stream == batch on the identical dropped rows, crash-replay
    included (the parquet file-sink metadata log absorbs a replayed
    epoch's re-write, so a restart never double-counts a minute)."""
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .json(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window(F.col("ts"), "1 minute"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .selectExpr(
            "user_id",
            "unix_micros(window.start) DIV 60000000 AS minute",
            "c",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )


ORACLE_BURST_REPORT = f"""
WITH per_min AS (
  SELECT user_id, epoch_us(ts) // 60000000 AS minute,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         CAST(max(c) AS BIGINT) AS peak_minute_events,
         CAST(sum(c) AS BIGINT) AS total_events
  FROM per_min GROUP BY 1
)
SELECT user_id, peak_minute_events, total_events,
       CAST(peak_minute_events * 10000 // total_events AS BIGINT)
         AS peak_share_bp
FROM per_user
ORDER BY peak_minute_events DESC, user_id ASC
LIMIT {BURST_TOP_N}
"""


# user lifecycle ledger: per epoch-week, how many users were active, how
# many appeared for the FIRST time (acquisition), and how many were seen
# for the LAST time (churn as observed at corpus end — the standard
# retrospective definition). Weeks are integer epoch-day DIV 7 — no
# calendar-function drift between engines.


def q_events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per epoch-week: active users, new users (first-ever event this
    week), churned users (last-ever event this week). The growth
    accounting identity every product review starts from.

    Scale shape: ONE (user, week) distinct over the stream (map-side
    combine), then a user-keyed min/max regroup and three bounded
    week-keyed aggregations joined on the <=|weeks| relation."""
    ev = _events(spark, sf_dir)
    uw = (
        ev.selectExpr(
            "user_id", "unix_micros(ts) DIV 86400000000 DIV 7 AS week"
        )
        .distinct()
    )
    from ..cachereg import cache_eager

    uw = cache_eager(uw)
    active = uw.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    per_user = uw.groupBy("user_id").agg(
        F.min("week").alias("first_week"), F.max("week").alias("last_week")
    )
    new = per_user.groupBy(F.col("first_week").alias("week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    churn = per_user.groupBy(F.col("last_week").alias("week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_churned")
    )
    return (
        active.join(new, "week", "left")
        .join(churn, "week", "left")
        .selectExpr(
            "CAST(week AS BIGINT) AS week",
            "n_active",
            "coalesce(n_new, 0) AS n_new",
            "coalesce(n_churned, 0) AS n_churned",
        )
        .orderBy("week")
    )


ORACLE_USER_LIFECYCLE = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week
  FROM events
),
active AS (SELECT week, CAST(count(*) AS BIGINT) AS n_active FROM uw GROUP BY 1),
per_user AS (
  SELECT user_id, min(week) AS first_week, max(week) AS last_week
  FROM uw GROUP BY 1
),
new_u AS (SELECT first_week AS week, CAST(count(*) AS BIGINT) AS n_new
          FROM per_user GROUP BY 1),
churn_u AS (SELECT last_week AS week, CAST(count(*) AS BIGINT) AS n_churned
            FROM per_user GROUP BY 1)
SELECT CAST(a.week AS BIGINT) AS week,
       a.n_active,
       coalesce(n.n_new, 0) AS n_new,
       coalesce(c.n_churned, 0) AS n_churned
FROM active a
LEFT JOIN new_u n ON n.week = a.week
LEFT JOIN churn_u c ON c.week = a.week
ORDER BY week
"""


def q_events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per epoch-week: weekly active users, average daily actives
    (milli — sum of per-day distinct users over active days), and the
    DAU/WAU stickiness ratio in basis points — the engagement-depth KPI
    (how much of the weekly audience shows up on a given day). All
    integer: stickiness_bp = sum_daily * 10000 DIV (active_days * wau).

    Scale shape: ONE (user, day) distinct over the stream, then a
    per-day count, a per-week user distinct-regroup, and a bounded
    week-level join."""
    ev = _events(spark, sf_dir)
    ud = (
        ev.selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
        .distinct()
    )
    from ..cachereg import cache_eager

    ud = cache_eager(ud)
    daily = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("du")
    )
    weekly_daily = daily.groupBy(F.expr("day DIV 7").alias("week")).agg(
        F.sum("du").cast("bigint").alias("sum_daily"),
        F.count(F.lit(1)).cast("bigint").alias("active_days"),
    )
    wau = (
        ud.selectExpr("user_id", "day DIV 7 AS week")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )
    return (
        weekly_daily.join(wau, "week")
        .selectExpr(
            "CAST(week AS BIGINT) AS week",
            "wau",
            "active_days",
            "CAST(sum_daily * 1000 DIV active_days AS BIGINT) AS avg_dau_milli",
            "CAST(sum_daily * 10000 DIV (active_days * wau) AS BIGINT)"
            " AS stickiness_bp",
        )
        .orderBy("week")
    )


ORACLE_DAU_WAU_STICKINESS = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
daily AS (SELECT day, CAST(count(*) AS BIGINT) AS du FROM ud GROUP BY 1),
weekly_daily AS (
  SELECT day // 7 AS week,
         CAST(sum(du) AS BIGINT) AS sum_daily,
         CAST(count(*) AS BIGINT) AS active_days
  FROM daily GROUP BY 1
),
wau AS (
  SELECT week, CAST(count(*) AS BIGINT) AS wau
  FROM (SELECT DISTINCT user_id, day // 7 AS week FROM ud) GROUP BY 1
)
SELECT CAST(w.week AS BIGINT) AS week,
       wau.wau,
       w.active_days,
       CAST(w.sum_daily * 1000 // w.active_days AS BIGINT) AS avg_dau_milli,
       CAST(w.sum_daily * 10000 // (w.active_days * wau.wau) AS BIGINT)
         AS stickiness_bp
FROM weekly_daily w JOIN wau ON wau.week = w.week
ORDER BY week
"""


# per-type event-value percentiles: the monetization distribution behind
# events_hourly_rollup's value_sum — medians and tails per action type.
# Values quantize to integer cents (floor(v*100 + 0.5)) BEFORE the
# interpolating percentile so the percentile runs on exactly-represented
# integers (the repo's percentile class).


def q_events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: event count and p50/p90/p99 of the value column
    in cents (half-up integer cents; interpolated percentile, emitted
    2 dp).

    Scale shape: one map-side cents derivation, one |types|-group
    percentile aggregation."""
    ev = _events(spark, sf_dir)
    cents = ev.selectExpr(
        "event_type",
        "CAST(floor(value * 100 + 0.5) AS DOUBLE) AS c",
    )
    agg = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("percentile(c, array(0.5D, 0.9D, 0.99D))").alias("p"),
    )
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.element_at(F.col("p"), 1), 2).alias("p50_cents"),
        F.round(F.element_at(F.col("p"), 2), 2).alias("p90_cents"),
        F.round(F.element_at(F.col("p"), 3), 2).alias("p99_cents"),
    ).orderBy("event_type")


ORACLE_EVENTS_VALUE_PERCENTILES = """
WITH cents AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS DOUBLE) AS c
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(quantile_cont(c, 0.5), 2) AS p50_cents,
       round(quantile_cont(c, 0.9), 2) AS p90_cents,
       round(quantile_cont(c, 0.99), 2) AS p99_cents
FROM cents
GROUP BY 1
ORDER BY 1
"""


# hourly autocorrelation: does this hour's load predict the next hour's
# (lag 1), tomorrow's same hour (lag 24), next week's (lag 168)? The
# time-series diagnostic behind every traffic forecast — computed as
# exact Pearson correlation over the BOUNDED hourly-count relation
# (~|hours| rows), integer sufficient statistics, one IEEE sqrt at the
# output boundary (the quantity_price_corr recipe).

AUTOCORR_LAGS = (1, 24, 168)


def q_events_hourly_autocorrelation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per lag (hours): pair count and the Pearson autocorrelation of
    hourly event counts, 6 dp. Pairs are hours where both h and h+lag
    saw events (identical join semantics on both engines).

    Scale shape: ONE stream-sized aggregation to hourly counts (map-side
    combine); the lag fan-out, self-join, and correlation all run on the
    bounded hourly relation."""
    from ..cachereg import cache_eager

    ev = _events(spark, sf_dir)
    hourly = cache_eager(
        ev.selectExpr("unix_micros(ts) DIV 3600000000 AS h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lags = ", ".join(str(lag) for lag in AUTOCORR_LAGS)
    a = hourly.selectExpr("h", "c AS x", f"explode(array({lags})) AS lag")
    b = hourly.selectExpr("h AS hb", "c AS y")
    pairs = a.join(b, F.expr("hb = h + lag")).select("lag", "x", "y")
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("sum(x * x)").alias("sxx"),
        F.expr("sum(y * y)").alias("syy"),
        F.expr("sum(x * y)").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return (
        agg.select(
            F.col("lag").cast("bigint").alias("lag_hours"),
            F.col("n").alias("n_pairs"),
            F.round(num / den, 6).alias("autocorr"),
        )
        .orderBy("lag_hours")
    )


def _oracle_hourly_autocorr() -> str:
    lags = ", ".join(f"({lag})" for lag in AUTOCORR_LAGS)
    return f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pairs AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM hourly a
  CROSS JOIN (VALUES {lags}) l(lag)
  JOIN hourly b ON b.h = a.h + l.lag
),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag_hours,
       n AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS autocorr
FROM agg
ORDER BY lag_hours
"""


ORACLE_HOURLY_AUTOCORR = _oracle_hourly_autocorr()


# weekday x hour load profile: the capacity-planning heatmap (when does
# traffic actually arrive). Day-of-week is computed ARITHMETICALLY from
# epoch days ((days + 4) % 7, 0 = Sunday — 1970-01-01 was a Thursday)
# because the engines' dayofweek() builtins disagree on origin and range;
# integer arithmetic on epoch microseconds is exact on both.


def q_events_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (day-of-week, hour-of-day) cell: event count and corpus share
    (bp) — the 7x24 load heatmap behind autoscaling schedules and
    maintenance windows. dow 0 = Sunday (arithmetic convention above),
    hour in UTC.

    Scale shape: one map-side (dow, hour) derivation from epoch
    microseconds, one bounded 168-cell aggregation; the share window
    runs there."""
    ev = _events(spark, sf_dir)
    cells = ev.selectExpr(
        "(unix_micros(ts) DIV 86400000000 + 4) % 7 AS dow",
        "unix_micros(ts) % 86400000000 DIV 3600000000 AS hour",
    )
    w_all = W.partitionBy()  # <= 168-cell relation
    return (
        cells.groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .withColumn("tot", F.sum("n_events").over(w_all))
        .selectExpr(
            "CAST(dow AS BIGINT) AS dow",
            "CAST(hour AS BIGINT) AS hour",
            "n_events",
            "CAST(n_events * 10000 DIV tot AS BIGINT) AS share_bp",
        )
        .orderBy("dow", "hour")
    )


ORACLE_WEEKDAY_HOUR_PROFILE = """
WITH cells AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         epoch_us(ts) % 86400000000 // 3600000000 AS hour
  FROM events
),
agg AS (
  SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_events
  FROM cells GROUP BY 1, 2
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(hour AS BIGINT) AS hour,
       n_events,
       CAST(n_events * 10000 // sum(n_events) OVER () AS BIGINT) AS share_bp
FROM agg
ORDER BY dow, hour
"""


# within-session event-type co-occurrence: which actions happen in the
# SAME visit more often than chance — the market-basket recipe (support +
# lift) with sessions as baskets and event types as items, next to
# parts_copurchase's order-basket original.


def q_events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type pair: sessions containing both (support) and lift
    vs independence (support * n_sessions / (c1 * c2), >1 = the actions
    co-occur beyond chance). Sessions are the gated sessionize islands
    (SESSION_GAP_SECONDS).

    Scale shape: the ONE user-keyed sessionize window, a distinct to the
    (session, type) grain, a session-keyed equi-self-join bounded by
    |types-per-session|^2 (types are a small enum — never cartesian),
    and |types|-row broadcast counts for the lift denominator."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    sid = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    items = sid.select("user_id", "sid", "event_type").distinct()
    n_sessions = items.select("user_id", "sid").distinct().count()
    tc = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    c1 = tc.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("c1"))
    c2 = tc.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("c2"))
    lift = (F.col("support") * F.lit(n_sessions)) / (F.col("c1") * F.col("c2"))
    return (
        pairs.join(F.broadcast(c1), "type_a")
        .join(F.broadcast(c2), "type_b")
        .select("type_a", "type_b", "support", F.round(lift, 4).alias("lift"))
        .orderBy("type_a", "type_b")
    )


ORACLE_TYPE_COOCCURRENCE = f"""
WITH flagged AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                 > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT user_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
items AS (SELECT DISTINCT user_id, sid, event_type FROM sid),
n AS (SELECT count(*) AS n_sessions FROM (SELECT DISTINCT user_id, sid FROM items)),
tc AS (SELECT event_type, count(*) AS cnt FROM items GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS support
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.sid = b.sid
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, support,
       round(support * 1.0 * (SELECT n_sessions FROM n)
             / (c1.cnt * c2.cnt), 4) AS lift
FROM pairs
JOIN tc c1 ON c1.event_type = type_a
JOIN tc c2 ON c2.event_type = type_b
ORDER BY type_a, type_b
"""


# seasonal-naive forecast baseline: predict hour h by hour h-24. Every
# capacity/alerting forecast is judged against this baseline — if a model
# cannot beat same-hour-yesterday, it is not a model. WAPE (weighted
# absolute percentage error) keeps the metric integral and robust to
# near-zero hours (per-hour MAPE explodes on them; WAPE's denominator is
# the total volume).


def q_events_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row forecastability report: hourly event counts scored
    against the 24h-lagged seasonal-naive prediction — hours scored
    (both h and h-24 observed), total absolute error, total actual
    volume, and WAPE in integral bp. A high WAPE means the corpus's
    hourly load is NOT same-hour-yesterday-shaped and a real forecast
    model has room; near zero means the naive baseline already serves.

    Scale shape: one hour-keyed aggregation over the scan (map-side
    combined), then a self-join of the bounded hourly relation on the
    exact shifted hour (no window over the raw stream)."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    prev = hourly.select(
        F.expr("h + INTERVAL 24 HOURS").alias("h"), F.col("c").alias("c_prev")
    )
    return (
        hourly.join(prev, "h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours_scored"),
            F.sum(F.expr("abs(c - c_prev)")).cast("bigint").alias("abs_err_total"),
            F.sum("c").cast("bigint").alias("actual_total"),
        )
        .selectExpr(
            "n_hours_scored",
            "abs_err_total",
            "actual_total",
            "CAST(abs_err_total * 10000 DIV greatest(actual_total, 1)"
            " AS BIGINT) AS wape_bp",
        )
    )


ORACLE_SEASONAL_NAIVE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
joined AS (
  SELECT a.c, b.c AS c_prev
  FROM hourly a JOIN hourly b ON a.h = b.h + INTERVAL 24 HOURS
)
SELECT CAST(count(*) AS BIGINT) AS n_hours_scored,
       CAST(sum(abs(c - c_prev)) AS BIGINT) AS abs_err_total,
       CAST(sum(c) AS BIGINT) AS actual_total,
       CAST(sum(abs(c - c_prev)) * 10000 // greatest(sum(c), 1) AS BIGINT)
         AS wape_bp
FROM joined
"""


# sessionization gap-parameter sweep: the 30-min default is a convention,
# not a law — this is the tuning table that justifies (or overturns) it
SESSION_GAP_SWEEP = (300, 900, SESSION_GAP_SECONDS, 3600)


def q_events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate inactivity gap: session count and mean events per
    session (milli) — how session structure responds to the gap
    parameter (too small shatters real visits, too large merges distinct
    ones; the knee of this curve is the defensible choice). The 1800 s
    row is exactly events_sessionize's session population.

    Scale shape: ONE user-keyed sort window computes each event's
    predecessor gap (the sessionize exchange); the sweep is a literal
    explode over the gap candidates and a |sweep|-group aggregation —
    the parameter never re-runs the corpus pass."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select((us - F.lag(us).over(w)).alias("gap_us"))
    gs = ", ".join(str(g) for g in SESSION_GAP_SWEEP)
    return (
        gaps.selectExpr("gap_us", f"explode(array({gs})) AS gap_s")
        .groupBy("gap_s")
        .agg(
            # CAST first: gap_s arrives as INT32 from the literal explode
            # and 3600 * 1e6 overflows it (silent wrap in non-ANSI Spark,
            # hard error in DuckDB — caught by the gate)
            F.expr(
                "sum(CASE WHEN gap_us IS NULL"
                " OR gap_us > CAST(gap_s AS BIGINT) * 1000000"
                " THEN 1 ELSE 0 END)"
            ).alias("ns"),
            F.count(F.lit(1)).alias("ne"),
        )
        .selectExpr(
            "CAST(gap_s AS BIGINT) AS gap_s",
            "CAST(ns AS BIGINT) AS n_sessions",
            "CAST(ne AS BIGINT) AS n_events",
            "CAST(ne * 1000 DIV ns AS BIGINT) AS events_per_session_milli",
        )
        .orderBy("gap_s")
    )


ORACLE_SESSION_GAP_SWEEP = f"""
WITH gaps AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
fan AS (
  SELECT gap_us, gap_s
  FROM gaps CROSS JOIN (VALUES {", ".join(f"({g})" for g in SESSION_GAP_SWEEP)}) t(gap_s)
)
SELECT CAST(gap_s AS BIGINT) AS gap_s,
       CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > CAST(gap_s AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) * 1000
            // sum(CASE WHEN gap_us IS NULL OR gap_us > CAST(gap_s AS BIGINT) * 1000000
                        THEN 1 ELSE 0 END) AS BIGINT)
         AS events_per_session_milli
FROM fan
GROUP BY gap_s
ORDER BY gap_s
"""


# ---------------------------------------------------------------------------
# streaming sketch maintenance: the HLL register relation AS a streaming
# aggregate — mergeable summaries in motion


def streaming_hll_registers(spark: SparkSession, sf_dir: str):
    """Maintain the integer HLL register sketch (search.hll_registers —
    the same sketch the batch gates prove mergeable) as a STREAMING
    aggregate over the event stream: per (event_type, bucket) the running
    max rho of hashed user ids. max is associative/commutative, so
    Structured Streaming's incremental state IS the sketch merge — each
    micro-batch max-merges its registers into the store, and the final
    table must equal the batch registers over the same rows (the twin
    test asserts exact register equality, stream == batch).

    Scale posture: state is bounded at |event_types| x 256 registers
    regardless of event volume — the whole point of sketching a
    distinct-count in a stream. Complete output mode re-emits the small
    register relation; a production sink would upsert it as the serving
    sketch."""
    from ..operators.search import hll_registers

    stream = _event_stream(spark, sf_dir)
    toks = stream.select(
        F.col("event_type").alias("source"),
        F.col("user_id").cast("string").alias("token"),
    )
    return (
        hll_registers(toks)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("events_hll_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# incremental view maintenance: the daily rollup maintained as
# base-rollup + delta-rollup MERGE, reconciled against an independent
# full recompute. At 100 TB the full recompute never runs in production —
# the base rollup is a materialized table computed once, each new
# ingest partition contributes only its own delta aggregation, and the
# merge is a same-key (day, type) fold. This query IS the audit job that
# certifies the incremental path: it runs all three legs and reports,
# per event type, whether merged == full cell-for-cell.

# mid-day cut: real ingest batches are not day-aligned, so the cut
# splits one calendar day across base and delta — the merge then has to
# genuinely FOLD overlapping (day, type) keys, not just union disjoint
# ones (days_both > 0 is part of what the gate verifies).
IVM_CUT = "2024-01-21 12:00:00"


def q_rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: day coverage of the base (< IVM_CUT) and delta
    (>= IVM_CUT) daily rollups, the merged totals, the independently
    recomputed full totals, and the count of (day, type) cells where the
    merged rollup disagrees with the recompute (0 when IVM holds —
    asserted by the gate, not assumed).

    Money cells quantize to exact integer cents (DECIMAL(18,2) * 100 AS
    BIGINT) BEFORE any cross-row sum, so base + delta == full is exact
    integer arithmetic — no float accumulation order can break the
    reconciliation (FLOATS.md class A).

    Scale shape: the base and delta legs are each one (day, type)-keyed
    aggregation — in production they run as separate jobs at different
    times, which is why the merge is a full-outer join rather than one
    FILTER-clause aggregation (a single-scan form would verify nothing:
    merged == full would hold by arithmetic identity). Both rollup
    relations and the recompute share the (day, type) key, so the two
    reconcile joins are over day x type bounded relations — metadata
    next to the fact scans. The final regroup is |types|-sized."""
    ev = _events(spark, sf_dir).select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        "ts",
    )
    cut = F.lit(IVM_CUT).cast("timestamp")
    base = (
        ev.filter(F.col("ts") < cut)
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("cents").cast("bigint").alias("c_b"),
        )
    )
    delta = (
        ev.filter(F.col("ts") >= cut)
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_d"),
            F.sum("cents").cast("bigint").alias("c_d"),
        )
    )
    merged = base.join(delta, ["day", "event_type"], "full_outer").select(
        "day",
        "event_type",
        (F.col("n_b").isNotNull()).cast("bigint").alias("in_base"),
        (F.col("n_d").isNotNull()).cast("bigint").alias("in_delta"),
        (F.coalesce(F.col("n_b"), F.lit(0)) + F.coalesce(F.col("n_d"), F.lit(0)))
        .cast("bigint")
        .alias("n_m"),
        (F.coalesce(F.col("c_b"), F.lit(0)) + F.coalesce(F.col("c_d"), F.lit(0)))
        .cast("bigint")
        .alias("c_m"),
    )
    full = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum("cents").cast("bigint").alias("c_f"),
    )
    recon = merged.join(full, ["day", "event_type"], "full_outer")
    return (
        recon.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(
                ((F.col("in_base") == 1) & (F.col("in_delta") == 0)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("days_base_only"),
            F.sum(
                ((F.col("in_base") == 0) & (F.col("in_delta") == 1)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("days_delta_only"),
            F.sum(
                ((F.col("in_base") == 1) & (F.col("in_delta") == 1)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("days_both"),
            F.sum("n_m").cast("bigint").alias("events_merged"),
            F.sum("n_f").cast("bigint").alias("events_full"),
            F.sum("c_m").cast("bigint").alias("cents_merged"),
            F.sum("c_f").cast("bigint").alias("cents_full"),
            F.sum(
                (
                    F.col("n_m").isNull()
                    | F.col("n_f").isNull()
                    | (F.col("n_m") != F.col("n_f"))
                    | (F.col("c_m") != F.col("c_f"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("mismatch_days"),
        )
        .orderBy("event_type")
    )


ORACLE_ROLLUP_INCREMENTAL_MERGE = f"""
WITH ev AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ts
  FROM events
),
base AS (
  SELECT day, event_type,
         CAST(count(*) AS BIGINT) AS n_b, CAST(sum(cents) AS BIGINT) AS c_b
  FROM ev WHERE ts < TIMESTAMP '{IVM_CUT}' GROUP BY 1, 2
),
delta AS (
  SELECT day, event_type,
         CAST(count(*) AS BIGINT) AS n_d, CAST(sum(cents) AS BIGINT) AS c_d
  FROM ev WHERE ts >= TIMESTAMP '{IVM_CUT}' GROUP BY 1, 2
),
merged AS (
  SELECT COALESCE(base.day, delta.day) AS day,
         COALESCE(base.event_type, delta.event_type) AS event_type,
         CAST(base.n_b IS NOT NULL AS BIGINT) AS in_base,
         CAST(delta.n_d IS NOT NULL AS BIGINT) AS in_delta,
         CAST(COALESCE(n_b, 0) + COALESCE(n_d, 0) AS BIGINT) AS n_m,
         CAST(COALESCE(c_b, 0) + COALESCE(c_d, 0) AS BIGINT) AS c_m
  FROM base FULL OUTER JOIN delta
    ON base.day = delta.day AND base.event_type = delta.event_type
),
fullr AS (
  SELECT day, event_type,
         CAST(count(*) AS BIGINT) AS n_f, CAST(sum(cents) AS BIGINT) AS c_f
  FROM ev GROUP BY 1, 2
),
recon AS (
  SELECT COALESCE(merged.event_type, fullr.event_type) AS event_type,
         in_base, in_delta, n_m, c_m, n_f, c_f
  FROM merged FULL OUTER JOIN fullr
    ON merged.day = fullr.day AND merged.event_type = fullr.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CAST(in_base = 1 AND in_delta = 0 AS BIGINT)) AS BIGINT)
         AS days_base_only,
       CAST(sum(CAST(in_base = 0 AND in_delta = 1 AS BIGINT)) AS BIGINT)
         AS days_delta_only,
       CAST(sum(CAST(in_base = 1 AND in_delta = 1 AS BIGINT)) AS BIGINT)
         AS days_both,
       CAST(sum(n_m) AS BIGINT) AS events_merged,
       CAST(sum(n_f) AS BIGINT) AS events_full,
       CAST(sum(c_m) AS BIGINT) AS cents_merged,
       CAST(sum(c_f) AS BIGINT) AS cents_full,
       CAST(sum(CAST(n_m IS NULL OR n_f IS NULL OR n_m != n_f
                     OR c_m != c_f AS BIGINT)) AS BIGINT) AS mismatch_days
FROM recon
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint: WHERE did the traffic level shift? events_anomaly_hours
# flags individual outlier hours (trailing z-score) and source_psi_drift
# compares two fixed snapshots; CUSUM is the classic at-most-one-change
# locator between them — the cumulative sum of deviations from the GLOBAL
# mean, whose peak |value| sits exactly at the level-shift day (deviations
# are one-signed before the shift and the other sign after, so |S_d| is
# maximal at the boundary — Page 1954 / the AMOC estimator). All-integer:
# counts scale by 1000 against an integer milli-reference, so the
# cumulative sums are exact on both engines.


def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report: the CUSUM-estimated changepoint day of the daily
    event count series. Reference level = GLOBAL mean daily count
    (milli-events, integer DIV); cusum_d = sum_{i<=d}(c_i * 1000 -
    ref_milli); the changepoint is the day with max |cusum| (ties ->
    earliest day), restricted to days with a non-empty post segment.
    Reports the pre/post mean daily counts (milli) around the cut — the
    before/after levels the detector found.

    Scale shape: one day-keyed count aggregation compacts the fact table
    to the BOUNDED daily relation (|days| rows — the adjudicated
    bounded-relation window class); the ordered rank/cumsum window, the
    1-row ref attach, the TakeOrderedAndProject changepoint pick, and
    the 1-row changepoint attach all run on that metadata-sized
    relation. Divisions only ever see positive operands, so Spark DIV
    and DuckDB // agree."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_ord = W.orderBy("day")
    ranked = daily.select(
        "day",
        "c",
        F.row_number().over(w_ord).cast("bigint").alias("rn"),
        F.sum("c")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    glob = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("CAST(sum(c) * 1000 DIV count(*) AS BIGINT)").alias(
            "ref_milli"
        ),
    )
    scored = ranked.crossJoin(F.broadcast(glob)).select(
        "day",
        "c",
        "rn",
        "cum",
        "n_days",
        "ref_milli",
        F.expr("abs(cum * 1000 - rn * ref_milli)").cast("bigint").alias(
            "abs_cusum_milli"
        ),
    )
    cp = (
        scored.filter(F.col("rn") < F.col("n_days"))
        .orderBy(F.col("abs_cusum_milli").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.col("rn").alias("cp_rn"),
            F.col("abs_cusum_milli").alias("max_abs_cusum_milli"),
        )
    )
    return scored.crossJoin(F.broadcast(cp)).groupBy(
        "changepoint_day", "max_abs_cusum_milli"
    ).agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.max("ref_milli").cast("bigint").alias("ref_milli"),
        F.expr(
            "CAST(sum(CASE WHEN rn <= cp_rn THEN c END) * 1000 "
            "DIV max(cp_rn) AS BIGINT)"
        ).alias("pre_mean_milli"),
        F.expr(
            "CAST(sum(CASE WHEN rn > cp_rn THEN c END) * 1000 "
            "DIV (max(n_days) - max(cp_rn)) AS BIGINT)"
        ).alias("post_mean_milli"),
    ).select(
        "n_days",
        "ref_milli",
        "changepoint_day",
        "max_abs_cusum_milli",
        "pre_mean_milli",
        "post_mean_milli",
    )


ORACLE_EVENTS_CUSUM = f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
ranked AS (
  SELECT day, c,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
         CAST(sum(c) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM daily
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(c) * 1000 // count(*) AS BIGINT) AS ref_milli
  FROM ranked
),
scored AS (
  SELECT day, c, rn, cum, n_days, ref_milli,
         CAST(abs(cum * 1000 - rn * ref_milli) AS BIGINT) AS abs_cusum_milli
  FROM ranked, gstats
),
cp AS (
  SELECT day AS changepoint_day, rn AS cp_rn,
         abs_cusum_milli AS max_abs_cusum_milli
  FROM scored WHERE rn < n_days
  ORDER BY abs_cusum_milli DESC, day ASC LIMIT 1
)
SELECT max(n_days) AS n_days,
       max(ref_milli) AS ref_milli,
       changepoint_day,
       max_abs_cusum_milli,
       CAST(sum(CASE WHEN rn <= cp_rn THEN c END) * 1000
            // max(cp_rn) AS BIGINT) AS pre_mean_milli,
       CAST(sum(CASE WHEN rn > cp_rn THEN c END) * 1000
            // (max(n_days) - max(cp_rn)) AS BIGINT) AS post_mean_milli
FROM scored, cp
GROUP BY changepoint_day, max_abs_cusum_milli
"""


# ---------------------------------------------------------------------------
# A/B experiment readout: the two-proportion lift report every product
# experiment ends in. Arms are a deterministic hash of the unit of
# randomization (user_id parity here — at 100 TB you'd bucket a salted
# hash, same shape); the metric is click -> later purchase conversion.
# The z statistic is emitted as z^2 in milli, derived in EXACT integer
# arithmetic: z^2 = (cA*nB - cB*nA)^2 * N / (nA*nB*C*(N-C)) — every
# factor is a count, so both engines agree bit-for-bit with the
# DECIMAL(38,0)/HUGEINT accumulation convention (FLOATS.md class D; no
# sqrt, no float division anywhere).


def q_events_ab_lift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row A/B report: per arm the exposed users (>= 1 click),
    converters (a purchase strictly after their first click), exact
    conversion permille, the lift in permille points, and the pooled
    two-proportion z^2 in milli (z^2 >= 3841 ~ p < 0.05 two-sided).

    Scale shape: ONE user-keyed aggregation computes first-click and
    last-purchase per user (map-side combined), the arm regroup is
    2 rows, and the final report is a 1-row x 1-row fold of the two
    arm rows via conditional aggregation — no joins at all."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.expr("min(ts) FILTER (WHERE event_type = 'click')").alias("fc"),
        F.expr("max(ts) FILTER (WHERE event_type = 'purchase')").alias("lp"),
    )
    arms = (
        per_user.filter(F.col("fc").isNotNull())
        .selectExpr(
            "CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm",
            "CASE WHEN lp IS NOT NULL AND lp > fc THEN 1 ELSE 0 END AS conv",
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("conv").cast("bigint").alias("c"),
        )
    )
    return arms.agg(
        F.expr("sum(n) FILTER (WHERE arm = 'A')").cast("bigint").alias("na"),
        F.expr("sum(c) FILTER (WHERE arm = 'A')").cast("bigint").alias("ca"),
        F.expr("sum(n) FILTER (WHERE arm = 'B')").cast("bigint").alias("nb"),
        F.expr("sum(c) FILTER (WHERE arm = 'B')").cast("bigint").alias("cb"),
    ).selectExpr(
        "na AS exposed_a",
        "ca AS converted_a",
        "nb AS exposed_b",
        "cb AS converted_b",
        "CAST(ca * 1000 DIV na AS BIGINT) AS conv_a_permille",
        "CAST(cb * 1000 DIV nb AS BIGINT) AS conv_b_permille",
        "CAST(ca * 1000 DIV na - cb * 1000 DIV nb AS BIGINT)"
        " AS lift_permille",
        "CAST(CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN 0 "
        "ELSE CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na END "
        "* CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN 0 "
        "ELSE CAST(ca AS DECIMAL(38,0)) * nb - CAST(cb AS DECIMAL(38,0)) * na END "
        "* (na + nb) * 1000 DIV "
        "GREATEST(CAST(na AS DECIMAL(38,0)) * nb * (ca + cb) * (na + nb - ca - cb), 1) "
        "AS BIGINT) AS z2_milli",
    )


ORACLE_EVENTS_AB_LIFT = """
WITH per_user AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'click') AS fc,
         max(ts) FILTER (WHERE event_type = 'purchase') AS lp
  FROM events GROUP BY 1
),
arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN lp IS NOT NULL AND lp > fc THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM per_user WHERE fc IS NOT NULL GROUP BY 1
),
folded AS (
  SELECT CAST(sum(n) FILTER (WHERE arm = 'A') AS BIGINT) AS na,
         CAST(sum(c) FILTER (WHERE arm = 'A') AS BIGINT) AS ca,
         CAST(sum(n) FILTER (WHERE arm = 'B') AS BIGINT) AS nb,
         CAST(sum(c) FILTER (WHERE arm = 'B') AS BIGINT) AS cb
  FROM arms
)
SELECT na AS exposed_a,
       ca AS converted_a,
       nb AS exposed_b,
       cb AS converted_b,
       CAST(ca * 1000 // na AS BIGINT) AS conv_a_permille,
       CAST(cb * 1000 // nb AS BIGINT) AS conv_b_permille,
       CAST(ca * 1000 // na - cb * 1000 // nb AS BIGINT) AS lift_permille,
       CAST(CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN 0
            ELSE CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na END
            * CASE WHEN (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN 0
            ELSE CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na END
            * (na + nb) * 1000 //
            GREATEST(CAST(na AS HUGEINT) * nb * (ca + cb) * (na + nb - ca - cb), 1)
            AS BIGINT) AS z2_milli
FROM folded
"""


# ---------------------------------------------------------------------------
# Holt's linear-trend exponential smoothing: the classic two-parameter
# forecaster between the naive baselines (events_seasonal_naive_error)
# and a real model. The recurrence is inherently sequential — the
# engine-honest shape is ONE day-keyed compaction of the fact table,
# then a strictly-ordered fold over the BOUNDED daily array (Spark
# ``aggregate`` HOF == DuckDB recursive CTE, identical op order).
# alpha = beta = 1/2 keeps every level/trend value an exact dyadic
# rational (multiplying by 0.5 and adding doubles of bounded fraction
# depth is exact at this magnitude), so the fold is deterministic
# cross-engine even before the milli quantization (FLOATS.md class B —
# and stronger: the state stays exactly representable).


def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report: Holt's linear-trend smoothing (alpha = beta =
    0.5) over the daily event counts — final level/trend, the one-step
    forecast for the next day, and the in-sample one-step-ahead SSE
    (all milli, floor-quantized at the output boundary). Init: level =
    x2, trend = x2 - x1; iterate t = 3..n with pred = l + b, err = x_t
    - pred, l' = x_t/2 + (l+b)/2, b' = (l'-l)/2 + b/2.

    Scale shape: the fact table compacts to the bounded |days| relation
    in one map-side-combined aggregation; the ordered collect and the
    sequential fold run on that metadata-sized array (the adjudicated
    bounded-relation class). No shuffle grows with the corpus."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    arr = daily.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, c))), "
            "s -> CAST(s.c AS DOUBLE))"
        ).alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    lp = "(acc.l + acc.b)"
    lnew = f"(0.5D * x + 0.5D * {lp})"
    fold = (
        f"aggregate(slice(a, 3, CAST(greatest(n_days - 2, 0) AS INT)), "
        f"named_struct('l', element_at(a, 2), "
        f"'b', element_at(a, 2) - element_at(a, 1), 'sse', 0D), "
        f"(acc, x) -> named_struct("
        f"'l', {lnew}, "
        f"'b', 0.5D * ({lnew} - acc.l) + 0.5D * acc.b, "
        f"'sse', acc.sse + (x - {lp}) * (x - {lp})))"
    )
    return arr.withColumn("st", F.expr(fold)).selectExpr(
        "n_days",
        "CAST(floor(st.l * 1000) AS BIGINT) AS level_milli",
        "CAST(floor(st.b * 1000) AS BIGINT) AS trend_milli",
        "CAST(floor((st.l + st.b) * 1000) AS BIGINT) AS forecast_next_milli",
        "CAST(floor(st.sse * 1000) AS BIGINT) AS sse_milli",
    )


ORACLE_EVENTS_HOLT = """
WITH RECURSIVE daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
         CAST(c AS DOUBLE) AS x
  FROM daily
),
it AS (
  SELECT CAST(2 AS BIGINT) AS t,
         (SELECT x FROM ranked WHERE rn = 2) AS l,
         (SELECT x FROM ranked WHERE rn = 2)
           - (SELECT x FROM ranked WHERE rn = 1) AS b,
         CAST(0 AS DOUBLE) AS sse
  UNION ALL
  SELECT it.t + 1,
         0.5 * r.x + 0.5 * (it.l + it.b),
         0.5 * ((0.5 * r.x + 0.5 * (it.l + it.b)) - it.l) + 0.5 * it.b,
         it.sse + (r.x - (it.l + it.b)) * (r.x - (it.l + it.b))
  FROM it JOIN ranked r ON r.rn = it.t + 1
)
SELECT (SELECT max(rn) FROM ranked) AS n_days,
       CAST(floor(l * 1000) AS BIGINT) AS level_milli,
       CAST(floor(b * 1000) AS BIGINT) AS trend_milli,
       CAST(floor((l + b) * 1000) AS BIGINT) AS forecast_next_milli,
       CAST(floor(sse * 1000) AS BIGINT) AS sse_milli
FROM it WHERE t = (SELECT max(rn) FROM ranked)
"""


# ---------------------------------------------------------------------------
# Markov steady state: where does the session chain settle? The
# transition matrix says what follows what; its stationary distribution
# says what share of a long session a user spends in each state — the
# engagement mix product teams actually plan against. Computed as
# MARKOV_POWER_STEPS exact-integer power steps (v <- v C over the raw
# COUNT matrix, DECIMAL(38,0)/HUGEINT) with PER-STEP RENORMALIZATION to
# a fixed integer basis: after each step w' = w * BASIS DIV sum(w), the
# same truncating DIV on both engines (the adaboost convention), so the
# orbit is bit-identical yet the magnitude never compounds. Bound per
# step: |w| <= BASIS (1e12) going in, so the raw stepped mass w' is at
# most BASIS * T (T = total transitions); the BINDING intermediate is
# the renormalization's w' * BASIS <= BASIS^2 * T = 1e24 * T, so
# DECIMAL(38,0)/HUGEINT holds to T ~ 1e14 transitions — still any
# realistic corpus. Past that bound the DuckDB oracle errors loudly
# (HUGEINT overflow); the Spark side, under the session's pinned
# spark.sql.ansi.enabled=false (session.py), NULLs the overflowing
# DECIMAL silently — so the LOUD failure is the oracle gate's
# hash/row mismatch, not a Spark-side exception (the r13 ADVICE
# correction; enable ANSI for true fail-loud parity on both engines).
# (The r11 unnormalized form overflowed
# the 38-digit grid past T ~ 5e5 at 6 steps; this IS that documented
# knob, implemented). The truncation loses < |S| parts in 1e12 of mass
# per step — invisible at the permille output grid. The empirical
# incoming share sits alongside as the one-step comparison.

MARKOV_POWER_STEPS = 6
MARKOV_RENORM_BASIS = 10**12


def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the power-iterated stationary share (permille,
    after MARKOV_POWER_STEPS exact steps from the uniform vector, each
    step renormalized to MARKOV_RENORM_BASIS with truncating DIV) and
    the one-step empirical incoming share — identical transition
    derivation (user sort window + SESSION_GAP_SECONDS rule) as
    events_transition_matrix, so the two reports reconcile.

    Scale shape: the event stream pays the one sessionize exchange to
    become the <=|types|^2 count matrix; every power step is a join +
    regroup of two metadata-sized relations (|types| x |types|^2) plus
    a 1-row renormalizing sum on the bounded |types| vector."""
    from ..cachereg import cache_eager

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    trans = cache_eager(
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(F.col("prev_type").isNotNull() & (F.col("gap_us") <= gap_us))
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.expr("CAST(count(*) AS DECIMAL(38,0))").alias("c"))
    )
    states = cache_eager(
        trans.select(F.col("from_type").alias("s"))
        .union(trans.select(F.col("to_type").alias("s")))
        .distinct()
    )
    v = states.selectExpr("s", "CAST(1 AS DECIMAL(38,0)) AS w")
    for _ in range(MARKOV_POWER_STEPS):
        stepped = (
            v.join(trans, v["s"] == trans["from_type"])
            .groupBy(F.col("to_type").alias("s"))
            .agg(F.expr("CAST(sum(w * c) AS DECIMAL(38,0))").alias("w"))
        )
        raw = states.join(stepped, "s", "left_outer").selectExpr(
            "s", "CAST(COALESCE(w, 0) AS DECIMAL(38,0)) AS w"
        )
        # per-step renormalization to the fixed basis: one 1-row sum on
        # the bounded |S| relation, broadcast back — magnitude never
        # compounds (see the bound note above)
        step_tot = raw.agg(
            F.expr("CAST(sum(w) AS DECIMAL(38,0))").alias("st")
        )
        # materialize_local per step (r15; cut introduced r14): raw is
        # referenced twice (the renormalizing sum AND the rescale), so
        # the lazily-kept lineage DOUBLED per power step —
        # ~2^MARKOV_POWER_STEPS copies of the whole chain in the final
        # logical plan (the k-core/Lloyd pathology). The state kept per
        # step is the bounded |types|-row vector — driver-safe rows, so
        # the cut needs no executor-pinned checkpoint.
        v = materialize_local(
            raw.crossJoin(F.broadcast(step_tot)).selectExpr(
                "s",
                f"CAST(w * {MARKOV_RENORM_BASIS} DIV GREATEST(st, 1)"
                " AS DECIMAL(38,0)) AS w",
            )
        )
    tot = v.agg(F.expr("CAST(sum(w) AS DECIMAL(38,0))").alias("t"))
    cols = trans.groupBy(F.col("to_type").alias("s")).agg(
        F.expr("CAST(sum(c) AS DECIMAL(38,0))").alias("nin")
    )
    tt = trans.agg(F.expr("CAST(sum(c) AS DECIMAL(38,0))").alias("tt"))
    return (
        v.join(cols, "s", "left_outer")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tt))
        .selectExpr(
            "s AS event_type",
            "CAST(w * 1000 DIV GREATEST(t, 1) AS BIGINT)"
            " AS stationary_permille",
            "CAST(COALESCE(nin, 0) * 1000 DIV GREATEST(tt, 1) AS BIGINT)"
            " AS incoming_share_permille",
            "CAST(COALESCE(nin, 0) AS BIGINT) AS n_incoming",
        )
        .orderBy("event_type")
    )


def _oracle_markov_stationary() -> str:
    ctes = [
        f"""seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(count(*) AS HUGEINT) AS c
  FROM seq
  WHERE prev_type IS NOT NULL AND gap_us <= {SESSION_GAP_SECONDS} * 1000000
  GROUP BY 1, 2
),
states AS (
  SELECT DISTINCT s FROM (
    SELECT from_type AS s FROM trans UNION ALL SELECT to_type FROM trans
  )
),
v0 AS (SELECT s, CAST(1 AS HUGEINT) AS w FROM states)"""
    ]
    for k in range(1, MARKOV_POWER_STEPS + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT states.s, CAST(COALESCE(x.w, 0) AS HUGEINT) AS w
  FROM states LEFT JOIN (
    SELECT to_type AS s, sum(v{k - 1}.w * c) AS w
    FROM v{k - 1} JOIN trans ON v{k - 1}.s = trans.from_type
    GROUP BY 1
  ) x USING (s)
),
n{k} AS (SELECT CAST(sum(w) AS HUGEINT) AS st FROM r{k}),
v{k} AS (
  SELECT s, CAST(w * {MARKOV_RENORM_BASIS} // GREATEST(st, 1) AS HUGEINT) AS w
  FROM r{k}, n{k}
)"""
        )
    n = MARKOV_POWER_STEPS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
tot AS (SELECT CAST(sum(w) AS HUGEINT) AS t FROM v{n}),
cols AS (SELECT to_type AS s, CAST(sum(c) AS HUGEINT) AS nin
         FROM trans GROUP BY 1),
tt AS (SELECT CAST(sum(c) AS HUGEINT) AS tt FROM trans)
SELECT v{n}.s AS event_type,
       CAST(v{n}.w * 1000 // GREATEST(t, 1) AS BIGINT)
         AS stationary_permille,
       CAST(COALESCE(nin, 0) * 1000 // GREATEST(tt, 1) AS BIGINT)
         AS incoming_share_permille,
       CAST(COALESCE(nin, 0) AS BIGINT) AS n_incoming
FROM v{n} LEFT JOIN cols USING (s), tot, tt
ORDER BY 1"""
    )


ORACLE_MARKOV_STATIONARY = _oracle_markov_stationary()


# ---------------------------------------------------------------------------
# session archetypes: the most common session SHAPES (the ordered
# type-sequence), the behavioral summary between the transition matrix
# (one step) and the stationary mix (infinite steps). Signatures are
# truncated at ARCHETYPE_MAX_LEN types (+',...') so the group key stays
# bounded no matter how long a bot session runs — the same guard a
# production session-mining job needs.

ARCHETYPE_TOP_N = 20
ARCHETYPE_MAX_LEN = 8


def q_events_session_archetypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-ARCHETYPE_TOP_N session type-sequences: signature (comma-
    joined, truncated at ARCHETYPE_MAX_LEN), session count, share of
    all sessions (permille), and mean session length (milli). Sessions
    are the same SESSION_GAP_SECONDS windows as events_sessionize.

    Scale shape: the sessionize exchange, one per-session ordered
    collect (bounded by session length), one signature-keyed count with
    map-side combine, TakeOrderedAndProject for the top-N; the 1-row
    session-total attach is the allowlisted scalar class."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_sid = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    seqs = with_sid.groupBy("user_id", "session_seq").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, "
            "event_type))), s -> s.event_type)"
        ).alias("seq")
    )
    m = ARCHETYPE_MAX_LEN
    sig = seqs.selectExpr(
        f"CASE WHEN size(seq) > {m} THEN concat(concat_ws(',', "
        f"slice(seq, 1, {m})), ',...') ELSE concat_ws(',', seq) END"
        " AS signature",
        "CAST(size(seq) AS BIGINT) AS l",
    )
    tot = sig.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        sig.groupBy("signature")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("l").cast("bigint").alias("sum_len"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "signature",
            "n_sessions",
            "CAST(n_sessions * 1000 DIV n_total AS BIGINT)"
            " AS share_permille",
            "CAST(sum_len * 1000 DIV n_sessions AS BIGINT)"
            " AS mean_len_milli",
        )
        .orderBy(F.col("n_sessions").desc(), F.col("signature").asc())
        .limit(ARCHETYPE_TOP_N)
    )


ORACLE_SESSION_ARCHETYPES = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS * 1_000_000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
seqs AS (
  SELECT user_id, session_seq,
         list(event_type ORDER BY ts, event_id) AS seq
  FROM sid GROUP BY 1, 2
),
sig AS (
  SELECT CASE WHEN len(seq) > {ARCHETYPE_MAX_LEN}
              THEN array_to_string(seq[1:{ARCHETYPE_MAX_LEN}], ',') || ',...'
              ELSE array_to_string(seq, ',') END AS signature,
         CAST(len(seq) AS BIGINT) AS l
  FROM seqs
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sig)
SELECT signature,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) * 1000 // n_total AS BIGINT) AS share_permille,
       CAST(sum(l) * 1000 // count(*) AS BIGINT) AS mean_len_milli
FROM sig, tot
GROUP BY signature, n_total
ORDER BY n_sessions DESC, signature ASC
LIMIT {ARCHETYPE_TOP_N}
"""


# ---------------------------------------------------------------------------
# Lorenz curve of user activity: the decile curve behind
# events_power_users' Gini scalar — "the bottom 50% of users generate
# X permille of events". Users are ranked ASCENDING by event count with
# the with_global_rank primitive (range partition + offset stitch), so
# no global window ever sees the user relation; the decile regroup and
# the cumulative-share window run on the bounded 10-row curve.


def q_events_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per rank-decile of users (0 = least active): user count, events,
    and the cumulative share of all events in permille — the Lorenz
    curve as data. decile = (rank - 1) * 10 DIV n over the global
    ascending (count, user_id) order.

    Scale shape: one user-keyed count, one range-partitioned global
    rank (ranks.py — the no-global-window primitive), a 10-row decile
    regroup, and the cumulative window only over those 10 rows."""
    from ..operators.ranks import with_global_rank

    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = with_global_rank(
        per_user, "c", "user_id", rank_col="rn", total_col="n"
    )
    agg = (
        ranked.selectExpr("CAST((rn - 1) * 10 DIV n AS BIGINT) AS decile", "c")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("events"),
        )
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()  # bounded: the 10-row curve relation
    return (
        agg.withColumn("cum_events", F.sum("events").over(w_cum))
        .withColumn("total_events", F.sum("events").over(w_all))
        .selectExpr(
            "decile",
            "n_users",
            "events",
            "CAST(cum_events * 1000 DIV total_events AS BIGINT)"
            " AS cum_share_permille",
        )
        .orderBy("decile")
    )


ORACLE_LORENZ_DECILES = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c, user_id) AS rn,
         count(*) OVER () AS n
  FROM per_user
),
agg AS (
  SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS events
  FROM ranked GROUP BY 1
)
SELECT decile, n_users, events,
       CAST(sum(events) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            * 1000 // sum(events) OVER () AS BIGINT) AS cum_share_permille
FROM agg
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test: IS daily volume trending, nonparametrically?
# S = sum over day pairs i<j of sign(c_j - c_i) — the rank-based trend
# statistic that needs no distributional assumption and no float at all
# (FLOATS.md class D: comparisons and integer sums only). Complements
# events_holt_forecast (which fits a trend) by testing whether one is
# even there, and events_cusum_changepoint (level SHIFT vs monotone
# drift). |S| near n_pairs = strong monotone trend; near 0 = none.


def trend_from_daily(daily: DataFrame) -> DataFrame:
    """The Mann-Kendall report over ANY (day, c) relation — shared by
    the batch query (which derives daily from the fact table) and the
    streaming twin (which reruns it over the watermarked daily SINK,
    the burst_from_minutes production split: stream maintains the
    compaction, the statistics rerun on the bounded relation)."""
    from ..cachereg import cache_eager

    daily = cache_eager(daily)
    d1 = daily.selectExpr("day AS day1", "c AS c1")
    d2 = daily.selectExpr("day AS day2", "c AS c2")
    pairs = d1.join(F.broadcast(d2), F.col("day2") > F.col("day1"))
    agg = pairs.agg(
        F.expr(
            "CAST(sum(CASE WHEN c2 > c1 THEN 1 WHEN c2 < c1 THEN -1"
            " ELSE 0 END) AS BIGINT)"
        ).alias("s_statistic"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    ndays = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return agg.crossJoin(F.broadcast(ndays)).selectExpr(
        "n_days",
        "n_pairs",
        "s_statistic",
        "CAST(s_statistic * 1000 DIV nullif(n_pairs, 0) AS BIGINT)"
        " AS trend_permille",
        "CASE WHEN s_statistic > 0 THEN 'rising' WHEN s_statistic < 0"
        " THEN 'falling' ELSE 'flat' END AS direction",
    )


def q_events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: day count, pair count, the Mann-Kendall S statistic,
    the normalized trend in permille (S * 1000 DIV n_pairs), and the
    direction label.

    Scale shape: the fact table compacts to the bounded |days| relation
    in one map-side-combined aggregation; the pairwise comparison is a
    self-cross of that metadata-sized relation (|days|^2 pairs — ~130k
    at a year of days, constant in the corpus), never of events."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return trend_from_daily(daily)


def streaming_daily_counts(
    spark: SparkSession, drop_dir: str, out_dir: str, delay: str = "2 days"
):
    """Streaming half of the daily-trend family: per-day event counts as
    a WATERMARKED tumbling-window aggregation over a JSONL drop folder,
    append-mode parquet sink — each day window emits exactly once when
    the watermark passes its end, so the sink IS the bounded (day, c)
    relation the trend statistics (:func:`trend_from_daily`, the runs
    test, the dispersion ratio) rerun over at any time without touching
    the stream. Same production split as streaming_burst_minutes; same
    crash-replay guarantee (the parquet file-sink metadata log absorbs
    a replayed epoch). The twin test asserts stream == batch on the
    identical dropped rows."""
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .json(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window(F.col("ts"), "1 day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .selectExpr(
            "date_format(window.start, 'yyyy-MM-dd') AS day",
            "c",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .start()
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention triangle: users grouped by first-seen week,
# retention = share still active k weeks later — THE growth-analytics
# readout, exactly integral.

RET_MAX_OFFSET = 8


def q_events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, offset_weeks, cohort_users, retained_users,
    retained_permille) for offsets 0..RET_MAX_OFFSET — Monday-based
    ISO weeks on both engines (Spark date_trunc('week') == DuckDB
    date_trunc('week')).

    Scale shape: one (user, week) distinct aggregation over the corpus
    scan (THE shuffle), a per-user min regroup for the cohort (same
    user key — no new exchange under AQE), one user-keyed equi-join of
    actives to cohorts, then a bounded (weeks x offsets) matrix
    aggregation; cohort sizes broadcast back onto the matrix. Offset 0
    is every cohort's own week (retained_permille = 1000), kept as the
    triangle's anchor row."""
    ev = _events(spark, sf_dir)
    uw = cache_eager(
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        ).distinct()
    )
    cohorts = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    cells = (
        uw.join(cohorts, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("offset_weeks"),
            "user_id",
        )
        .filter(F.col("offset_weeks") <= RET_MAX_OFFSET)
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained_users"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .selectExpr(
            "date_format(cohort_week, 'yyyy-MM-dd') AS cohort_week",
            "offset_weeks",
            "cohort_users",
            "retained_users",
            "CAST(retained_users * 1000 DIV cohort_users AS BIGINT)"
            " AS retained_permille",
        )
        .orderBy("cohort_week", "offset_weeks")
    )


ORACLE_EVENTS_WEEKLY_RETENTION = f"""
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM cohorts GROUP BY 1
),
cells AS (
  SELECT c.cohort_week,
         CAST(date_diff('day', c.cohort_week, u.week) // 7 AS BIGINT)
           AS offset_weeks,
         CAST(count(*) AS BIGINT) AS retained_users
  FROM uw u JOIN cohorts c ON u.user_id = c.user_id
  WHERE date_diff('day', c.cohort_week, u.week) // 7 <= {RET_MAX_OFFSET}
  GROUP BY 1, 2
)
SELECT strftime(ce.cohort_week, '%Y-%m-%d') AS cohort_week,
       ce.offset_weeks, s.cohort_users, ce.retained_users,
       CAST(ce.retained_users * 1000 // s.cohort_users AS BIGINT)
         AS retained_permille
FROM cells ce JOIN sizes s ON ce.cohort_week = s.cohort_week
ORDER BY 1, 2
"""


def streaming_order_gaps(spark: SparkSession, drop_dir: str):
    """Streaming twin of ``q_customer_order_gap_histogram``'s gap
    extraction (operators/relational.py): orders arrive as a JSONL drop
    folder and per-customer keyed state carries (last order date, last
    orderkey); each micro-batch folds its rows in (date, orderkey)
    order and APPENDS one (o_custkey, gap_weeks) row per consecutive
    pair — the histogram is then a plain bounded aggregation over the
    sink, identical to the batch query's form. The twin test asserts
    stream == batch on the identical dropped rows across multiple
    micro-batches (state must bridge the batch boundary).

    Scale posture: state is one (int, int) pair per customer key,
    partitioned by o_custkey across executors by the state store; the
    pandas fold is Arrow-batched. Like the sessionize twin, replay
    order within a key must be non-decreasing across micro-batches
    (the ingestion-stream assumption); within a batch the fold sorts.
    gap_weeks uses the same ``least(days DIV 7, 52)`` bucketing as the
    batch side — gaps are >= 0 under ordered replay so DIV == floor."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sap_sql_engine_spark.operators.relational import (
        GAP_BUCKET_DAYS,
        GAP_MAX_BUCKET,
    )

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderdate date"
        )
        .json(drop_dir)
    )
    out_schema = "o_custkey long, gap_weeks long"
    state_schema = "last_days long, last_key long"

    def fold(key, pdfs, state):
        last_days, last_key = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs)).sort_values(["o_orderdate", "o_orderkey"])
        gaps = []
        for d, k in zip(rows["o_orderdate"], rows["o_orderkey"]):
            days = d.toordinal()
            if last_days is not None:
                gaps.append(
                    min((days - last_days) // GAP_BUCKET_DAYS, GAP_MAX_BUCKET)
                )
            last_days, last_key = days, int(k)
        state.update((last_days, last_key))
        yield pd.DataFrame(
            {"o_custkey": [key[0]] * len(gaps), "gap_weeks": gaps}
        )

    emitted = stream.groupBy("o_custkey").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        emitted.writeStream.outputMode("append")
        .format("memory")
        .queryName("order_gaps_stream")
        .start()
    )


def streaming_weekly_retention(spark: SparkSession, drop_dir: str):
    """Streaming twin of ``q_events_weekly_retention``'s cell
    extraction: events arrive as a JSONL drop folder and per-user keyed
    state carries (cohort Monday, bitmask of offsets already emitted);
    each micro-batch APPENDS one (cohort_week, offset_weeks, user_id)
    row per FIRST sighting of a (user, week-offset) pair <=
    RET_MAX_OFFSET — so the retention triangle is then a plain count
    per (cohort, offset) over the sink, with cohort sizes read off the
    offset-0 diagonal (every user's first week emits offset 0),
    identical to the batch query's cells/sizes split.

    Scale posture: state is two BIGINTs per user key (the bitmask caps
    at RET_MAX_OFFSET+1 bits), partitioned by user_id across executors
    by the state store; the pandas fold is Arrow-batched. Like the
    other stateful twins, replay order within a key must be
    non-decreasing across micro-batches (the ingestion-stream
    assumption) so the first event seen IS the cohort week; within a
    batch the fold sorts by ts."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .json(drop_dir)
    )
    out_schema = "cohort_week string, offset_weeks long, user_id long"
    state_schema = "cohort_days long, seen_mask long"

    def fold(key, pdfs, state):
        cohort_days, seen_mask = (
            state.get if state.exists else (None, 0)
        )
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out_cohort, out_off = [], []
        for ts in rows["ts"]:
            d = ts.date() if hasattr(ts, "date") else ts
            monday = d - _dt.timedelta(days=d.weekday())
            w_days = monday.toordinal()
            if cohort_days is None:
                cohort_days = w_days
            off = (w_days - cohort_days) // 7
            if off <= RET_MAX_OFFSET and not (seen_mask >> off) & 1:
                seen_mask |= 1 << off
                out_cohort.append(
                    _dt.date.fromordinal(cohort_days).isoformat()
                )
                out_off.append(off)
        state.update((cohort_days, seen_mask))
        yield pd.DataFrame(
            {
                "cohort_week": out_cohort,
                "offset_weeks": out_off,
                "user_id": [key[0]] * len(out_off),
            }
        )

    emitted = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return (
        emitted.writeStream.outputMode("append")
        .format("memory")
        .queryName("weekly_retention_stream")
        .start()
    )


# ---------------------------------------------------------------------------
# Theil-Sen slope of the daily volume series: the ROBUST slope estimator
# (median of all pairwise slopes — 29% breakdown point) that pairs with
# the Mann-Kendall direction test above; MK says WHETHER volume trends,
# Theil-Sen says HOW FAST, immune to the outlier days that wreck an OLS
# fit.


def theil_sen_from_days(daily: DataFrame) -> DataFrame:
    """The Theil-Sen report over ANY (d, c) relation (d = integer day
    index, c = count) — shared by the batch query (which derives the
    spine from the fact table) and the streaming twin (which reruns it
    over the watermarked daily SINK, the trend_from_daily production
    split)."""
    from ..cachereg import cache_eager

    daily = cache_eager(daily)
    d1 = daily.selectExpr("d AS da", "c AS ca")
    d2 = daily.selectExpr("d AS db", "c AS cb")
    slopes = (
        d1.join(F.broadcast(d2), F.expr("da < db"))
        .selectExpr(
            "CAST((cb - ca) * 1000 AS BIGINT) AS num",
            "db - da AS den",
        )
        # floor identity: slope_milli = floor(num / den), den > 0
        .selectExpr(
            "CAST((num - ((num % den + den) % den)) DIV den AS BIGINT)"
            " AS slope_milli"
        )
        .groupBy("slope_milli")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_cum = (
        W.partitionBy()
        .orderBy("slope_milli")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # constant-key window over the BOUNDED slope histogram (chisq-grid
    # class: |days|^2 distinct slopes max, independent of corpus size)
    ranked = slopes.select(
        "slope_milli",
        "cnt",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.sum("cnt").over(W.partitionBy()).cast("bigint").alias("n_pairs"),
    )
    agg = ranked.groupBy().agg(
        F.max("n_pairs").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("slope_milli") > 0, F.col("cnt")))
        .cast("bigint")
        .alias("pos_pairs_raw"),
        F.sum(F.when(F.col("slope_milli") < 0, F.col("cnt")))
        .cast("bigint")
        .alias("neg_pairs_raw"),
        F.min(
            F.when(
                F.col("cum") * 2 >= F.col("n_pairs"), F.col("slope_milli")
            )
        ).alias("sen_slope_milli"),
    )
    ndays = daily.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return agg.crossJoin(F.broadcast(ndays)).selectExpr(
        "n_days",
        "coalesce(n_pairs, 0) AS n_pairs",
        "coalesce(pos_pairs_raw, 0) AS pos_pairs",
        "coalesce(neg_pairs_raw, 0) AS neg_pairs",
        "sen_slope_milli",
    )


def q_events_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: day/pair counts, the positive/negative pair-slope
    split, and the Theil-Sen slope (median pairwise slope) in
    milli-events/day.

    Exactness: each pair's slope quantizes FIRST to an integer
    (c2-c1)*1000 over d2-d1 via the SPELLED-OUT FLOOR IDENTITY on both
    engines (the dividend is SIGNED — FLOATS.md rule 6), then the
    median is the exact type-1 order statistic (smallest slope whose
    cumulative pair count reaches half, cross-multiplied as
    cum*2 >= n_pairs — the bowley_skew convention) off the slope
    histogram. No floats anywhere.

    Scale shape: the fact table compacts to the bounded |days| spine
    in one map-side-combined aggregation (the mann_kendall recipe);
    the pair cross, the slope histogram, and its cumulative window are
    all |days|^2-bounded (~266k rows at two years — constant in the
    corpus), never event-sized."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
            " DATE '1970-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return theil_sen_from_days(daily)


ORACLE_EVENTS_THEIL_SEN = """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
slopes AS (
  SELECT CAST((num - ((num % den + den) % den)) // den AS BIGINT)
           AS slope_milli,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT CAST((b.c - a.c) * 1000 AS BIGINT) AS num,
           b.d - a.d AS den
    FROM daily a JOIN daily b ON a.d < b.d
  )
  GROUP BY 1
),
ranked AS (
  SELECT slope_milli, cnt,
         sum(cnt) OVER (ORDER BY slope_milli ROWS UNBOUNDED PRECEDING)
           AS cum,
         sum(cnt) OVER () AS n_pairs
  FROM slopes
),
agg AS (
  SELECT CAST(max(n_pairs) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN slope_milli > 0 THEN cnt END) AS BIGINT)
           AS pos_pairs_raw,
         CAST(sum(CASE WHEN slope_milli < 0 THEN cnt END) AS BIGINT)
           AS neg_pairs_raw,
         min(CASE WHEN cum * 2 >= n_pairs THEN slope_milli END)
           AS sen_slope_milli
  FROM ranked
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT nd.n_days,
       coalesce(a.n_pairs, 0) AS n_pairs,
       coalesce(a.pos_pairs_raw, 0) AS pos_pairs,
       coalesce(a.neg_pairs_raw, 0) AS neg_pairs,
       a.sen_slope_milli
FROM nd, agg a
"""


ORACLE_EVENTS_MANN_KENDALL = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CAST(sum(CASE WHEN d2.c > d1.c THEN 1 WHEN d2.c < d1.c THEN -1
                       ELSE 0 END) AS BIGINT) AS s_statistic,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily d1 JOIN daily d2 ON d2.day > d1.day
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT n_days, n_pairs, s_statistic,
       CAST(s_statistic * 1000 // nullif(n_pairs, 0) AS BIGINT)
         AS trend_permille,
       CASE WHEN s_statistic > 0 THEN 'rising' WHEN s_statistic < 0
            THEN 'falling' ELSE 'flat' END AS direction
FROM pairs, nd
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test: is the day-over-day up/down sequence RANDOM,
# or does volume move in streaks? Counts runs of consecutive same-sign
# changes (ties dropped, the standard treatment) against the expected
# run count 2 n_up n_down / (n_up + n_down) + 1 under exchangeability.
# Fewer runs than expected = momentum/streakiness; more = oscillation
# (e.g. a sawtooth batch schedule). All-integer except the expected
# count, which is one integral quotient in milli.


def q_events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: up-day and down-day counts, observed runs, the expected
    run count in milli, and observed*1000 - expected_milli (positive =
    oscillating, negative = streaky).

    Scale shape: the one daily compaction, then two lag windows on the
    BOUNDED |days| relation (single-partition by construction — the
    relation is metadata-sized, the adjudicated global-window class)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = W.orderBy("day")
    dirs = (
        daily.withColumn("prev_c", F.lag("c").over(w))
        .filter(F.col("prev_c").isNotNull() & (F.col("c") != F.col("prev_c")))
        .selectExpr(
            "day", "CASE WHEN c > prev_c THEN 1 ELSE -1 END AS dir"
        )
    )
    w2 = W.orderBy("day")
    # COALESCE: an all-ties (flat) series has an EMPTY direction relation
    # — the counts are honestly 0, not NULL (expected/gap stay NULL via
    # the nullif guard)
    runs = dirs.withColumn("prev_dir", F.lag("dir").over(w2)).agg(
        F.expr(
            "CAST(COALESCE(sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)"
        ).alias("n_up"),
        F.expr(
            "CAST(COALESCE(sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)"
        ).alias("n_down"),
        F.expr(
            "CAST(COALESCE(sum(CASE WHEN prev_dir IS NULL OR dir != prev_dir"
            " THEN 1 ELSE 0 END), 0) AS BIGINT)"
        ).alias("n_runs"),
    )
    return runs.selectExpr(
        "n_up",
        "n_down",
        "n_runs",
        "CAST(2 * n_up * n_down * 1000 DIV nullif(n_up + n_down, 0) + 1000"
        " AS BIGINT) AS expected_runs_milli",
        "CAST(n_runs * 1000 - (2 * n_up * n_down * 1000"
        " DIV nullif(n_up + n_down, 0) + 1000) AS BIGINT) AS gap_milli",
    )


ORACLE_EVENTS_RUNS_TEST = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
dirs AS (
  SELECT day, CASE WHEN c > prev_c THEN 1 ELSE -1 END AS dir
  FROM (SELECT day, c, lag(c) OVER (ORDER BY day) AS prev_c FROM daily)
  WHERE prev_c IS NOT NULL AND c != prev_c
),
runs AS (
  SELECT CAST(COALESCE(sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_up,
         CAST(COALESCE(sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_down,
         CAST(COALESCE(sum(CASE WHEN prev_dir IS NULL OR dir != prev_dir
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
  FROM (SELECT dir, lag(dir) OVER (ORDER BY day) AS prev_dir FROM dirs)
)
SELECT n_up, n_down, n_runs,
       CAST(2 * n_up * n_down * 1000 // nullif(n_up + n_down, 0) + 1000
            AS BIGINT) AS expected_runs_milli,
       CAST(n_runs * 1000 - (2 * n_up * n_down * 1000
            // nullif(n_up + n_down, 0) + 1000) AS BIGINT) AS gap_milli
FROM runs
"""


# ---------------------------------------------------------------------------
# Poisson dispersion (Fano factor): is daily arrival volume Poisson-like
# (VMR ~ 1), bursty/overdispersed (VMR >> 1 — campaign spikes, bot
# storms), or suspiciously regular (VMR << 1 — synthetic or quota-fed
# traffic)? The one-number arrival-process diagnostic next to the runs
# test (serial structure) and Mann-Kendall (trend). All-integer
# (FLOATS.md class D): VMR_milli = n*(n*S2 - S1^2)*1000 DIV
# ((n-1)*S1*n) computed as exact sums — no mean subtraction, no float.


def q_events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: day count, total events, mean daily count in milli, the
    sample variance in milli, and the variance-to-mean ratio in milli
    (1000 = Poisson-consistent).

    Scale shape: one daily compaction (map-side combined), then exact
    integer arithmetic on the 1-row sufficient statistics."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    stats = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.expr("CAST(sum(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("s1"),
        F.expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
        .alias("s2"),
    )
    return stats.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "CAST(s1 AS BIGINT) AS total_events",
        "CAST(s1 * 1000 DIV n AS BIGINT) AS mean_daily_milli",
        "CAST((n * s2 - s1 * s1) * 1000 DIV nullif(n * (n - 1), 0)"
        " AS BIGINT) AS variance_milli",
        "CAST((n * s2 - s1 * s1) * 1000 DIV nullif((n - 1) * s1, 0)"
        " AS BIGINT) AS vmr_milli",
    )


ORACLE_EVENTS_POISSON_DISPERSION = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(c AS HUGEINT)) AS s1,
         sum(CAST(c AS HUGEINT) * c) AS s2
  FROM daily
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(s1 AS BIGINT) AS total_events,
       CAST(s1 * 1000 // n AS BIGINT) AS mean_daily_milli,
       CAST((n * s2 - s1 * s1) * 1000 // nullif(n * (n - 1), 0) AS BIGINT)
         AS variance_milli,
       CAST((n * s2 - s1 * s1) * 1000 // nullif((n - 1) * s1, 0) AS BIGINT)
         AS vmr_milli
FROM stats
"""


# ---------------------------------------------------------------------------
# transition entropy: how PREDICTABLE is what follows each event type?
# H(next | from = f) in micro-nats per from-state — the per-state
# uncertainty the transition matrix only shows as a row of shares, and
# the quantity a session-prefetcher or UI-predictor actually budgets
# against. Same session-gap transition derivation as
# events_markov_stationary, so all three reports reconcile. Determinism
# (FLOATS.md class C + A): ln is quantized ONCE per count value to
# integer micro-nats (the zipf/kl discipline); H = ln(T_f) - sum(c *
# ln(c)) / T_f becomes lnT_micro - (sum c*lnc_micro) DIV T_f, exact
# integer arithmetic after the per-cell quantization.


def q_events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per from_type: outgoing transition count, distinct next types,
    and the conditional next-type entropy in micro-nats (0 =
    deterministic next step; ln(|types|)*1e6 = uniform).

    Scale shape: the one sessionize exchange to the <=|types|^2 count
    matrix, then arithmetic on that metadata-sized relation."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(F.col("prev_type").isNotNull() & (F.col("gap_us") <= gap_us))
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cells = trans.selectExpr(
        "from_type",
        "c",
        "CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"
        " AS lnc_micro",
    )
    per_from = cells.groupBy("from_type").agg(
        F.expr("CAST(sum(c) AS BIGINT)").alias("t_f"),
        F.count(F.lit(1)).cast("bigint").alias("n_next_types"),
        F.expr(
            "CAST(sum(CAST(c AS DECIMAL(38,0)) * lnc_micro)"
            " AS DECIMAL(38,0))"
        ).alias("clnc"),
    )
    return per_from.selectExpr(
        "from_type",
        "t_f AS n_transitions",
        "n_next_types",
        "CAST(CAST(floor(ln(CAST(t_f AS DOUBLE)) * 1000000) AS BIGINT)"
        " - clnc DIV t_f AS BIGINT) AS entropy_micro_nats",
    ).orderBy("from_type")


ORACLE_EVENTS_TRANSITION_ENTROPY = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(count(*) AS BIGINT) AS c
  FROM seq
  WHERE prev_type IS NOT NULL AND gap_us <= {SESSION_GAP_SECONDS} * 1000000
  GROUP BY 1, 2
),
cells AS (
  SELECT from_type, c,
         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS lnc_micro
  FROM trans
),
per_from AS (
  SELECT from_type,
         CAST(sum(c) AS BIGINT) AS t_f,
         CAST(count(*) AS BIGINT) AS n_next_types,
         CAST(sum(CAST(c AS HUGEINT) * lnc_micro) AS HUGEINT) AS clnc
  FROM cells GROUP BY from_type
)
SELECT from_type,
       t_f AS n_transitions,
       n_next_types,
       CAST(CAST(floor(ln(CAST(t_f AS DOUBLE)) * 1000000) AS BIGINT)
            - clnc // t_f AS BIGINT) AS entropy_micro_nats
FROM per_from
ORDER BY from_type
"""


# ---------------------------------------------------------------------------
# Gapped sequential patterns: which ordered type-triples a < b < c (any
# gaps allowed between them) occur in the most sessions — PrefixSpan's
# support question restricted to length-3 patterns, answerable exactly
# in relational algebra. Containment reduction (what keeps the join
# small): a session contains a..b..c iff min_rn(a) < some rn(b) <
# max_rn(c) — (<=) such a b gives a = the earliest a-occurrence and
# c = the latest c-occurrence directly; (=>) any witnessing a < b < c
# implies min_rn(a) <= rn_a < rn_b < rn_c <= max_rn(c). So the first
# and last legs of the triple join collapse to one row per
# (session, type) and only the middle leg scans raw occurrences.

GTP_TOP = 20


def q_events_gapped_triple_patterns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(t1, t2, t3, n_sessions): the GTP_TOP ordered type-triples by
    distinct-session support under the standard gap sessionization —
    the behavior-model miner next to events_session_archetypes (which
    counts only CONTIGUOUS whole-session signatures; this counts
    subsequences with arbitrary gaps).

    Scale shape: the one sessionize exchange, a per-session rank
    window, then all joins are equi-joins on the (user, session) key
    with rank inequalities as residuals — co-partitioned after one
    exchange, never a cross. The first/last legs are one row per
    (session, type); the middle leg's fanout is bounded by session
    length, and sessions are gap-bounded. TakeOrderedAndProject caps
    the output."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_sid = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    occ = cache_eager(
        with_sid.select(
            "user_id",
            "session_seq",
            F.col("event_type").alias("t"),
            F.row_number().over(ws).alias("rn"),
        )
    )
    keys = ["user_id", "session_seq"]
    first = occ.groupBy(*keys, "t").agg(F.min("rn").alias("rn1"))
    first = first.select(*keys, F.col("t").alias("t1"), "rn1")
    last = occ.groupBy(*keys, "t").agg(F.max("rn").alias("rn3"))
    last = last.select(*keys, F.col("t").alias("t3"), "rn3")
    mid = occ.select(
        *keys, F.col("t").alias("t2"), F.col("rn").alias("rn2")
    )
    trip = (
        first.join(mid, keys)
        .filter(F.col("rn2") > F.col("rn1"))
        .join(last, keys)
        .filter(F.col("rn3") > F.col("rn2"))
        .select(*keys, "t1", "t2", "t3")
        .distinct()
    )
    return (
        trip.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "t1", "t2", "t3")
        .limit(GTP_TOP)
    )


ORACLE_EVENTS_GAPPED_TRIPLE_PATTERNS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS * 1_000_000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
occ AS MATERIALIZED (
  SELECT user_id, session_seq, event_type AS t,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM sid
),
firsts AS (
  SELECT user_id, session_seq, t AS t1, min(rn) AS rn1
  FROM occ GROUP BY 1, 2, 3
),
lasts AS (
  SELECT user_id, session_seq, t AS t3, max(rn) AS rn3
  FROM occ GROUP BY 1, 2, 3
),
trip AS (
  SELECT DISTINCT f.user_id, f.session_seq, f.t1, m.t AS t2, l.t3
  FROM firsts f
  JOIN occ m ON m.user_id = f.user_id AND m.session_seq = f.session_seq
            AND m.rn > f.rn1
  JOIN lasts l ON l.user_id = f.user_id AND l.session_seq = f.session_seq
             AND l.rn3 > m.rn
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_sessions
FROM trip
GROUP BY 1, 2, 3
ORDER BY n_sessions DESC, t1, t2, t3
LIMIT {GTP_TOP}
"""


# ---------------------------------------------------------------------------
# Variable-length gapped patterns (r14, closing the r13 verdict's item
# #5): per-k top-j distinct-session support for ordered type k-tuples,
# k in GPK_KS — the PrefixSpan support surface over lengths 2..4 under
# the SAME containment reduction as the fixed-k=3 miner above.
#
# Reductions per k (all provably support-preserving):
#   k=2: session contains a..b  iff  min_rn(a) < max_rn(b) — BOTH legs
#        collapse to one row per (session, type).
#   k=3: the triple reduction above (first leg min, last leg max, one
#        raw middle leg, fanout <= session length L).
#   k=4: first/last legs collapse as always; the middle PAIR collapses
#        to its CANONICAL witnesses — for each t2-occurrence rn2 and
#        each type t3, only the NEXT t3-occurrence after rn2 survives
#        (rn3 = min t3-occ > rn2). Support-preserving: a witness
#        quadruple rn1'<rn2'<rn3'<rn4' yields the canonical row
#        (rn2', min t3-occ > rn2') with rn3c <= rn3' < rn4' <=
#        max_rn(t4), and conversely a canonical row inside the
#        (min_rn(t1), max_rn(t4)) window IS a witness. This cuts the
#        relation feeding the 4-way join from L^2 raw pairs to L*T
#        canonical pairs (T = distinct types in the session).

GPK_KS = (2, 3, 4)
GPK_TOP = 8


def q_events_gapped_patterns_by_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(k, rank, p1..p4, n_sessions): the GPK_TOP ordered type k-tuples
    by distinct-session support for each k in {2, 3, 4} (gaps allowed
    between pattern positions; '' pads unused slots so the schema is
    k-independent). Rank ties break lexicographically on the pattern.

    Scale shape: ONE sessionize exchange, then every join is an
    equi-join on the (user, session) key with rank inequalities as
    residuals — co-partitioned, never a cross. The k=2 leg joins two
    one-row-per-(session,type) relations; k=3's middle-leg fanout is
    bounded by session length L (gap-bounded); k=4's middle pair is
    pre-collapsed to canonical next-occurrence witnesses (L*T rows per
    session, down from L^2) BEFORE it meets the first/last legs. Each
    k's pattern relation is DISTINCT-ed at (session, pattern) grain
    before the global support count; per-k top-j is one window over the
    (small) pattern-support relation."""
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    with_sid = ev.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    occ = cache_eager(
        with_sid.select(
            "user_id",
            "session_seq",
            F.col("event_type").alias("t"),
            F.row_number().over(ws).alias("rn"),
        )
    )
    keys = ["user_id", "session_seq"]
    firsts = cache_eager(
        occ.groupBy(*keys, "t").agg(F.min("rn").alias("rn_first"))
    )
    lasts = cache_eager(
        occ.groupBy(*keys, "t").agg(F.max("rn").alias("rn_last"))
    )
    f1 = firsts.select(*keys, F.col("t").alias("p1"), "rn_first")
    # k=2: both legs collapsed
    pat2 = (
        f1.join(
            lasts.select(*keys, F.col("t").alias("p2"), "rn_last"), keys
        )
        .filter(F.col("rn_last") > F.col("rn_first"))
        .select(*keys, "p1", "p2")
    )
    # k=3: one raw middle leg
    pat3 = (
        f1.join(
            occ.select(*keys, F.col("t").alias("p2"), F.col("rn").alias("rn2")),
            keys,
        )
        .filter(F.col("rn2") > F.col("rn_first"))
        .join(
            lasts.select(*keys, F.col("t").alias("p3"), "rn_last"), keys
        )
        .filter(F.col("rn_last") > F.col("rn2"))
        .select(*keys, "p1", "p2", "p3")
        .distinct()
    )
    # k=4: canonical next-occurrence middle pairs
    a = occ.select(*keys, F.col("t").alias("p2"), F.col("rn").alias("rn2"))
    b = occ.select(*keys, F.col("t").alias("p3"), F.col("rn").alias("rnb"))
    midpairs = (
        a.join(b, keys)
        .filter(F.col("rnb") > F.col("rn2"))
        .groupBy(*keys, "p2", "rn2", "p3")
        .agg(F.min("rnb").alias("rn3"))
    )
    pat4 = (
        f1.join(midpairs, keys)
        .filter(F.col("rn2") > F.col("rn_first"))
        .join(
            lasts.select(*keys, F.col("t").alias("p4"), "rn_last"), keys
        )
        .filter(F.col("rn_last") > F.col("rn3"))
        .select(*keys, "p1", "p2", "p3", "p4")
        .distinct()
    )
    empty = F.lit("")
    legs = [
        pat2.select(
            F.lit(2).cast("bigint").alias("k"), "p1", "p2",
            empty.alias("p3"), empty.alias("p4"), *keys,
        ),
        pat3.select(
            F.lit(3).cast("bigint").alias("k"), "p1", "p2", "p3",
            empty.alias("p4"), *keys,
        ),
        pat4.select(
            F.lit(4).cast("bigint").alias("k"), "p1", "p2", "p3", "p4",
            *keys,
        ),
    ]
    allpats = legs[0].unionByName(legs[1]).unionByName(legs[2])
    support = allpats.groupBy("k", "p1", "p2", "p3", "p4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    wk = W.partitionBy("k").orderBy(
        F.col("n_sessions").desc(), "p1", "p2", "p3", "p4"
    )
    return (
        support.withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= GPK_TOP)
        .select("k", "rank", "p1", "p2", "p3", "p4", "n_sessions")
        .orderBy("k", "rank")
    )


ORACLE_EVENTS_GAPPED_PATTERNS_BY_K = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS * 1_000_000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
occ AS MATERIALIZED (
  SELECT user_id, session_seq, event_type AS t,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS rn
  FROM sid
),
firsts AS MATERIALIZED (
  SELECT user_id, session_seq, t, min(rn) AS rn_first
  FROM occ GROUP BY 1, 2, 3
),
lasts AS MATERIALIZED (
  SELECT user_id, session_seq, t, max(rn) AS rn_last
  FROM occ GROUP BY 1, 2, 3
),
pat2 AS (
  SELECT f.user_id, f.session_seq, f.t AS p1, l.t AS p2
  FROM firsts f
  JOIN lasts l ON l.user_id = f.user_id AND l.session_seq = f.session_seq
             AND l.rn_last > f.rn_first
),
pat3 AS (
  SELECT DISTINCT f.user_id, f.session_seq, f.t AS p1, m.t AS p2, l.t AS p3
  FROM firsts f
  JOIN occ m ON m.user_id = f.user_id AND m.session_seq = f.session_seq
            AND m.rn > f.rn_first
  JOIN lasts l ON l.user_id = f.user_id AND l.session_seq = f.session_seq
             AND l.rn_last > m.rn
),
midpairs AS (
  SELECT a.user_id, a.session_seq, a.t AS p2, a.rn AS rn2, b.t AS p3,
         min(b.rn) AS rn3
  FROM occ a
  JOIN occ b ON b.user_id = a.user_id AND b.session_seq = a.session_seq
            AND b.rn > a.rn
  GROUP BY 1, 2, 3, 4, 5
),
pat4 AS (
  SELECT DISTINCT f.user_id, f.session_seq,
                  f.t AS p1, m.p2, m.p3, l.t AS p4
  FROM firsts f
  JOIN midpairs m ON m.user_id = f.user_id AND m.session_seq = f.session_seq
                 AND m.rn2 > f.rn_first
  JOIN lasts l ON l.user_id = f.user_id AND l.session_seq = f.session_seq
             AND l.rn_last > m.rn3
),
allpats AS (
  SELECT CAST(2 AS BIGINT) AS k, p1, p2, '' AS p3, '' AS p4,
         user_id, session_seq FROM pat2
  UNION ALL
  SELECT CAST(3 AS BIGINT), p1, p2, p3, '', user_id, session_seq FROM pat3
  UNION ALL
  SELECT CAST(4 AS BIGINT), p1, p2, p3, p4, user_id, session_seq FROM pat4
),
support AS (
  SELECT k, p1, p2, p3, p4, CAST(count(*) AS BIGINT) AS n_sessions
  FROM allpats GROUP BY 1, 2, 3, 4, 5
),
ranked AS (
  SELECT k, p1, p2, p3, p4, n_sessions,
         CAST(row_number() OVER (PARTITION BY k
              ORDER BY n_sessions DESC, p1, p2, p3, p4) AS BIGINT) AS rank
  FROM support
)
SELECT k, rank, p1, p2, p3, p4, n_sessions
FROM ranked
WHERE rank <= {GPK_TOP}
ORDER BY k, rank
"""


QUERIES = {
    "events_theil_sen_slope": q_events_theil_sen_slope,
    "events_gapped_patterns_by_k": q_events_gapped_patterns_by_k,
    "events_weekly_retention": q_events_weekly_retention,
    "events_gapped_triple_patterns": q_events_gapped_triple_patterns,
    "events_ab_lift_report": q_events_ab_lift_report,
    "events_holt_forecast": q_events_holt_forecast,
    "events_markov_stationary": q_events_markov_stationary,
    "events_mann_kendall": q_events_mann_kendall,
    "events_poisson_dispersion": q_events_poisson_dispersion,
    "events_runs_test": q_events_runs_test,
    "events_transition_entropy": q_events_transition_entropy,
    "events_session_archetypes": q_events_session_archetypes,
    "events_lorenz_deciles": q_events_lorenz_deciles,
    "rollup_incremental_merge": q_rollup_incremental_merge,
    "events_cusum_changepoint": q_events_cusum_changepoint,
    "events_props_key_inventory": q_events_props_key_inventory,
    "events_funnel_latency": q_events_funnel_latency,
    "events_lateness_histogram": q_events_lateness_histogram,
    "events_watermark_recommendation": q_events_watermark_recommendation,
    "events_session_gap_sweep": q_events_session_gap_sweep,
    "events_seasonal_naive_error": q_events_seasonal_naive_error,
    "events_type_cooccurrence": q_events_type_cooccurrence,
    "events_weekday_hour_profile": q_events_weekday_hour_profile,
    "events_burst_report": q_events_burst_report,
    "events_user_lifecycle": q_events_user_lifecycle,
    "events_hourly_autocorrelation": q_events_hourly_autocorrelation,
    "events_value_percentiles": q_events_value_percentiles,
    "events_dau_wau_stickiness": q_events_dau_wau_stickiness,
    "events_interarrival_percentiles": q_events_interarrival_percentiles,
    "events_hour_uniformity": q_events_hour_uniformity,
    "events_state_drift": q_events_state_drift,
    "events_transition_matrix": q_events_transition_matrix,
    "events_hourly_rollup": q_events_hourly_rollup,
    "events_daily_rollup": q_events_daily_rollup,
    "events_sessionize": q_events_sessionize,
    "events_json_props": q_events_json_props,
    "events_json_props_variant": q_events_json_props_variant,
    "events_asof_prior_click": q_events_asof_prior_click,
    "events_attribution_window": q_events_attribution_window,
    "events_funnel": q_events_funnel,
    "events_dedup_counts": q_events_dedup_counts,
    "events_user_rolling": q_events_user_rolling,
    "events_session_native": q_events_session_native,
    "events_latest_state": q_events_latest_state,
    "events_scd2": q_events_scd2,
    "events_retention_cohorts": q_events_retention_cohorts,
    "events_active_users": q_events_active_users,
    "events_anomaly_hours": q_events_anomaly_hours,
    "events_power_users": q_events_power_users,
}

ORACLES = {
    "events_theil_sen_slope": ORACLE_EVENTS_THEIL_SEN,
    "events_ab_lift_report": ORACLE_EVENTS_AB_LIFT,
    "events_holt_forecast": ORACLE_EVENTS_HOLT,
    "events_markov_stationary": ORACLE_MARKOV_STATIONARY,
    "events_mann_kendall": ORACLE_EVENTS_MANN_KENDALL,
    "events_poisson_dispersion": ORACLE_EVENTS_POISSON_DISPERSION,
    "events_runs_test": ORACLE_EVENTS_RUNS_TEST,
    "events_transition_entropy": ORACLE_EVENTS_TRANSITION_ENTROPY,
    "events_session_archetypes": ORACLE_SESSION_ARCHETYPES,
    "events_lorenz_deciles": ORACLE_LORENZ_DECILES,
    "rollup_incremental_merge": ORACLE_ROLLUP_INCREMENTAL_MERGE,
    "events_cusum_changepoint": ORACLE_EVENTS_CUSUM,
    "events_props_key_inventory": ORACLE_PROPS_KEY_INVENTORY,
    "events_funnel_latency": ORACLE_FUNNEL_LATENCY,
    "events_lateness_histogram": ORACLE_LATENESS_HISTOGRAM,
    "events_watermark_recommendation": ORACLE_WATERMARK_RECOMMENDATION,
    "events_session_gap_sweep": ORACLE_SESSION_GAP_SWEEP,
    "events_seasonal_naive_error": ORACLE_SEASONAL_NAIVE,
    "events_type_cooccurrence": ORACLE_TYPE_COOCCURRENCE,
    "events_weekday_hour_profile": ORACLE_WEEKDAY_HOUR_PROFILE,
    "events_burst_report": ORACLE_BURST_REPORT,
    "events_user_lifecycle": ORACLE_USER_LIFECYCLE,
    "events_hourly_autocorrelation": ORACLE_HOURLY_AUTOCORR,
    "events_value_percentiles": ORACLE_EVENTS_VALUE_PERCENTILES,
    "events_dau_wau_stickiness": ORACLE_DAU_WAU_STICKINESS,
    "events_interarrival_percentiles": ORACLE_INTERARRIVAL,
    "events_hour_uniformity": ORACLE_HOUR_UNIFORMITY,
    "events_state_drift": ORACLE_STATE_DRIFT,
    "events_transition_matrix": ORACLE_TRANSITION_MATRIX,
    "events_hourly_rollup": ORACLE_EVENTS_HOURLY,
    "events_daily_rollup": ORACLE_EVENTS_DAILY,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_gapped_triple_patterns": ORACLE_EVENTS_GAPPED_TRIPLE_PATTERNS,
    "events_gapped_patterns_by_k": ORACLE_EVENTS_GAPPED_PATTERNS_BY_K,
    "events_weekly_retention": ORACLE_EVENTS_WEEKLY_RETENTION,
    "events_json_props": ORACLE_EVENTS_JSON,
    "events_json_props_variant": ORACLE_EVENTS_JSON,
    "events_asof_prior_click": ORACLE_EVENTS_ASOF,
    "events_attribution_window": ORACLE_EVENTS_ATTRIBUTION,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_dedup_counts": ORACLE_EVENTS_DEDUP,
    "events_user_rolling": ORACLE_EVENTS_ROLLING,
    "events_session_native": ORACLE_EVENTS_SESSIONIZE,
    "events_latest_state": ORACLE_EVENTS_LATEST_STATE,
    "events_scd2": ORACLE_EVENTS_SCD2,
    "events_retention_cohorts": ORACLE_EVENTS_RETENTION,
    "events_active_users": ORACLE_EVENTS_ACTIVE_USERS,
    "events_anomaly_hours": ORACLE_EVENTS_ANOMALY,
    "events_power_users": ORACLE_EVENTS_POWER_USERS,
}
