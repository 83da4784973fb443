"""Session-window boundary semantics (gate q65).

The fixture data has microsecond timestamps, so exact-gap boundaries
essentially never occur there — this test pins them deliberately: an
event exactly `gap` after the previous one must MERGE (Spark's
session_window extends through ts + gap inclusive), and the DuckDB
oracle's strict-inequality break flag must reproduce that, on BOTH an
exact-boundary merge and a one-microsecond-past split."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

_ROWS = [
    # u, ts, event_id
    (1, "2024-01-01 00:00:00.000000", 1),
    (1, "2024-01-01 00:30:00.000000", 2),   # exactly gap later -> MERGE
    (1, "2024-01-01 00:59:59.000000", 3),   # inside -> merge
    (1, "2024-01-01 01:29:59.000001", 4),   # 1us past gap -> NEW session
    (1, "2024-01-01 05:00:00.000000", 5),
    (2, "2024-01-01 00:00:00.000000", 6),   # other user independent
    (2, "2024-01-01 00:00:00.000000", 7),   # equal-ts same user: merge
]


def _spark_sessions(spark):
    df = spark.createDataFrame(
        _ROWS, "user_id long, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = (
        df.groupBy("user_id",
                   F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("event_id").alias("min_id"),
             F.max("event_id").alias("max_id"))
        .select("user_id",
                F.unix_micros(F.col("w.start").cast("timestamp"))
                .alias("s"),
                F.unix_micros(F.col("w.end").cast("timestamp"))
                .alias("e"),
                "n", "min_id", "max_id")
    )
    return sorted(tuple(r) for r in out.collect())


def _oracle_sessions():
    con = duckdb.connect()
    con.register("ev", pd.DataFrame(
        {"user_id": [r[0] for r in _ROWS],
         "ts": pd.to_datetime([r[1] for r in _ROWS]),
         "event_id": [r[2] for r in _ROWS]}
    ))
    rows = con.execute("""
with flagged as (
  select user_id, ts, event_id,
         case when ts - lag(ts) over (partition by user_id
                                      order by ts, event_id)
                   > interval 30 minute
              then 1 else 0 end as brk
  from ev
),
sessions as (
  select user_id, ts, event_id,
         sum(brk) over (partition by user_id order by ts, event_id
                        rows unbounded preceding) as sid
  from flagged
)
select user_id,
       epoch_us(min(ts)) as s,
       epoch_us(max(ts) + interval 30 minute) as e,
       count(*) as n, min(event_id) as min_id, max(event_id) as max_id
from sessions group by user_id, sid
""").fetchall()
    return sorted(tuple(r) for r in rows)


def test_exact_gap_merges_and_one_us_past_splits(spark):
    got = _spark_sessions(spark)
    # user 1: events 1-3 one session (exact-gap event 2 merged), event 4
    # (1us past the extended window) starts a new one, event 5 its own
    by_user1 = [r for r in got if r[0] == 1]
    assert [r[3] for r in by_user1] == [3, 1, 1]  # n per session
    assert (by_user1[0][4], by_user1[0][5]) == (1, 3)
    assert (by_user1[1][4], by_user1[1][5]) == (4, 4)
    # user 2: equal timestamps collapse into one session
    by_user2 = [r for r in got if r[0] == 2]
    assert [(r[3], r[4], r[5]) for r in by_user2] == [(2, 6, 7)]


def test_oracle_formulation_matches_spark_exactly(spark):
    assert _spark_sessions(spark) == _oracle_sessions()


def test_streaming_session_window_merges_across_batches(spark, tmp_path):
    """q65's production form: session_window in a REAL stream (file
    source, availableNow, append mode).  An open session whose events
    span two micro-batches must merge through the state store — a
    stateless per-batch sessionization would emit it twice.  A far-future
    sentinel batch pushes the watermark so every real session finalizes
    and emits."""
    import os
    import time
    import uuid

    batches = [
        [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:20:00", 2),
         (2, "2024-01-01 00:00:00", 10)],
        # event 3 lands 20min after event 2 -> SAME session, new batch
        [(1, "2024-01-01 00:40:00", 3), (1, "2024-01-01 02:00:00", 4),
         (2, "2024-01-01 03:00:00", 11)],
        [(999, "2034-01-01 00:00:00", 99)],  # watermark sentinel
    ]
    schema = "user_id long, ts string, event_id long"
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = time.time()
    for i, rows in enumerate(batches):
        d = feed / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d))
        # file stream orders by mtime ONLY — pin them well apart
        for fn in os.listdir(d):
            os.utime(d / fn, (t0 + 100 * i, t0 + 100 * i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "*"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
    )
    sess = (
        stream.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("event_id").alias("min_id"),
             F.max("event_id").alias("max_id"))
        .select("user_id",
                F.unix_micros("w.start").alias("s"),
                F.unix_micros("w.end").alias("e"),
                "n", "min_id", "max_id")
    )
    qname = f"sess_{uuid.uuid4().hex[:8]}"
    q = (sess.writeStream.outputMode("append").format("memory")
         .queryName(qname)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = {tuple(r) for r in spark.table(qname).collect()
           if r.user_id != 999}

    batch_df = spark.createDataFrame(
        [r for b in batches[:2] for r in b], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want_df = (
        batch_df.groupBy("user_id",
                         F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("event_id").alias("min_id"),
             F.max("event_id").alias("max_id"))
        .select("user_id",
                F.unix_micros("w.start").alias("s"),
                F.unix_micros("w.end").alias("e"),
                "n", "min_id", "max_id")
    )
    want = {tuple(r) for r in want_df.collect()}
    assert got == want
    # the cross-batch merge is present: user 1's first session holds
    # events 1,2 (batch 0) AND 3 (batch 1) as ONE row
    assert (1, 1704067200000000, 1704071400000000, 3, 1, 3) in got
