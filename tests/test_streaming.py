"""Structured Streaming ingest tests: file-source micro-batches through
the same bucketize path as batch, windowed rollups, foreachBatch
partial-aggregate rollup table."""

import pytest
from pyspark.sql import functions as F

from kairos_spark.config import parse_intervals
from kairos_spark.ingest import bucketize
from kairos_spark.streaming import (
    foreach_batch_rollup,
    stream_ingest,
    windowed_rollup,
)

BASE = 500000 * 3600
INTERVALS = parse_intervals({"minute": {"step": 60}, "hour": {"step": 3600, "resolution": 60}})
SCHEMA = "name string, ts timestamp, value double"


@pytest.fixture()
def input_dir(spark, tmp_path):
    rows = [("a", float(BASE + i * 30), float(i)) for i in range(20)]
    df = spark.createDataFrame(
        [(n, t, v) for n, t, v in rows], "name string, ts_sec double, value double"
    ).select("name", F.timestamp_seconds("ts_sec").alias("ts"), "value")
    path = str(tmp_path / "in")
    df.coalesce(2).write.parquet(path)
    return path


def _batch_df(spark, input_dir):
    return spark.read.schema(SCHEMA).parquet(input_dir)


def test_stream_ingest_matches_batch(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = stream_ingest(
        stream, out, chk, INTERVALS, watermark="1 hour", trigger_available_now=True
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .groupBy("interval", "i_time", "r_time")
        .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
    )
    expected = (
        bucketize(_batch_df(spark, input_dir), INTERVALS)
        .groupBy("interval", "i_time", "r_time")
        .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_windowed_rollup_memory_sink(spark, input_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    rollup = windowed_rollup(stream, series_type="count", step_seconds=60)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["name"], r["i_time"]): r["value"]
        for r in spark.sql("SELECT * FROM rollup_counts").collect()
    }
    expected = {
        (r["name"], r["i_time"]): r["v"]
        for r in _batch_df(spark, input_dir)
        .groupBy(
            F.col("name"),
            (F.floor(F.unix_timestamp("ts") / 60) * 60).cast("long").alias("i_time"),
        )
        .agg(F.sum("value").alias("v"))
        .collect()
    }
    assert got == expected


def test_foreach_batch_rollup(spark, input_dir, tmp_path):
    out = str(tmp_path / "rollup")
    chk = str(tmp_path / "chk2")
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    q = foreach_batch_rollup(stream, out, chk, INTERVALS, trigger_available_now=True)
    q.awaitTermination(120)
    # final aggregation over partials == batch aggregate
    final = (
        spark.read.parquet(out)
        .groupBy("interval", "i_time", "r_time")
        .agg(F.sum("value").alias("v"), F.sum("n").alias("n"))
    )
    expected = (
        bucketize(_batch_df(spark, input_dir), INTERVALS)
        .groupBy("interval", "i_time", "r_time")
        .agg(F.sum("value").alias("v"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, expected.collect()))


def test_windowed_rollup_gauge(spark, input_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    rollup = windowed_rollup(stream, series_type="gauge", step_seconds=60)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_gauge")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["name"], r["i_time"]): r["value"]
        for r in spark.sql("SELECT * FROM rollup_gauge").collect()
    }
    # last write per minute bucket (ts ascending == insert order here)
    expected = {
        (r["name"], r["i_time"]): r["v"]
        for r in _batch_df(spark, input_dir)
        .groupBy(
            F.col("name"),
            (F.floor(F.unix_timestamp("ts") / 60) * 60).cast("long").alias("i_time"),
        )
        .agg(F.max_by("value", F.unix_micros("ts")).alias("v"))
        .collect()
    }
    assert got == expected


def test_stateful_sessionize_closes_on_gap(spark, tmp_path):
    from kairos_spark.streaming import stateful_sessionize

    # user 7: events at t, t+10, then a >gap jump (closes session 1,
    # opens session 2 which stays open); user 8: one open session
    rows = [
        (7, float(BASE)), (7, float(BASE + 10)), (7, float(BASE + 5000)),
        (8, float(BASE + 20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_sec double").select(
        "user_id", F.timestamp_seconds("ts_sec").alias("ts")
    )
    path = str(tmp_path / "sess_in")
    df.coalesce(1).write.parquet(path)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(path)
    out = stateful_sessionize(stream, gap_sec=1800.0, watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # user 7 session 1 closed by the in-stream gap; user 8's idle
    # session closed by the event-time TIMEOUT (watermark = max_ts-10s
    # passed its last+gap). user 7 session 2 (last+gap > watermark) is
    # still open in state and must NOT be emitted.
    assert set(got) == {(7, 2), (8, 1)}
    start, end = got[(7, 2)]
    assert (end - start).total_seconds() == 10.0
    s8, e8 = got[(8, 1)]
    assert s8 == e8


def test_stream_exact_dedup(spark, tmp_path):
    from kairos_spark.streaming.dedup import stream_exact_dedup

    # 6 rows, 3 distinct texts (each duplicated once, within watermark)
    rows = [
        ("doc-a", BASE + 0), ("doc-b", BASE + 10), ("doc-a", BASE + 20),
        ("doc-c", BASE + 30), ("doc-b", BASE + 40), ("doc-c", BASE + 50),
    ]
    df = spark.createDataFrame(
        [(t, float(s)) for t, s in rows], "text string, ts_sec double"
    ).select("text", F.timestamp_seconds("ts_sec").alias("ts"))
    src = str(tmp_path / "dedup_in")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("text string, ts timestamp").parquet(src)
    deduped = stream_exact_dedup(stream, text_col="text", ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "dedup_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["text"] for r in spark.sql("SELECT text FROM dedup_sink").collect())
    assert got == ["doc-a", "doc-b", "doc-c"]

    # batch fallback keeps the same contract
    batch = stream_exact_dedup(spark.read.schema("text string, ts timestamp").parquet(src))
    assert batch.count() == 3
    assert "__digest" not in batch.columns


def test_windowed_rollup_sliding(spark, input_dir):
    # 1-minute windows sliding every 30 s: each event lands in 2 windows,
    # so the total count across windows is 2x the event count
    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    rolled = windowed_rollup(
        stream, "count", step_seconds=60, watermark="1 hour", slide_seconds=30
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName("slide_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM slide_sink").collect()
    total = (
        spark.read.schema(SCHEMA).parquet(input_dir)
        .agg(F.sum("value")).collect()[0][0]
    )
    # count-type rollup sums the increments; each event lands in 2 windows
    assert sum(r["value"] for r in rows) == 2 * total
    # window starts align to the 30 s slide grid
    assert all(r["i_time"] % 30 == 0 for r in rows)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        windowed_rollup(stream, "count", step_seconds=60, slide_seconds=45)


def test_windowed_rollup_rejects_nonpositive_slide(spark, input_dir):
    import pytest

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    with pytest.raises(ValueError, match="slide_seconds must be positive"):
        windowed_rollup(stream, series_type="count", step_seconds=60, slide_seconds=0)


def test_text_quality_ops_compose_with_streams(spark, tmp_path):
    # the text operators are stateless narrow projections, so they run
    # unchanged on a streaming DataFrame — the shape of a streaming
    # training-data quality filter (score -> threshold -> sink)
    from kairos_spark.operators import text

    docs = spark.createDataFrame(
        [(1, "the quick brown fox is here for the win with many fine words"),
         (2, "zz!!")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    scored = text.quality_score(stream).where(F.col("quality") > 0.2)
    q = (
        scored.writeStream.format("memory")
        .queryName("stream_quality")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id FROM stream_quality").collect()
    assert [r["doc_id"] for r in got] == [1]


def test_streaming_sketch_distinct_matches_batch(spark, input_dir):
    # the cardinality sketch is a plain (map-side-combinable) aggregate,
    # so it runs as a watermarked streaming groupBy unchanged — bounded
    # O(k) state per key, the streaming distinct-count path
    from kairos_spark.operators import sketches

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    sk = sketches.minhash_distinct_sketch(
        stream.withWatermark("ts", "1 hour"), ["name"], "value", k=16
    )
    q = (
        sk.writeStream.format("memory")
        .queryName("stream_sketch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stream_sketch").collect()
    batch = sketches.minhash_distinct_sketch(
        _batch_df(spark, input_dir), ["name"], "value", k=16
    ).collect()
    assert {r["name"]: r["sketch"] for r in got} == {
        r["name"]: r["sketch"] for r in batch
    }


def test_streaming_cms_counters_match_batch(spark, input_dir):
    # the count-min counter table is a plain aggregate with bounded
    # d*w state, so it runs as a streaming groupBy unchanged — the
    # streaming heavy-hitter path
    from kairos_spark.operators import sketches

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    counters = sketches.cms_counters(
        stream.withWatermark("ts", "1 hour").select(F.col("name").alias("term")),
        d=2,
        w=32,
    )
    q = (
        counters.writeStream.format("memory")
        .queryName("stream_cms")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["__j"], r["__bkt"]): r["__c"]
        for r in spark.sql("SELECT * FROM stream_cms").collect()
    }
    batch = {
        (r["__j"], r["__bkt"]): r["__c"]
        for r in sketches.cms_counters(
            _batch_df(spark, input_dir).select(F.col("name").alias("term")),
            d=2,
            w=32,
        ).collect()
    }
    assert got == batch


def test_stream_stream_interval_join(spark, tmp_path):
    # stream-stream inner join with watermarks + time-range condition:
    # each "click" joined to "purchase" rows of the same user within
    # [click, click + 10 min] — the Structured Streaming join the
    # banded batch range-join corresponds to
    rows = [
        ("click", 1, float(BASE + 0)),
        ("purchase", 1, float(BASE + 300)),     # within 10 min -> match
        ("purchase", 1, float(BASE + 3000)),    # outside -> no match
        ("click", 2, float(BASE + 100)),
        ("purchase", 3, float(BASE + 200)),     # other user -> no match
    ]
    src = str(tmp_path / "ss_in")
    spark.createDataFrame(
        rows, "etype string, user bigint, ts_sec double"
    ).select("etype", "user", F.timestamp_seconds("ts_sec").alias("ts")).write.parquet(src)

    stream = spark.readStream.schema(
        "etype string, user bigint, ts timestamp"
    ).parquet(src)
    clicks = (
        stream.where("etype = 'click'")
        .select("user", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.where("etype = 'purchase'")
        .select(F.col("user").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user, p_ts FROM ss_join").collect()
    assert len(got) == 1
    assert got[0]["user"] == 1


def test_streaming_bloom_filter_maintenance(spark, tmp_path):
    # the bloom word table is a bit_or aggregate -> mergeable, so a
    # stream can maintain it incrementally in complete mode; the
    # resulting filter must equal the batch-built filter over the same
    # keys (and therefore keep the no-false-negative guarantee)
    from pyspark.sql import functions as SF

    rows = [(i,) for i in range(200)]
    src = str(tmp_path / "bloom_in")
    spark.createDataFrame(rows, "k bigint").write.parquet(src)

    def probes(df):
        js = SF.array(*[SF.lit(j) for j in range(3)])
        pos = (
            SF.conv(
                SF.substring(
                    SF.md5(SF.concat(SF.col("__j").cast("string"), SF.lit(":"),
                                     SF.col("k").cast("string"))),
                    1, 11,
                ), 16, 10,
            ).cast("long") % 4096
        )
        return (
            df.select("k", SF.explode(js).alias("__j"))
            .select(pos.alias("__pos"))
            .select(
                (SF.col("__pos") / 32).cast("long").alias("w"),
                SF.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))").alias("m"),
            )
        )

    stream = spark.readStream.schema("k bigint").parquet(src)
    q = (
        probes(stream).groupBy("w").agg(SF.bit_or("m").alias("bits"))
        .writeStream.format("memory").queryName("stream_bloom")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["w"]: r["bits"] for r in spark.sql("SELECT * FROM stream_bloom").collect()
    }
    batch = {
        r["w"]: r["bits"]
        for r in probes(spark.read.parquet(src)).groupBy("w")
        .agg(SF.bit_or("m").alias("bits")).collect()
    }
    assert got == batch


def test_interval_attribution_join_stream_and_batch_agree(spark, tmp_path):
    from kairos_spark.streaming import interval_attribution_join

    rows = [
        ("click", 1, float(BASE + 0)),
        ("purchase", 1, float(BASE + 300)),   # within 10 min -> match
        ("purchase", 1, float(BASE + 3000)),  # outside -> no match
        ("click", 2, float(BASE + 100)),
        ("purchase", 3, float(BASE + 200)),   # other user -> no match
    ]
    src = str(tmp_path / "attr_in")
    spark.createDataFrame(
        rows, "etype string, user_id bigint, ts_sec double"
    ).select("etype", "user_id", F.timestamp_seconds("ts_sec").alias("ts")).write.parquet(src)

    def split(df):
        clicks = df.where("etype = 'click'").select("user_id", "ts")
        buys = df.where("etype = 'purchase'").select("user_id", "ts", "etype")
        return clicks, buys

    # batch path: same operator, same condition
    bdf = spark.read.parquet(src)
    bc, bp = split(bdf)
    batch = interval_attribution_join(bc, bp, horizon_sec=600).collect()
    assert len(batch) == 1 and batch[0]["user_id"] == 1

    stream = spark.readStream.schema("etype string, user_id bigint, ts timestamp").parquet(src)
    sc, sp = split(stream)
    out = interval_attribution_join(sc, sp, horizon_sec=600)
    q = (
        out.writeStream.format("memory").queryName("attr_join")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, ts, ts_r FROM attr_join").collect()
    assert len(got) == 1 and got[0]["user_id"] == 1
    assert (got[0]["ts_r"] - got[0]["ts"]).total_seconds() == 300.0


def test_streaming_hll_registers_match_batch(spark, input_dir):
    # HLL registers are a plain max-aggregate with <= groups x 2^p
    # state, so they run as a streaming groupBy unchanged — the
    # streaming approximate-distinct path; registers (and therefore the
    # estimate) agree with batch exactly
    from kairos_spark.operators import sketches

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    regs = sketches.hll_registers(
        stream.withWatermark("ts", "1 hour"), ["name"], "value", p=8
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("stream_hll")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["name"], r["reg"]): r["rho"]
        for r in spark.sql("SELECT * FROM stream_hll").collect()
    }
    batch = {
        (r["name"], r["reg"]): r["rho"]
        for r in sketches.hll_registers(
            _batch_df(spark, input_dir), ["name"], "value", p=8
        ).collect()
    }
    assert got == batch


def test_streaming_fingerprint_matches_batch(spark, input_dir):
    # the additive-mod-prime table fingerprint is a plain sum
    # aggregate, so it streams unchanged with bounded per-group state;
    # checksums agree with batch exactly (order independence is the
    # whole point of the additive construction)
    from kairos_spark.operators import profiling

    stream = spark.readStream.schema(SCHEMA).parquet(input_dir)
    fp = profiling.group_fingerprint(
        stream.withWatermark("ts", "1 hour"), "name", ["ts", "value"]
    )
    q = (
        fp.writeStream.format("memory")
        .queryName("stream_fp")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["group"]: (r["n_rows"], r["fingerprint"])
        for r in spark.sql("SELECT * FROM stream_fp").collect()
    }
    batch = {
        r["group"]: (r["n_rows"], r["fingerprint"])
        for r in profiling.group_fingerprint(
            _batch_df(spark, input_dir), "name", ["ts", "value"]
        ).collect()
    }
    assert got == batch and got  # non-empty agreement


def test_stream_source_quota_admission(spark, tmp_path):
    from kairos_spark.streaming.quota import stream_source_quota

    # source A: 3 docs of 40 tokens into a 100-token window -> third
    # rejected; a later 15-token doc still fits (no high-water block).
    # source B: everything fits.
    rows = [
        ("A", 1, BASE + 0, 40), ("A", 2, BASE + 10, 40),
        ("A", 3, BASE + 20, 40), ("A", 4, BASE + 30, 15),
        ("B", 5, BASE + 5, 90),
    ]
    df = spark.createDataFrame(
        [(s, i, float(t), n) for s, i, t, n in rows],
        "source string, doc_id long, ts_sec double, n_tokens long",
    ).select("source", "doc_id", F.timestamp_seconds("ts_sec").alias("ts"), "n_tokens")
    src = str(tmp_path / "quota_in")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "source string, doc_id long, ts timestamp, n_tokens long"
    ).parquet(src)
    out = stream_source_quota(stream, max_tokens=100, window_sec=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("quota_sink")
        .option("checkpointLocation", str(tmp_path / "quota_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["admitted"], r["used_after"])
        for r in spark.sql("SELECT * FROM quota_sink").collect()
    }
    assert got[1] == (True, 40) and got[2] == (True, 80)
    assert got[3] == (False, 80)       # does not fit, does not consume
    assert got[4] == (True, 95)        # later smaller doc still admitted
    assert got[5] == (True, 90)        # source B independent
    # every input doc decided exactly once
    assert len(got) == 5


def test_stream_source_quota_state_spans_batches(spark, tmp_path):
    from kairos_spark.streaming.quota import stream_source_quota

    src = str(tmp_path / "quota2_in")
    schema = "source string, doc_id long, ts timestamp, n_tokens long"

    def write(rows):
        spark.createDataFrame(
            [(s, i, float(t), n) for s, i, t, n in rows],
            "source string, doc_id long, ts_sec double, n_tokens long",
        ).select(
            "source", "doc_id", F.timestamp_seconds("ts_sec").alias("ts"), "n_tokens"
        ).coalesce(1).write.mode("append").parquet(src)

    write([("A", 1, BASE + 0, 60)])
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_source_quota(stream, max_tokens=100, window_sec=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("quota2_sink")
        .option("checkpointLocation", str(tmp_path / "quota2_chk"))
        .start()
    )
    q.processAllAvailable()
    # second micro-batch: the window counter must persist (60 used),
    # so a 50-token doc in the SAME window is rejected
    write([("A", 2, BASE + 100, 50), ("A", 3, BASE + 200, 40)])
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: (r["admitted"], r["used_after"])
        for r in spark.sql("SELECT * FROM quota2_sink").collect()
    }
    assert got[1] == (True, 60)
    assert got[2] == (False, 60)
    assert got[3] == (True, 100)


def test_streaming_ingest_pipeline_composes(spark, tmp_path):
    """Quality gate → watermark-bounded exact dedup → per-source quota
    admission, ALL in one streaming query (two stateful operators).
    Spark allows multiple stateful ops but the watermark must be
    defined exactly once — the watermark=None passthrough on the
    operators exists for exactly this composition."""
    from kairos_spark.streaming import stream_exact_dedup, stream_source_quota

    rows = [
        ("webA", 1, BASE + 0, "good doc one with plenty of words", 200),
        ("webA", 2, BASE + 10, "good doc one with plenty of words", 200),  # dup
        ("webA", 3, BASE + 20, "x", 1),                                    # gated
        ("webA", 4, BASE + 30, "another solid document body here", 900),   # over quota
        ("webB", 5, BASE + 40, "unique b text", 100),
    ]
    df = spark.createDataFrame(
        [(s, i, float(t), x, n) for s, i, t, x, n in rows],
        "source string, doc_id long, ts_sec double, text string, n_tokens long",
    ).select(
        "source", "doc_id", F.timestamp_seconds("ts_sec").alias("ts"),
        "text", "n_tokens",
    )
    src = str(tmp_path / "pipe_in")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "source string, doc_id long, ts timestamp, text string, n_tokens long"
    ).parquet(src)
    gated = stream.withWatermark("ts", "1 hour").where(F.length("text") >= 5)
    deduped = stream_exact_dedup(gated, text_col="text", ts_col="ts", watermark=None)
    out = stream_source_quota(deduped, max_tokens=1000, window_sec=3600, watermark=None)
    q = (
        out.writeStream.format("memory")
        .queryName("pipe_sink")
        .option("checkpointLocation", str(tmp_path / "pipe_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = sorted(
        (r["doc_id"], r["admitted"])
        for r in spark.sql("SELECT doc_id, admitted FROM pipe_sink").collect()
    )
    assert res == [(1, True), (4, False), (5, True)]


def test_stream_anomaly_alerts_spike(spark, tmp_path):
    from kairos_spark.streaming import stream_anomaly_alerts

    # steady 10±1 pattern, then a 100 spike after warm-up -> exactly
    # one alert, and the alert's baseline is the pre-spike EWMA
    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 100.0, 10.0]
    rows = [("api", float(BASE + i * 10), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, ts_sec double, value double"
    ).select("event_type", F.timestamp_seconds("ts_sec").alias("ts"), "value")
    src = str(tmp_path / "anom_in")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(src)
    out = stream_anomaly_alerts(stream, alpha=0.1, threshold=4.0, min_n=5)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_sink")
        .option("checkpointLocation", str(tmp_path / "anom_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    alerts = spark.sql("SELECT * FROM anom_sink").collect()
    assert len(alerts) == 1
    r = alerts[0]
    assert r["value"] == 100.0 and r["event_type"] == "api"
    assert 9.0 < r["baseline"] < 11.0 and r["z"] > 4.0


def test_stream_anomaly_baseline_spans_batches(spark, tmp_path):
    from kairos_spark.streaming import stream_anomaly_alerts

    src = str(tmp_path / "anom2_in")

    def write(vals, t0):
        spark.createDataFrame(
            [("api", float(t0 + i * 10), v) for i, v in enumerate(vals)],
            "event_type string, ts_sec double, value double",
        ).select(
            "event_type", F.timestamp_seconds("ts_sec").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(src)

    # batch 1 builds the baseline only; the spike arrives in batch 2
    # and must alert against the PERSISTED state
    write([10.0, 11.0, 9.0, 10.0, 11.0, 9.0], BASE)
    stream = spark.readStream.schema(
        "event_type string, ts timestamp, value double"
    ).parquet(src)
    out = stream_anomaly_alerts(stream, alpha=0.1, threshold=4.0, min_n=5)
    q = (
        out.writeStream.format("memory")
        .queryName("anom2_sink")
        .option("checkpointLocation", str(tmp_path / "anom2_chk"))
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) c FROM anom2_sink").collect()[0]["c"] == 0
    write([100.0], BASE + 100)
    q.processAllAvailable()
    q.stop()
    alerts = spark.sql("SELECT * FROM anom2_sink").collect()
    assert len(alerts) == 1 and alerts[0]["value"] == 100.0


def test_stream_decayed_scores_matches_batch_twin(spark, tmp_path):
    import math

    from kairos_spark.streaming import stream_decayed_scores
    from kairos_spark.operators.windows import decayed_topk

    hl = 3600.0
    rows = [
        ("a", float(BASE + i * 600)) for i in range(8)
    ] + [("b", float(BASE + i * 900)) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id string, ts_sec double").select(
        "user_id", F.timestamp_seconds("ts_sec").alias("ts")
    )
    src = str(tmp_path / "lead_in")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id string, ts timestamp").parquet(src)
    out = stream_decayed_scores(stream, half_life_sec=hl)
    q = (
        out.writeStream.format("memory")
        .queryName("lead_sink")
        .option("checkpointLocation", str(tmp_path / "lead_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snaps = spark.sql(
        "SELECT * FROM lead_sink ORDER BY anchor"
    ).collect()
    last = {r.user_id: r for r in snaps}  # latest snapshot per key
    batch = {r.user_id: r for r in decayed_topk(df, half_life_sec=hl, k=10).collect()}
    end_us = max(int(r.anchor.timestamp() * 1_000_000) for r in last.values())
    for k, r in last.items():
        # re-anchor the stream score to the global horizon; must match
        # the batch twin's decayed sum to round-6 float tolerance
        a_us = int(r.anchor.timestamp() * 1_000_000)
        reanchored = r.decayed_score * math.pow(2.0, (a_us - end_us) / (hl * 1e6))
        assert abs(reanchored - batch[k].decayed_score) < 2e-6
        assert r.n_events == batch[k].n_events


def test_stream_decayed_scores_state_spans_batches_and_late_data(spark, tmp_path):
    import math

    from kairos_spark.streaming import stream_decayed_scores

    hl = 3600.0
    src = str(tmp_path / "lead2_in")

    def write(rows):
        spark.createDataFrame(rows, "user_id string, ts_sec double").select(
            "user_id", F.timestamp_seconds("ts_sec").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    write([("u", float(BASE)), ("u", float(BASE + 1800))])
    stream = spark.readStream.schema("user_id string, ts timestamp").parquet(src)
    out = stream_decayed_scores(stream, half_life_sec=hl, watermark="10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("lead2_sink")
        .option("checkpointLocation", str(tmp_path / "lead2_chk"))
        .start()
    )
    q.processAllAvailable()
    # second batch: one newer event AND one late (out-of-order) event —
    # the score must accumulate against the PERSISTED state
    write([("u", float(BASE + 3600)), ("u", float(BASE + 900))])
    q.processAllAvailable()
    q.stop()
    snaps = spark.sql("SELECT * FROM lead2_sink ORDER BY n_events").collect()
    final = snaps[-1]
    assert final.n_events == 4
    # exact expected: anchor at BASE+3600, contributions at 0, -1800,
    # -2700, -3600 seconds from the anchor
    exp = sum(math.pow(2.0, -d / hl) for d in (0.0, 1800.0, 2700.0, 3600.0))
    assert abs(final.decayed_score - exp) < 1e-9


def test_stream_novelty_tag_matches_batch_twin(spark, tmp_path):
    """First occurrence per digest is novel, every replay stale — and
    the windowed rate agrees with a batch first-occurrence compute on
    the same feed."""
    from kairos_spark.streaming.novelty import novelty_rate, stream_novelty_tag

    rows = [
        (1, BASE + 0, "alpha"), (2, BASE + 10, "beta"),
        (3, BASE + 20, "alpha"),          # replay of doc 1 content
        (4, BASE + 3700, "gamma"),        # next window, novel
        (5, BASE + 3710, "beta"),         # next window, stale
    ]
    df = spark.createDataFrame(
        [(i, float(t), x) for i, t, x in rows],
        "doc_id long, ts_sec double, text string",
    ).select("doc_id", F.timestamp_seconds("ts_sec").alias("ts"), "text")
    src = str(tmp_path / "nov_in")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    tagged = stream_novelty_tag(stream, horizon_sec=86_400)
    # the tag op emits rows in-batch with their original ts (never
    # late), so the conservative chained-stateful-op check is safe to
    # disable for this composition — see novelty_rate's chaining note
    chk = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    old = spark.conf.get(chk, "true")
    spark.conf.set(chk, "false")
    try:
        q = (
            # update mode: append would hold every window until the
            # watermark passes its end (nothing emits on a bounded
            # replay); update emits the running counts per batch
            novelty_rate(tagged, window_sec=3600)
            .writeStream.format("memory")
            .queryName("nov_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "nov_chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(chk, old)
    got = {
        r["w_start"]: (r["n_docs"], r["novel_docs"], r["stale_docs"])
        for r in spark.sql("SELECT * FROM nov_sink").collect()
    }
    # batch twin: first occurrence per digest in (ts, id) order
    import datetime as _dt

    w0 = _dt.datetime.utcfromtimestamp(BASE // 3600 * 3600)
    w1 = _dt.datetime.utcfromtimestamp((BASE + 3700) // 3600 * 3600)
    assert got[w0] == (3, 2, 1)
    assert got[w1] == (2, 1, 1)


def test_stream_novelty_state_spans_batches(spark, tmp_path):
    from kairos_spark.streaming.novelty import stream_novelty_tag

    src = str(tmp_path / "nov2_in")
    schema = "doc_id long, ts timestamp, text string"

    def write(rows):
        spark.createDataFrame(
            [(i, float(t), x) for i, t, x in rows],
            "doc_id long, ts_sec double, text string",
        ).select(
            "doc_id", F.timestamp_seconds("ts_sec").alias("ts"), "text"
        ).coalesce(1).write.mode("append").parquet(src)

    write([(1, BASE + 0, "payload x")])
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_novelty_tag(stream, horizon_sec=86_400)
    q = (
        out.writeStream.format("memory")
        .queryName("nov2_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nov2_chk"))
        .start()
    )
    q.processAllAvailable()
    # second micro-batch: the digest's state must persist, so the
    # replay is stale even across the batch boundary
    write([(2, BASE + 100, "payload x"), (3, BASE + 200, "payload y")])
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: r["is_novel"]
        for r in spark.sql("SELECT * FROM nov2_sink").collect()
    }
    assert got == {1: True, 2: False, 3: True}
