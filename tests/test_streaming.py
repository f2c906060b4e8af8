"""Structured Streaming ingest: windowed per-host counts over a file
stream, checked against the equivalent batch aggregation."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from warcit_spark.sources.fixture import generate_pages
from warcit_spark.streaming.ingest import (
    host_window_counts,
    read_pages_stream,
    streaming_frontier_dedup,
)


def test_stream_counts_match_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    pages = generate_pages(spark, 200)
    pages.repartition(4).write.mode("overwrite").parquet(src)

    stream = read_pages_stream(spark, src)
    assert stream.isStreaming
    counts = host_window_counts(stream, window="6 hours", watermark="1 hour")
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = (
        spark.read.parquet(src)
        .withColumn("host", F.lower(F.try_parse_url("url", F.lit("HOST"))))
        .groupBy(F.window("warc_ts", "6 hours").alias("w"), "host")
        .agg(F.count("*").alias("pages"), F.sum(F.length("html")).alias("bytes"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "pages",
            "bytes",
        )
    )
    # append-mode emits only windows the watermark has closed; every emitted
    # row must match the batch result exactly, and most windows must emit
    got_set = {tuple(r) for r in got.collect()}
    batch_set = {tuple(r) for r in batch.collect()}
    assert got_set <= batch_set
    assert len(got_set) >= len(batch_set) * 0.5


def test_streaming_frontier_dedup(spark, tmp_path_factory):
    """State-store dedup drops canonical-collision duplicates in-stream."""
    src = str(tmp_path_factory.mktemp("dedup_src"))
    out = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))

    import datetime as dt

    rows = [
        ("http://h.test/a", dt.datetime(2024, 1, 1, 10, 0)),
        ("HTTP://H.TEST:80/a#frag", dt.datetime(2024, 1, 1, 10, 1)),  # dup of a
        ("http://h.test/b?y=2&x=1", dt.datetime(2024, 1, 1, 10, 2)),
        ("http://h.test/b?x=1&y=2", dt.datetime(2024, 1, 1, 10, 3)),  # dup of b
        ("http://h.test/c", dt.datetime(2024, 1, 1, 10, 4)),
    ]
    spark.createDataFrame(rows, "url string, warc_ts timestamp").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("url string, warc_ts timestamp").parquet(src)
    deduped = streaming_frontier_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.url for r in spark.read.parquet(out).collect())
    assert got == [
        "http://h.test/a",
        "http://h.test/b?x=1&y=2",
        "http://h.test/c",
    ]


def test_streaming_politeness_admit_stateful_budget(spark, tmp_path_factory):
    """applyInPandasWithState admission: per-host LIFETIME budget holds
    across micro-batches (state persists), order is priority DESC/url ASC,
    and a second batch can only spend what the first left."""
    import os

    src = str(tmp_path_factory.mktemp("admit_src"))
    ckpt = str(tmp_path_factory.mktemp("admit_ckpt"))

    from warcit_spark.streaming.ingest import streaming_politeness_admit

    schema = "host string, url string, priority double"
    batch1 = [
        ("a.test", "http://a.test/1", 1.0),
        ("a.test", "http://a.test/2", 3.0),
        ("a.test", "http://a.test/3", 2.0),
        ("b.test", "http://b.test/1", 1.0),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "b1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    admitted = streaming_politeness_admit(stream, host_budget=2)
    q = (
        admitted.writeStream.outputMode("append")
        .format("memory")
        .queryName("admit_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows1 = spark.sql("SELECT * FROM admit_test").collect()
        got1 = {(r.host, r.url): r.admit_seq for r in rows1 if r.url}
        # host a: top-2 by priority desc -> urls 2 (3.0) then 3 (2.0)
        assert got1 == {
            ("a.test", "http://a.test/2"): 1,
            ("a.test", "http://a.test/3"): 2,
            ("b.test", "http://b.test/1"): 1,
        }
        # loss is observable on the admitted rows: host a dropped 1 of 3
        drops1 = {r.host: r.dropped_total for r in rows1 if r.url}
        assert drops1["a.test"] == 1 and drops1["b.test"] == 0

        # batch 2: host a is exhausted (budget 2 spent); host b admits one
        batch2 = [
            ("a.test", "http://a.test/9", 9.0),
            ("b.test", "http://b.test/2", 2.0),
            ("b.test", "http://b.test/3", 1.0),
        ]
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, "b2"))
        q.processAllAvailable()
        rows2 = spark.sql("SELECT * FROM admit_test").collect()
        got2 = {(r.host, r.url): r.admit_seq for r in rows2 if r.url}
        assert ("a.test", "http://a.test/9") not in got2  # budget held in state
        assert got2[("b.test", "http://b.test/2")] == 2  # cumulative seq
        assert ("b.test", "http://b.test/3") not in got2
        assert len(got2) == 4
        # host a admitted NOTHING in batch 2 -> one accounting row (NULL
        # url, admit_seq NULL) carrying the lifetime dropped count (1 + 1)
        acct = [r for r in rows2 if r.url is None]
        assert len(acct) == 1
        assert acct[0].host == "a.test" and acct[0].admit_seq is None
        assert acct[0].dropped_total == 2
        # host b dropped its first row this batch: visible on admitted row
        assert {
            r.dropped_total for r in rows2 if r.url == "http://b.test/2"
        } == {1}
    finally:
        q.stop()


def test_streaming_wet_preprocess(spark, tmp_path_factory):
    from warcit_spark.streaming.ingest import streaming_wet_preprocess

    src = str(tmp_path_factory.mktemp("wet_src"))
    body_a = (
        "<html><head><title>Doc A</title><style>p{}</style></head>"
        "<body><p>alpha beta gamma delta</p></body></html>"
    )
    body_b = (
        "<html><head><title>Doc B</title></head>"
        "<body><script>var x=1;</script><p>epsilon zeta omicron kappa</p></body></html>"
    )
    junk = "<html><body><script>only code, no text</script></body></html>"
    rows = [
        ("http://h.test/a1", body_a),
        ("http://h.test/a2", body_a),  # duplicate content, different url
        ("http://h.test/b", body_b),
        ("http://h.test/junk", junk),  # empty text -> gopher gate drops
    ]
    spark.createDataFrame(
        [(u, b.encode()) for u, b in rows], "url string, html binary"
    ).selectExpr(
        "url", "timestamp'2026-01-01 00:00:00' as warc_ts", "html",
        "cast(null as string) as text", "cast(null as string) as lang",
    ).select("url", "warc_ts", "html", "text", "lang").write.mode(
        "overwrite"
    ).parquet(src)

    stream = streaming_wet_preprocess(
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(src),
        min_words=3,
        min_stopword_hits=0,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wet_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM wet_test").collect()
    finally:
        q.stop()
    # duplicate content deduped by digest, junk page gated out
    assert len(got) == 2
    by_title = {r.title: r for r in got}
    assert set(by_title) == {"Doc A", "Doc B"}
    assert by_title["Doc A"].text == "alpha beta gamma delta"
    assert by_title["Doc B"].text == "epsilon zeta omicron kappa"
    assert by_title["Doc A"].url in ("http://h.test/a1", "http://h.test/a2")
    assert len({r.digest for r in got}) == 2
