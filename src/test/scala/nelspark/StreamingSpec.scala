package nelspark

import nelspark.streaming.StreamOps
import nelspark.gen.CorpusGen
import nelspark.pipeline.ErConfig
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured Streaming capability demos (SURVEY.md §2.10 S1–S3),
  * driven synchronously: file source → memory sink. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("S1: streaming mention extraction matches batch") {
    val dir = Files.createTempDirectory("stream-pages").toString
    val gen = CorpusGen.generate(spark, 200L, 40L)
    CorpusGen.pages(gen).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val streamed = StreamOps.streamingMentions(spark, dir, schema, ErConfig())
    val q = streamed.writeStream.format("memory").queryName("m_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val nStream = spark.sql("SELECT count(*) FROM m_out").head().getLong(0)
    val nBatch = nelspark.pipeline.Mentions(
      nelspark.pipeline.Extract(spark.read.parquet(dir)), ErConfig()).count()
    assert(nStream == nBatch && nStream > 0)
  }

  test("S2: watermarked windowed aggregation over events stream") {
    val dir = Files.createTempDirectory("stream-events").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val events = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamOps.windowedEventCounts(events)
    val q = agg.writeStream.format("memory").queryName("w_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    // append mode emits only watermark-closed windows; with a finite file
    // source the tail window stays open — compare against batch on the
    // emitted subset instead of exact equality.
    val emitted = spark.sql("SELECT * FROM w_out")
    assert(emitted.columns.toSet == Set("w_start", "w_end", "event_type", "n", "total"))
    val batch = StreamOps.windowedEventCounts(
      spark.read.parquet(dir)).withColumnRenamed("n", "n_b")
    val joined = emitted.join(batch,
      Seq("w_start", "w_end", "event_type"), "inner")
    assert(joined.filter(col("n") =!= col("n_b")).count() == 0)
    assert(emitted.count() > 0)
  }

  test("S5: stream-stream interval join matches the batch join") {
    val dir = Files.createTempDirectory("stream-ssj").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def src() = spark.readStream.schema(schema).parquet(dir)
    val views = src().filter(col("event_type") === "view")
    val clicks = src().filter(col("event_type") === "click")
    val q = StreamOps.clickAfterView(views, clicks,
        watermark = "2 hours", maxDelay = "6 hours")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.sql("SELECT * FROM ssj_out")
    // inner stream-stream joins emit a match as soon as both sides arrive
    // (the watermark only bounds state), so the finite-source result must
    // equal the batch interval join exactly
    val batchDf = spark.read.parquet(dir)
    val nBatch = StreamOps.clickAfterView(
      batchDf.filter(col("event_type") === "view"),
      batchDf.filter(col("event_type") === "click"),
      watermark = "2 hours", maxDelay = "6 hours").count()
    assert(streamed.count() == nBatch && nBatch > 0)
    // every match respects the interval: 0 <= c_ts - v_ts <= 6h
    assert(streamed.filter(col("v_ts") > col("c_ts") ||
      col("v_ts") < col("c_ts") - expr("INTERVAL 6 hours")).count() == 0)
  }

  test("S6: watermarked streaming dedup drops exact duplicates") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir) // every event_id now appears twice
    val schema = spark.read.parquet(dir).schema
    assert(spark.read.parquet(dir).count() == 2000)
    val q = StreamOps.dedupWithinWatermark(
        spark.readStream.schema(schema).parquet(dir), "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val got = spark.sql("SELECT event_id FROM dedup_out")
    assert(got.count() == 1000)
    assert(got.distinct().count() == 1000)
  }

  test("S3: event-time sessionization with session_window") {
    val dir = Files.createTempDirectory("stream-sess").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val events = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.sessionize(events).writeStream
      .format("memory").queryName("s_out").outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val emitted = spark.sql("SELECT * FROM s_out")
    assert(emitted.columns.toSet ==
      Set("user_id", "s_start", "s_end", "n_events", "session_value"))
    assert(emitted.count() > 0)
    // sessions are disjoint per user
    assert(emitted.as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
      .collect().groupBy(_._1).forall { case (_, ss) =>
        val sorted = ss.sortBy(_._2.getTime)
        sorted.zip(sorted.drop(1)).forall { case (a, b) => a._3.getTime <= b._2.getTime }
      })
  }
}
