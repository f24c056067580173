package nelspark.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming capability layer (SURVEY.md §2.10). The reference
 * has no streaming (its only incremental surface is a per-request HTTP
 * harness, nel/harness.py — SNK3); these expose the engine's streaming
 * equivalents over the same stateless pipeline expressions:
 *
 *  S1  incremental page ingest → extraction/mention expressions as-is
 *  S2  watermarked sliding-window aggregation
 *  S3  event-time sessionization via session_window
 *  S5  stream-stream interval join (watermarks on both sides bound the
 *      join state — without the time-range predicate the state store
 *      would grow without bound at 100 TB/day ingest)
 *  S6  watermarked streaming dedup (dropDuplicatesWithinWatermark):
 *      exact-dedup-on-ingest for a training-data feed, state bounded
 *      by the watermark horizon instead of the corpus size
 *
 * All transforms are source-agnostic (readStream parquet/kafka/socket);
 * tests drive them with a file source + memory sink synchronously.
 */
object StreamOps {

  /** S1: streaming extraction+mention detection over a pages directory.
    * Stateless — identical expressions to the batch pipeline. */
  def streamingMentions(spark: SparkSession, pagesDir: String,
      schema: StructType, cfg: nelspark.pipeline.ErConfig): DataFrame = {
    val pages = spark.readStream.schema(schema).parquet(pagesDir)
    nelspark.pipeline.Mentions(nelspark.pipeline.Extract(pages), cfg)
  }

  /** S2: sliding-window counts with a watermark (late rows dropped). */
  def windowedEventCounts(events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "5 minutes", slide: String = "5 minutes"): DataFrame =
    events
      // event time must be TIMESTAMP (driver parquet stores TIMESTAMP_NTZ)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** S3: event-time sessionization (gap-based session windows). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("session"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"), col("session.start").as("s_start"),
        col("session.end").as("s_end"), col("n_events"), col("session_value"))

  /** S5: stream-stream interval join — `clicks` events joined to the
    * same user's `view` events within [0, maxDelay] BEFORE the click.
    * Both sides watermarked; the interval condition lets Spark evict
    * join state past the horizon (mandatory for unbounded ingest). */
  def clickAfterView(views: DataFrame, clicks: DataFrame,
      watermark: String = "30 minutes", maxDelay: String = "15 minutes"): DataFrame = {
    val v = views
      .withColumn("v_ts", col("ts").cast("timestamp"))
      .select(col("user_id").as("v_user"), col("v_ts"), col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val c = clicks
      .withColumn("c_ts", col("ts").cast("timestamp"))
      .select(col("user_id").as("c_user"), col("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    c.join(v,
        col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $maxDelay"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** S6: exact dedup on a streaming ingest, state bounded by the
    * watermark horizon — duplicates of a key arriving within the
    * horizon are dropped; state for keys older than the watermark is
    * evicted (at web-scale ingest this is the only tractable exact
    * dedup: global-history dedup belongs in the batch layer). */
  def dedupWithinWatermark(docs: DataFrame, keyCol: String,
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)
}
