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
}
