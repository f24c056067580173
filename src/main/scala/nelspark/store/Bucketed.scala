package nelspark.store

import org.apache.spark.sql.DataFrame

/**
 * Bucketed (co-located) table helpers — the shuffle-elimination path for
 * repeated large⋈large equi-joins at corpus scale (SURVEY.md §4).
 *
 * A blocking/scoring pipeline joins the same keyed Datasets
 * (mentions-by-block-key, pairs-by-id) across many stages and runs. Hash
 * bucketing both sides on the join key at write time makes every later
 * equi-join on that key shuffle-free: Spark's scan reports the bucket
 * hash-partitioning, so SortMergeJoin consumes both sides in place
 * (verified by BucketedSpec: zero Exchange nodes in the physical plan).
 * At 10^12 rows this converts the per-run O(data) shuffle of the heavy
 * side into a one-time cost paid when the snapshot is written.
 */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog
    * (catalog metadata is what carries the bucket spec to later scans).
    * Idempotent across sessions: with the in-memory catalog, a table dir
    * left by a previous JVM is unknown to the catalog, so "overwrite"
    * would refuse with LOCATION_ALREADY_EXISTS — drop+delete first. */
  def write(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(loc)
    }
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (scan exposes outputPartitioning =
    * HashPartitioning(keys, buckets), enabling exchange-free joins). */
  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
