package nelspark.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew-handling primitives (north rule: "partitioning / shuffle
 * / skew handled explicitly"; SURVEY.md §4). Three mechanisms compose in
 * the engine:
 *
 *  1. block-size tiering in [[nelspark.pipeline.Block.pairs]] (cap the
 *     quadratic tier, chain the Zipfian head, purge stop-keys);
 *  2. AQE skew-join splitting (on by default as a runtime backstop);
 *  3. the utilities here — explicit key salting for hot-key equi-joins
 *     (e.g. the alias-lookup join J1 where name frequency is Zipfian)
 *     and range partitioning for bounded per-task pair generation.
 */
object Skew {

  /**
   * Salted equi-join for a skewed LEFT side against a dimension RIGHT
   * side: left rows get a deterministic salt in [0, buckets); the right
   * side is exploded ×buckets so every (key, salt) matches. Hot keys
   * spread across `buckets` tasks instead of one straggler.
   *
   * Deterministic: salt = xxhash64 of the left row's salt-source column
   * (pass a unique id), never rand().
   */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      leftIdCol: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(leftIdCol)), lit(buckets.toLong)).cast("int"))
    val exploded = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Range-partition a blocked Dataset by its block key (north_star:
    * "salted, range-partitioned Datasets") — bounds per-task memory for
    * pair generation and gives contiguous key ranges to each task. */
  def rangeByBlock(blocked: DataFrame, partitions: Int,
      keyCols: String*): DataFrame =
    blocked.repartitionByRange(partitions, keyCols.map(col): _*)

  /** Top-k hot keys with counts — the stats pre-pass used to pick salt
    * buckets / purge lists (SURVEY.md §4 "hot-key stats"). */
  def hotKeys(df: DataFrame, key: String, k: Int = 100): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(key)).limit(k)
}
