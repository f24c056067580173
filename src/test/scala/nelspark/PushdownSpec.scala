package nelspark

import org.apache.spark.sql.functions._

/** Scan-level optimization proofs (SURVEY.md §4): filters and column
  * pruning must reach the parquet scan — at corpus scale a scan that
  * reads all columns for a two-column projection is wrong. */
class PushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter is pushed to the parquet scan (PushedFilters)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:") &&
      scan.contains("GreaterThan(l_quantity,30"), s"filter not pushed:\n$scan")
  }

  test("column pruning reaches the scan (ReadSchema has only used columns)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(scan.split("ReadSchema").last)
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan reads unused columns:\n$readSchema")
  }

  test("partition-count independence: same filter result at different parallelism") {
    val a = spark.read.parquet(s"$dir/lineitem.parquet").repartition(2)
      .filter(col("l_quantity") > 30).count()
    val b = spark.read.parquet(s"$dir/lineitem.parquet").repartition(13)
      .filter(col("l_quantity") > 30).count()
    assert(a == b)
  }
}
