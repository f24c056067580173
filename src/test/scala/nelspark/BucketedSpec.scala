package nelspark

import org.apache.spark.sql.functions._
import nelspark.store.Bucketed

/** Co-located joins via bucketing (SURVEY.md §4): joining two tables
  * bucketed on the join key must produce a physical plan with NO shuffle
  * exchange — the scale path for repeated large⋈large joins. */
class BucketedSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without any shuffle exchange") {
    import spark.implicits._
    val a = (0L until 10000L).map(i => (i % 997, i, s"a$i")).toDF("k", "a_id", "a_val")
    val b = (0L until 10000L).map(i => (i % 997, i, s"b$i")).toDF("k", "b_id", "b_val")

    Bucketed.write(a, "buck_a", Seq("k"), 8)
    Bucketed.write(b, "buck_b", Seq("k"), 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketed.read(spark, "buck_a")
        .join(Bucketed.read(spark, "buck_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and it computes the right thing
      val n = joined.count()
      val expected = a.join(b, Seq("k")).count()
      assert(n == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key aggregates without a shuffle exchange") {
    val agg = Bucketed.read(spark, "buck_a").groupBy("k").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
    assert(agg.count() == 997)
  }
}
