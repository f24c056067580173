package nelspark

/** Driver-contract sanity: entry() yields the flagship F1 row; every
  * oracleSql key has a matching query; queries run at sf0.001. */
class SparkEntrySpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val missing = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("entry() produces a non-empty F1 row passing the gate") {
    val rows = graft.SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    val f1 = rows(0).getAs[Double]("f1")
    assert(f1 >= 0.99, s"flagship f1=$f1")
  }

  test("all queries execute at sf0.001 and return rows") {
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
