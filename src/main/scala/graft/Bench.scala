package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // tuned local session (AQE parallelism-first, tmpfs shuffle, 16m
    // splits) — see nelspark.Main.session; output contract unchanged
    val spark = nelspark.Main.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-reader init otherwise lands
    // entirely on whichever query the Map ordering puts first (~8s skew)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    def jstr(s: String): String = nelspark.util.Json.str(s)
    // A failed query must be VISIBLE in the JSON (round-1 advice: the old
    // catch swallowed exceptions into a -1s timing that read as "fast").
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e.toString.take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map {
      case (k, v, None) => jstr(k) + ":" + v
      case (k, _, Some(e)) => jstr(k) + ":" + s"""{"err":${jstr(e)}}"""
    }.mkString("{", ",", "}")
    val errs = results.count(_._3.isDefined)
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","errors":$errs,"queries":$qs,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
