package nelspark

import nelspark.gen.CorpusGen
import nelspark.pipeline._
import nelspark.streaming.Incremental
import org.apache.spark.sql.functions._

/** S4 incremental clustering: batch-wise micro-batches converge to the
  * same clusters as one full batch run over the union. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches equal one full run (same clusters)") {
    val gen = CorpusGen.generate(spark, 800L, 160L).cache()
    val pages = CorpusGen.pages(gen).cache()
    val half1 = pages.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val half2 = pages.filter(pmod(xxhash64(col("url")), lit(2)) === 1)

    // incremental: batch1 then batch2
    var st = Incremental.empty(spark)
    st = Incremental.processBatch(spark, st, half1)
    // stabilize intermediate state (avoids recomputing batch1 lineage)
    st = Incremental.State(st.mentions.localCheckpoint(true),
      st.vecs.localCheckpoint(true), st.edges.localCheckpoint(true),
      st.assignments.localCheckpoint(true))
    st = Incremental.processBatch(spark, st, half2)

    // full batch over the union
    val full = Pipeline.run(spark, pages, CorpusGen.gold(gen))

    val inc = st.assignments.as[(Long, Long)].collect().toMap
    val bat = full.assignments.as[(Long, Long)].collect().toMap
    assert(inc.keySet == bat.keySet, "same mention universe")

    // cluster PARTITIONS must agree (ids may differ only if min-member
    // identity differs, which it cannot — both use min member id; but
    // context-vector drift (per-batch idf) may split borderline pairs, so
    // compare pairwise co-clustering agreement and require it near-exact)
    val mentionsList = inc.keys.toSeq.sorted
    val sample = mentionsList.take(2000)
    var agree = 0L; var total = 0L
    for (i <- sample.indices; j <- (i + 1) until math.min(i + 40, sample.size)) {
      val a = sample(i); val b = sample(j)
      val same1 = inc(a) == inc(b); val same2 = bat(a) == bat(b)
      if (same1 == same2) agree += 1
      total += 1
    }
    val agreement = agree.toDouble / total
    info(s"pairwise co-clustering agreement incremental vs batch: $agreement")
    assert(agreement >= 0.995, s"agreement $agreement")
  }
}
