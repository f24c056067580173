package nelspark

import nelspark.ann.Ann
import org.apache.spark.sql.functions._

/** ANN: exact baseline vs LSH-bucketed scale path over the driver's
  * embeddings testdata (64-dim float vectors). */
class AnnSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < 20)

  /** Exactly k rows for EVERY query — countDistinct over the query set,
    * so a query returning zero rows fails instead of vanishing from the
    * groupBy (ADVICE r1). */
  private def assertKPerQuery(got: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val nQueries = queries.count()
    assert(got.select(countDistinct("q_id")).head.getLong(0) == nQueries,
      "some query is missing from the result entirely")
    val bad = got.groupBy("q_id")
      .agg((count(lit(1)) =!= k).as("badn")).filter(col("badn")).count()
    assert(bad == 0)
  }

  test("brute-force top-k: k rows per query, sims sorted, self excluded") {
    val got = Ann.bruteForceTopK(queries, emb, 5).cache()
    assert(got.count() == 20L * 5)
    assert(got.filter(col("q_id") === col("n_id")).count() == 0)
    assertKPerQuery(got, 5)
  }

  test("LSH top-k reaches >=70% recall@5 vs exact") {
    // testdata embeddings are RANDOM vectors: top-5 neighbors sit at
    // cosine ~0.3, so per-bit sign agreement is only ~0.6 — the right
    // operating point is few bits x many tables. (Real embedding spaces
    // have NN cosine 0.7+, where bits=10 x 8 tables is the sweet spot.)
    val exact = Ann.bruteForceTopK(queries, emb, 5)
    val approx = Ann.lshTopK(queries, emb, 5, dim = 64, tables = 16, bits = 4)
    val recall = Ann.recallAtK(exact, approx)
    info(s"lsh recall@5 = $recall")
    assert(recall >= 0.7, s"recall too low: $recall")
  }

  test("IVF top-k reaches >=60% recall@5 vs exact, k rows per query") {
    // random vectors are the IVF worst case (no cluster structure →
    // neighbors scatter across cells); nprobe=8 of nlist=16 probes half
    // the inverted lists. Real embedding corpora cluster, letting
    // nprobe/nlist shrink to a few percent at the same recall.
    val exact = Ann.bruteForceTopK(queries, emb, 5)
    val approx = Ann.ivfTopK(queries, emb, 5, nlist = 16, nprobe = 8).cache()
    val recall = Ann.recallAtK(exact, approx)
    info(s"ivf recall@5 = $recall")
    assert(recall >= 0.6, s"recall too low: $recall")
    assertKPerQuery(approx, 5)
  }

  /** Per-query multiset of ROUNDED sims. Rounding is monotone, so the
    * pinned paths (which rank on round(sim, 6) for cross-engine
    * reproducibility) must agree with the inline paths (which rank on
    * the raw double) on these multisets even where sub-1e-6 near-ties
    * permute which n_id holds which rank. */
  private def roundedSims(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select(col("q_id").cast("long"), round(col("sim"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(identity).toSeq

  test("pinned-LSH path matches inline LSH on rounded sims + recall gate") {
    val buckets = Ann.lshBuckets(emb, tables = 16, bits = 4, seed = 42L)
    val pinned = Ann.lshTopKPinned(buckets, queries, emb, 5).cache()
    try {
      val inline = Ann.lshTopK(queries, emb, 5, dim = 64, tables = 16, bits = 4)
      assert(roundedSims(pinned) == roundedSims(inline),
        "pinned and inline LSH disagree beyond near-tie permutation")
      val recall = Ann.recallAtK(Ann.bruteForceTopK(queries, emb, 5), pinned)
      info(s"pinned lsh recall@5 = $recall")
      assert(recall >= 0.7, s"recall too low: $recall")
    } finally pinned.unpersist()
  }

  test("pinned-IVF path matches inline IVF on rounded sims + recall gate") {
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val cent = Ann.trainIvf(c, nlist = 16, iters = 2, seed = 42L)
    val cells = c.select(col("n_id"),
      element_at(nelspark.functions.nearest_cells(col("n_emb"), cent, 1), 1)
        .as("cell"))
    val pinned = Ann.ivfTopKPinned(cells, cent, queries, emb, 5, nprobe = 8)
      .cache()
    try {
      val inline = Ann.ivfTopK(queries, emb, 5, nlist = 16, nprobe = 8)
      assert(roundedSims(pinned) == roundedSims(inline),
        "pinned and inline IVF disagree beyond near-tie permutation")
      val recall = Ann.recallAtK(Ann.bruteForceTopK(queries, emb, 5), pinned)
      info(s"pinned ivf recall@5 = $recall")
      assert(recall >= 0.6, s"recall too low: $recall")
      assertKPerQuery(pinned, 5)
    } finally pinned.unpersist()
  }

  test("IVF is deterministic across partitionings") {
    val a = Ann.ivfTopK(queries.repartition(2), emb.repartition(3), 3)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.ivfTopK(queries.repartition(7), emb.repartition(1), 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("LSH bucketing is deterministic across partitionings") {
    val a = Ann.lshTopK(queries.repartition(2), emb.repartition(3), 3, 64)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.lshTopK(queries.repartition(7), emb.repartition(1), 3, 64)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
