package nelspark.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import nelspark.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 *
 *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline;
 *    linear scan per query (fine for bounded query sets, unusable as an
 *    all-pairs primitive at 10^12 rows);
 *  - [[lshTopK]]: random-hyperplane (sign) LSH — the scale path. Each
 *    vector gets `tables` bucket keys from `bits` hyperplane signs;
 *    candidates = bucket collisions in any table; exact cosine re-rank
 *    of candidates only. Hyperplanes are derived deterministically from
 *    a seed (no RNG state, reproducible across runs/partitionings).
 *
 * The same pattern (bucket → candidate join → exact re-rank) is how the
 * blocking pipeline treats names; this is its dense-vector sibling.
 */
object Ann {

  /** Deterministic pseudo-gaussian hyperplane component (Box-Muller over
    * seed-derived uniforms would be overkill; sign-LSH only needs
    * symmetric zero-mean components, so a mixed-hash uniform in [-1,1)
    * suffices and stays bit-reproducible). */
  private def component(seed: Long, table: Int, bit: Int, dim: Int): Double = {
    val h = nelspark.expr.Kernels.mix64(
      seed ^ (table.toLong << 40) ^ (bit.toLong << 20) ^ dim.toLong)
    (h >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
  }

  /** Column: bucket key for one LSH table — the sign bits of `bits`
    * hyperplane dot products packed into a long. */
  private def bucketKey(vec: Column, dim: Int, table: Int, bits: Int,
      seed: Long): Column = {
    val bitCols = (0 until bits).map { b =>
      val dot = (0 until dim).map { d =>
        vec.getItem(d) * lit(component(seed, table, b, d))
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact cosine top-k for each query vector (queries small, corpus big). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        cosine_sim(col("q_emb"), col("n_emb")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("q_id", "rn", "n_id", "sim")
  }

  /** LSH-bucketed approximate top-k: candidates from bucket collisions
    * across `tables` sign-LSH tables, exact re-rank of candidates. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      tables: Int = 8, bits: Int = 10, seed: Long = 42L): DataFrame = {
    def withBuckets(df: DataFrame, idName: String, embName: String): DataFrame = {
      val keyed = (0 until tables).map { t =>
        df.select(col("vec_id").as(idName), col("embedding").as(embName),
          lit(t).as("tbl"),
          bucketKey(col("embedding"), dim, t, bits, seed).as("bkt"))
      }
      keyed.reduce(_ unionByName _)
    }
    val qb = withBuckets(queries, "q_id", "q_emb")
    val cb = withBuckets(corpus, "n_id", "n_emb")
    val cands = qb.join(cb, Seq("tbl", "bkt"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "q_emb", "n_id", "n_emb")
      .dropDuplicates("q_id", "n_id")
    val scored = cands.select(col("q_id"), col("n_id"),
      cosine_sim(col("q_emb"), col("n_emb")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("q_id", "rn", "n_id", "sim")
  }

  /** Recall@k of an approximate result against the exact baseline. */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select(col("q_id"), col("n_id"))
    val a = approx.select(col("q_id"), col("n_id"))
    val hit = e.join(a, Seq("q_id", "n_id"), "left_semi").count()
    val total = e.count()
    if (total == 0) 0.0 else hit.toDouble / total
  }
}
