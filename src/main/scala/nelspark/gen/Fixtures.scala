package nelspark.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import nelspark.functions._

/**
 * Pinned cross-engine fixtures (same pattern as
 * [[nelspark.sources.Conll.ensureFixture]]): a deterministic artifact is
 * derived ONCE from the canonical sf0.001 tables and written to a fixed
 * path that both the Spark query and its static DuckDB oracle SQL read.
 * This upgrades custom-hash operators from rows-only to oracle-exact:
 * the hash computation itself is gated by property tests (ExprSpec band
 * collisions), while the relational logic downstream of it — banded
 * self-join, pair dedup, transitive closure — is verified cross-engine.
 */
object Fixtures {

  /** (doc_id, band, bh) MinHash band keys of the sf0.001 documents table
    * (8-gram shingles, 12 hashes, 4 bands, seed 42 — the q_minhash_pairs
    * configuration). Idempotent: skipped when the parquet _SUCCESS marker
    * exists, so the bytes are pinned for the round. */
  def ensureMinhashBands(spark: SparkSession, docsParquet: String,
      dir: String): String = {
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.read.parquet(docsParquet)
        .select(col("doc_id"), posexplode(
          minhash_bands(
            minhash_ngrams(lower(col("text")), 8, 12, 42L), 4))
          .as(Seq("band", "bh")))
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** (doc_id, fp) rolling-hash document fingerprints of the sf0.001
    * documents table (window 5 — the q_fingerprint configuration).
    * Same pinning contract as [[ensureMinhashBands]]. */
  def ensureFingerprints(spark: SparkSession, docsParquet: String,
      dir: String): String = {
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.read.parquet(docsParquet)
        .select(col("doc_id"), doc_fingerprint(col("text"), 5).as("fp"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** (doc_id, sh) 64-bit SimHash fingerprints over whitespace tokens of
    * the sf0.001 documents table (the q_simhash_pairs configuration).
    * Same pinning contract as [[ensureMinhashBands]]. */
  def ensureSimhash(spark: SparkSession, docsParquet: String,
      dir: String): String = {
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.read.parquet(docsParquet)
        .select(col("doc_id"),
          simhash64(split(lower(col("text")), "\\s+")).as("sh"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** (mention_id, url, name_norm) detector output over the sf0.001
    * documents (the q_coref_chains derivation: proper-cased word set →
    * ExtractMentions → NormalizeName, len ≥ 2). Pinning it lets DuckDB
    * re-derive the within-doc coref CHAINS independently (compatibility
    * predicate in SQL + recursive-CTE transitive closure), so the J2
    * union-find clustering is verified cross-engine, not just the
    * kernel. Same pinning contract as [[ensureMinhashBands]]. */
  def ensureCorefMentions(spark: SparkSession, docsParquet: String,
      dir: String): String = {
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
      spark.read.parquet(docsParquet)
        .withColumn("ctext", concat_ws(" ",
          transform(split(col("text"), "\\s+"), w =>
            when(w.isin("spark", "customer", "table", "window", "query"),
              concat(upper(substring(w, 1, 1)), substring(w, 2, 1000)))
              .otherwise(w))))
        .select(col("doc_id").cast("string").as("url"),
          posexplode(extract_mentions(col("ctext"))).as(Seq("pos", "m")))
        .select(xxhash64(col("url"), col("m.begin")).as("mention_id"),
          col("url"), normalize_name(col("m.name")).as("name_norm"))
        .filter(length(col("name_norm")) >= 2)
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** The banded candidate pairs (a_id < b_id, distinct) over a band-key
    * table — shared by q_minhash_pairs and q_er_doc_clusters so both
    * engines see the identical pair set. */
  def bandPairs(bands: DataFrame): DataFrame = {
    val a = bands.withColumnRenamed("doc_id", "a_id")
    val b = bands.withColumnRenamed("doc_id", "b_id")
    a.join(b, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }
}
