package nelspark

import nelspark.dedup.SimHashDedup
import nelspark.functions._
import org.apache.spark.sql.functions._

/** SimHash banded near-dup: the banded operating point must find exactly
  * what its threshold claims (Manku pigeonhole), and degenerate band
  * buckets must be purged, not joined quadratically. */
class DedupSpec extends SparkSpec {

  private lazy val fp = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"),
      simhash64(split(lower(col("text")), "\\s+")).as("sh"))
    .cache()

  test("banded pairs == exact all-pairs at hamming <= 3 (no purge)") {
    val banded = SimHashDedup.simhashPairs(fp, "doc_id", "sh", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = SimHashDedup.exactPairs(fp, "doc_id", "sh", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact.nonEmpty, "fixture has no near-dup pairs at h<=3 — test is vacuous")
    assert(banded == exact)
  }

  test("banded pairs == exact at hamming <= 7 too (8 bands)") {
    val banded = SimHashDedup.simhashPairs(fp, "doc_id", "sh", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimHashDedup.exactPairs(fp, "doc_id", "sh", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
  }

  test("degenerate buckets are purged: identical fingerprints above the cap produce no pairs") {
    import spark.implicits._
    // 50 identical fingerprints (a stop-pattern bucket) + 2 true near-dups
    val rows = (0L until 50L).map(i => (i, 0x0123456789abcdefL)) ++
      Seq((100L, 0x7777000011110000L), (101L, 0x7777000011110001L))
    val d = rows.toDF("doc_id", "sh")
    val got = SimHashDedup.simhashPairs(d, "doc_id", "sh",
      maxHamming = 3, maxBucket = 10L)
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 50-clone cluster's 1225 pairs are purged; the capped path still
    // finds the pair that lives in non-degenerate buckets
    assert(pairs == Set((100L, 101L)))
  }

  test("purge cap off: clone cluster pairs all found") {
    import spark.implicits._
    val rows = (0L until 20L).map(i => (i, 42L))
    val d = rows.toDF("doc_id", "sh")
    val got = SimHashDedup.simhashPairs(d, "doc_id", "sh", maxHamming = 3)
    assert(got.count() == 20L * 19 / 2)
    assert(got.filter(col("hamming") =!= 0).count() == 0)
  }
}
