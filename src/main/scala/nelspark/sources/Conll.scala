package nelspark.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * SRC2/SRC3: gold-corpus TSV reader (the reference parses CoNLL-YAGO
 * TSV into docs + gold links, nel/corpora/conll.py — reference absent
 * at survey time, SURVEY.md §0/§2.1). Format here is CoNLL-2003-style:
 * one token per line, tab-separated `(line_no, token, ner)`, docs
 * delimited by `-DOCSTART-` rows, mentions as B-ENT/I-ENT runs. The
 * explicit line_no column makes row order engine-independent (CSV scan
 * order is not a contract in either Spark or DuckDB).
 *
 * The doc-boundary regroup is a running count over a GLOBAL ordered
 * window — correct for gold-corpus fixtures, which are single bounded
 * files (CoNLL-YAGO is ~1400 docs). The 100-TB path for this shape is
 * per-file windows keyed by `input_file_name()` with a two-pass
 * boundary-offset join; gold corpora never need it.
 */
object Conll {

  /**
   * Deterministically derive a CoNLL TSV fixture from a documents
   * parquet table (first `nDocs` docs by doc_id; capitalized-run B/I
   * tagging — the same convention as the P3 mention detector) and write
   * it idempotently (atomic move, byte-stable across calls) to `path`.
   * Derives from a FIXED sf level so every run at any sf produces the
   * same bytes — the DuckDB oracle reads this file by literal path.
   */
  def ensureFixture(spark: SparkSession, docsParquet: String, path: String,
      nDocs: Int = 100): String = {
    val docs = spark.read.parquet(docsParquet).select("doc_id", "text")
      .filter(col("doc_id") < nDocs).orderBy("doc_id").collect()
    val sb = new StringBuilder
    var ln = 0L
    def line(tok: String, ner: String): Unit = {
      sb.append(ln).append('\t').append(tok).append('\t').append(ner).append('\n')
      ln += 1
    }
    // synthetic docs are all-lowercase: proper-case a fixed word set so
    // the fixture has real B/I entity runs (same trick as q_mentions)
    val capWords = Set("spark", "customer", "table", "window", "query")
    docs.foreach { r =>
      line("-DOCSTART-", "O")
      val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
      var prevCap = false
      toks.foreach { t0 =>
        // strip CSV-hostile chars so both engines parse without quoting
        val t1 = t0.replaceAll("[\"\\\\\t]", "")
        val t = if (capWords(t1)) t1.capitalize else t1
        if (t.nonEmpty) {
          val cap = Character.isUpperCase(t.charAt(0))
          val ner = if (!cap) "O" else if (prevCap) "I-ENT" else "B-ENT"
          line(t, ner)
          prevCap = cap
        }
      }
    }
    val tmp = Paths.get(path + ".tmp." + ProcessHandle.current().pid())
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    path
  }

  /** Token rows regrouped into docs: doc_idx from a running count of
    * `-DOCSTART-` boundary rows, tok_pos the 0-based position within
    * the doc. */
  def tokens(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("sep", "\t")
      .schema("line_no LONG, token STRING, ner STRING").csv(path)
    val w = Window.orderBy("line_no")
    raw
      .withColumn("doc_idx",
        sum(when(col("token") === "-DOCSTART-", 1L).otherwise(0L)).over(w))
      .filter(col("token") =!= "-DOCSTART-")
      .withColumn("tok_pos",
        (row_number().over(Window.partitionBy("doc_idx").orderBy("line_no")) - 1)
          .cast("long"))
  }

  /** Gold mentions reassembled from B-ENT/I-ENT runs (gaps-and-islands:
    * island id = running count of B tags): one row per mention with
    * [begin_tok, end_tok) token span and the space-joined surface name. */
  def mentions(spark: SparkSession, path: String): DataFrame = {
    val t = tokens(spark, path)
    val w = Window.orderBy("line_no")
    t.withColumn("mid",
        sum(when(col("ner") === "B-ENT", 1L).otherwise(0L)).over(w))
      .filter(col("ner") =!= "O")
      .groupBy("doc_idx", "mid")
      .agg(min("tok_pos").as("begin_tok"),
        (max(col("tok_pos")) + lit(1L)).as("end_tok"),
        array_join(
          transform(array_sort(collect_list(struct(col("tok_pos"), col("token")))),
            x => x.getField("token")), " ").as("name"))
      .select("doc_idx", "begin_tok", "end_tok", "name")
  }
}
