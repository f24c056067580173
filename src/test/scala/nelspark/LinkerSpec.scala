package nelspark

import nelspark.gen.CorpusGen
import nelspark.model.ModelTables
import nelspark.pipeline._
import org.apache.spark.sql.functions._

/** Candidate-ranking linker (J1→W2→J3/F12→W1 + NIL): train model tables
  * on one half of the corpus, link the other half, expect high accuracy
  * on aliased mentions and NIL for unknown names. */
class LinkerSpec extends SparkSpec {
  import spark.implicits._

  test("linker resolves mentions to gold entities via model tables") {
    val gen = CorpusGen.generate(spark, 1200L, 150L).cache()
    val extracted = Extract(CorpusGen.pages(gen))
    val mentions = Mentions(extracted).cache()
    val labeled = Evaluate.labeledMentions(mentions, CorpusGen.gold(gen))
      .join(mentions.select("mention_id", "url"), Seq("mention_id")).cache()

    // split: even pages train the models, odd pages get linked
    val train = labeled.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val test = labeled.filter(pmod(xxhash64(col("url")), lit(2)) === 1)

    val pageTerms = {
      val terms = extracted
        .select(col("url"), explode(split(lower(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("url", "term").agg(count(lit(1)).cast("double").as("tf"))
      val n = extracted.count()
      val dfT = terms.groupBy("term").agg(count(lit(1)).as("df"))
      val weighted = terms.join(dfT, "term")
        .withColumn("w0", col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0))
      val norms = weighted.groupBy("url").agg(sqrt(sum(col("w0") * col("w0"))).as("nrm"))
      weighted.join(norms, "url").select(col("url"), col("term"),
        (col("w0") / col("nrm")).as("w"))
    }

    val linked = Linker.link(
      mentions = test.select("mention_id", "url", "name_norm"),
      pageTerms = pageTerms,
      aliases = ModelTables.aliases(train),
      entityPrior = ModelTables.entityPrior(train),
      nameProb = ModelTables.nameProb(train),
      entityTfidf = ModelTables.entityTfidf(extracted, train)).cache()

    val eval = linked.join(test.select(col("mention_id"),
      col("entity_id").as("gold_ent")), Seq("mention_id"))
    val n = eval.count()
    val correct = eval.filter(col("entity_id") === col("gold_ent")).count()
    val acc = correct.toDouble / n
    info(s"linker accuracy = $acc over $n test mentions " +
      s"(nil rate ${eval.filter(col("is_nil")).count().toDouble / n})")
    // test-half names unseen in train (typo'd variants) rightly go NIL;
    // among non-NIL predictions accuracy should be high
    val nonNil = eval.filter(!col("is_nil"))
    val accNonNil = nonNil.filter(col("entity_id") === col("gold_ent")).count().toDouble /
      math.max(nonNil.count(), 1L)
    info(s"non-NIL accuracy = $accNonNil")
    assert(accNonNil >= 0.9, s"non-NIL accuracy $accNonNil")
    assert(acc >= 0.6, s"overall accuracy $acc")
  }

  test("unknown names resolve to NIL") {
    val mentions = Seq((1L, "u1", "completely unknown zorp")).toDF("mention_id", "url", "name_norm")
    val pageTerms = Seq(("u1", "zka", 1.0)).toDF("url", "term", "w")
    val aliases = Seq(("known name", 5L, 3L)).toDF("name_norm", "entity_id", "cnt")
    val prior = Seq((5L, 1.0)).toDF("entity_id", "p")
    val np = Seq(("known name", 5L, 1.0)).toDF("name_norm", "entity_id", "p")
    val tfidf = Seq((5L, "zka", 1.0)).toDF("entity_id", "term", "w")
    val linked = Linker.link(mentions, pageTerms, aliases, prior, np, tfidf)
    val rows = linked.collect()
    assert(rows.length == 0 || rows.forall(_.getAs[Boolean]("is_nil")))
  }
}
