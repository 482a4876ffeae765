package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusQueries

/** x37 cross-corpus perplexity filter: flag semantics and the
  * integer-micro quantization that keeps it oracle-exact. */
class PerplexitySpec extends SparkTestBase {
  import testImplicits._

  test("x37 runs on the corpus: one row per source, counts conserved") {
    val rows = CorpusQueries.x37PerplexityFilter(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one row per source")
    rows.foreach { case (_, nDocs, _, nFlag, rate) =>
      assert(nFlag >= 0 && nFlag <= nDocs)
      assert(math.abs(rate - nFlag.toDouble / nDocs) < 1e-6)
    }
    val total = rows.map(_._2).sum
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(total == corpus, "every document is scored exactly once")
  }

  test("gibberish drifts below the reference gate; reference text does not") {
    // reference slice: plain english-ish text (src0); probe slice:
    // alphabet the model never saw -> every bigram OOV -> score 0
    val ref = (0 until 40).map(i =>
      (i.toLong, s"the quick brown fox jumps over dog $i", "en", "src0"))
    val bad = (40 until 50).map(i =>
      (i.toLong, "zzqxj vvkwq jjqzx xqjzv kkwvq", "en", "srcBad"))
    val docs = (ref ++ bad).toDF("doc_id", "text", "lang", "source")
    docs.createOrReplaceTempView("x37docs")

    // run the same shape as x37 against the temp view via the helper
    val model = CorpusQueries.bigramModelRow(docs.where(col("source") === "src0"))
    val scored = docs.crossJoin(broadcast(model))
      .select(col("source"), call_function("bigram_score",
        col("text"), col("grams"), col("probs")).as("sc"))
      .select(col("source"),
        when(element_at(col("sc"), 1) > 0,
          floor(element_at(col("sc"), 2) / element_at(col("sc"), 1)
            * lit(1000000.0) + lit(0.5)))
          .otherwise(0L).cast("long").as("m"))
      .as[(String, Long)].collect()
    val refScores = scored.filter(_._1 == "src0").map(_._2)
    val badScores = scored.filter(_._1 == "srcBad").map(_._2)
    val refMean = refScores.sum / refScores.length
    // every gibberish doc scores below half the reference mean
    badScores.foreach(s => assert(s * 2 < refMean,
      s"gibberish score $s should be far below ref mean $refMean"))
    // no reference doc is flagged by its own model at the 0.5x gate
    refScores.foreach(s => assert(s * 2 >= refMean))
  }

  test("score quantization is stable: micro units are integral and bounded") {
    // a doc of repeated identical bigrams scores p=1 for every bigram
    // under a model trained on itself -> mean prob 1.0 -> 1_000_000
    val docs = Seq((1L, "aaaaaaaa", "en", "src0")).toDF("doc_id", "text", "lang", "source")
    val model = CorpusQueries.bigramModelRow(docs)
    val m = docs.crossJoin(broadcast(model))
      .select(call_function("bigram_score",
        col("text"), col("grams"), col("probs")).as("sc"))
      .select(floor(element_at(col("sc"), 2) / element_at(col("sc"), 1)
        * lit(1000000.0) + lit(0.5)).cast("long"))
      .as[Long].head()
    assert(m == 1000000L)
  }
}
