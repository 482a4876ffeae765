package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Round-14 optimization specs: every test pins an optimized
  * operator's output to an independent reference formulation, so the
  * rewrite is checked for equivalence beyond the sf0.01 oracle rows.
  */
class Opt14Spec extends SparkTestBase {
  import testImplicits._

  /** The pre-round-14 per-arm sweep (one pipeline per config) kept
    * verbatim as the reference implementation for the fused
    * tagged-band sweep now in Dedup.lshTuning. */
  private def lshTuningReference(docs: DataFrame,
      threshold: Double): DataFrame = {
    val sigs = Dedup.shingleFeatures(docs).localCheckpoint(true)
    def cands(b: Int, r: Int): DataFrame = {
      val structs = (0 until b).map { i =>
        val bh = (0 until r).map(j => col(s"mh${i * r + j}"))
          .reduce((x, y) => (x * 31 + y) % MinhashP)
        struct(lit(i).as("band"), bh.as("band_hash"))
      }
      val rows = sigs
        .select(col("doc_id"), explode(array(structs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"),
          col("bs.band_hash").as("band_hash"))
      rows.alias("a").join(rows.alias("b"),
          col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    val truth = cands(12, 1)
      .join(sigs.select(col("doc_id").as("doc_a"), col("hashes").as("ha")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("hashes").as("hb")),
        Seq("doc_b"))
      .filter(jaccard(col("ha"), col("hb")) >= threshold)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val configs = Seq((12, 1), (6, 2), (4, 3), (3, 4))
    configs.map { case (b, r) =>
      val c = cands(b, r)
      val nc = c.agg(count(lit(1)).as("n_candidates"))
      val nt = c.join(truth, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_true_candidates"))
      nc.crossJoin(nt).crossJoin(nTrue)
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_candidates"), col("n_true_candidates"),
          when(col("n_candidates") > 0,
            expr("n_true_candidates * 1000000 div n_candidates"))
            .otherwise(lit(0L)).as("precision_micro"),
          when(col("n_true") > 0,
            expr("n_true_candidates * 1000000 div n_true"))
            .otherwise(lit(0L)).as("recall_micro"))
    }.reduce(_ unionByName _)
  }

  private def syntheticDocs: DataFrame = {
    // clusters of near-identical docs plus unique tails: enough
    // shingle overlap that every sweep arm sees real candidates
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "pack my box with five dozen liquor jugs before the long trip home",
      "sphinx of black quartz judge my vow said the old librarian twice")
    val docs = (0L until 60L).map { i =>
      val b = base((i % 3).toInt)
      val tail = if (i % 5 == 0) "" else s" variant token ${i / 3} extra"
      (i, b + tail)
    }
    docs.toDF("doc_id", "text")
  }

  test("fused lshTuning sweep matches the per-arm reference exactly") {
    val docs = syntheticDocs
    val fused = Dedup.lshTuning(docs, threshold = 0.5)
      .orderBy("bands").collect().map(_.toSeq)
    val ref = lshTuningReference(docs, threshold = 0.5)
      .orderBy("bands").collect().map(_.toSeq)
    assert(fused.length == 4)
    assert(fused.toSeq == ref.toSeq)
    // sanity: the (12,1) truth universe dominates every arm's recall
    val byBands = Dedup.lshTuning(docs, threshold = 0.5).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(byBands(12) >= byBands(3))
  }

  test("fused lshTuning schema and column order are unchanged") {
    val out = Dedup.lshTuning(syntheticDocs, threshold = 0.5)
    assert(out.columns.toSeq == Seq("bands", "rows_per_band",
      "n_candidates", "n_true_candidates", "precision_micro",
      "recall_micro"))
    val dt = out.schema.fields.map(_.dataType.simpleString).toSeq
    assert(dt == Seq("int", "int", "bigint", "bigint", "bigint", "bigint"))
  }
}
