package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{BigramScore, CharEntropyMicro, CharGramHashes, CharWindows, CosineSim, IntersectCount, MisraGries, PolyHash, PqAdc, PqCodes, ScatterMoments, SimHash64, TopTokenCount}

/** Engine extension point, installed via
  * `spark.sql.extensions=graft.GraftExtensions` (Engine.session) —
  * the idiomatic public API for registering custom Catalyst pieces;
  * works identically under spark-submit on a real cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
      (args: Seq[Expression]) => IntersectCount(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
      (args: Seq[Expression]) => CharGramHashes(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
      (args: Seq[Expression]) => PqCodes(args(0), args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => PqAdc(args(0), args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("top_token_count"),
      new ExpressionInfo(classOf[TopTokenCount].getName, "top_token_count"),
      (args: Seq[Expression]) => TopTokenCount(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("bigram_score"),
      new ExpressionInfo(classOf[BigramScore].getName, "bigram_score"),
      (args: Seq[Expression]) => BigramScore(args(0), args(1), args(2))))
    ext.injectFunction((
      new FunctionIdentifier("char_windows"),
      new ExpressionInfo(classOf[CharWindows].getName, "char_windows"),
      (args: Seq[Expression]) => CharWindows(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy_micro"),
      new ExpressionInfo(classOf[CharEntropyMicro].getName, "char_entropy_micro"),
      (args: Seq[Expression]) => CharEntropyMicro(args.head)))
    // bounded-memory frequent-items sketch aggregate (the candidate
    // half of the two-pass heavy-hitters recipe; x36)
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => MisraGries.fromArgs(args)))
    // exact integer second-moment fold (s32's one-pass scatter
    // build): O(dim^2) buffer per partition, 128-bit accumulators
    ext.injectFunction((
      new FunctionIdentifier("scatter_moments"),
      new ExpressionInfo(classOf[ScatterMoments].getName, "scatter_moments"),
      (args: Seq[Expression]) => ScatterMoments.fromArgs(args)))
    // Spark's own bloom sketch aggregate + probe predicate (the pair
    // its runtime bloom join injects), exposed at the SQL surface so
    // a collected bloom_filter_agg sketch can prefilter a join's
    // probe side; both live only in the INTERNAL function registry,
    // so the engine registers them itself
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg expects 1-3 arguments")
      }))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))))
    // custom whole-operator plan node (DetectNode -> DetectExec)
    ext.injectPlannerStrategy(_ => graft.plans.DetectStrategy)
  }
}
