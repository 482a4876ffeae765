package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharGramHashes, CosineSim, IntersectCount, PolyHash, SimHash64}

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
    // custom whole-operator plan node (DetectNode -> DetectExec)
    ext.injectPlannerStrategy(_ => graft.plans.DetectStrategy)
  }
}
