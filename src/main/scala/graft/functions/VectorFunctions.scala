package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (ARRAY<FLOAT> columns). All
  * arithmetic is double with ascending-index sequential folds so the
  * DuckDB oracle (list_reduce over range(dim)) is bit-identical.
  */
object VectorFunctions {

  /** Deterministic integer hyperplane coefficient r[j][k] — the
    * "random" projections of sign-LSH, derived from pure arithmetic
    * so both engines can restate them: ((j*37 + k*101) mod 19) - 9,
    * zero-mean over k. */
  def planeCoef(j: Int, k: Int): Int = ((j * 37 + k * 101) % 19) - 9

  /** Dot product of an embedding with integer hyperplane j, double
    * accumulation ascending k. `dim` is the static embedding width. */
  def planeDot(emb: Column, j: Int, dim: Int): Column = {
    val terms = array((0 until dim).map { k =>
      get(emb, lit(k)).cast("double") * planeCoef(j, k)
    }: _*)
    aggregate(terms, lit(0.0), (acc, x) => acc + x)
  }

  /** Sign-LSH bucket id from `planes` hyperplanes: MSB-first fold of
    * the sign bits — vectors within a bucket are cosine-similar with
    * high probability, so near-dup search joins on `bucket` instead
    * of comparing all pairs. DuckDB restatement mirrors the fold. */
  def lshBucket(emb: Column, planes: Int, dim: Int): Column = {
    val bitsDesc = array((0 until planes).map { j =>
      when(planeDot(emb, j, dim) > 0, 1L).otherwise(0L)
    }: _*)
    aggregate(bitsDesc, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** Binary-quantization word: dims [lo, hi) packed MSB-first into
    * one LONG, bit set iff the dimension is strictly positive — the
    * 1-bit-per-dim storage scheme (64-dim float32 → 8 bytes, 32×).
    * `hi - lo` must stay ≤ 63 so the acc*2 fold never touches the
    * sign bit (a 64-dim vector packs into TWO 32-bit words, keeping
    * every intermediate non-negative — DuckDB's checked BIGINT
    * arithmetic would trap an overflowing fold). Row-local. */
  def signWord(emb: Column, lo: Int, hi: Int): Column = {
    require(hi - lo > 0 && hi - lo <= 63, s"word width ${hi - lo}")
    val bitsDesc = array((lo until hi).map { k =>
      when(get(emb, lit(k)).cast("double") > 0, 1L).otherwise(0L)
    }: _*)
    aggregate(bitsDesc, lit(0L), (acc, bit) => acc * 2 + bit)
  }
}
