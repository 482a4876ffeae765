package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders. Everything here is a pure Catalyst
  * expression tree (no UDFs): row-local, codegen'd, shuffle-free —
  * the per-document work of a 100 TB dedup/quality pipeline is a
  * narrow map, so the only shuffles left are the keyed joins/aggs
  * that are semantically required (LSH band join, token histogram).
  *
  * Every builder has an exact DuckDB restatement used by the oracle
  * queries; arithmetic is integer or sequenced-double so both
  * engines produce bit-identical values.
  */
object TextFunctions {

  /** poly_hash as a Column (registered by GraftExtensions). */
  def polyHash(c: Column): Column = call_function("poly_hash", c)

  /** cosine_sim as a Column (registered by GraftExtensions). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Whitespace tokenizer: lower, split on \s+, drop empties.
    * DuckDB: list_filter(string_split_regex(lower(t),'\s+'), x->x<>'') */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Distinct word 3-shingles ("w1 w2 w3") of a token array — the
    * MinHash feature set. Docs under 3 tokens yield an empty set.
    * DuckDB: list_distinct(list_transform(range(1,len(ts)-1),
    *         i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character 3-grams of lower(text). */
  def charGrams3(text: Column): Column = {
    val t = lower(text)
    when(length(t) >= 3,
      array_distinct(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature (k permutations) over an ARRAY<BIGINT> of
    * feature hashes: sig[j] = min over h of ((2j+1)*h + 7919j) mod P,
    * P = 2^31-1. Row-local; commutative min so feature order never
    * matters. */
  val MinhashP = 2147483647L
  def minhashSig(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(hashes,
        h => ((j * 2 + 1) * h + lit(7919) * j) % MinhashP)))

  /** LSH band rows: one struct(band, band_hash) per band of r=3
    * signature slots, band_hash = ordered 31-poly fold mod P.
    * DuckDB: ((sg[3b+1]*31+sg[3b+2])%P*31+sg[3b+3])%P */
  def bandStructs(sig: Column, bands: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b => {
      val s1 = element_at(sig, b * 3 + 1)
      val s2 = element_at(sig, b * 3 + 2)
      val s3 = element_at(sig, b * 3 + 3)
      struct(b.as("band"),
        (((s1 * 31 + s2) % MinhashP * 31 + s3) % MinhashP).as("band_hash"))
    })

  /** Exact Jaccard similarity of two string-set columns (distinct
    * arrays), computed as |∩| / (|a|+|b|-|∩|) in double. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** 32-bit SimHash over an ARRAY<BIGINT> of feature hashes: bit b is
    * set iff Σ_h (2*((h>>b)&1)-1) > 0; folded MSB-first so the
    * fingerprint is Σ bit_b << b. Row-local, commutative sums. */
  def simhash32(hashes: Column): Column = {
    // bit positions are static, so unroll at plan-build time (the
    // shiftright(Column, Int) overload keeps everything codegen'd)
    val bitsDesc = array((31 to 0 by -1).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1L) * 2 - 1))
      when(vote > 0, 1L).otherwise(0L)
    }: _*)
    aggregate(bitsDesc, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** Stopword membership set used by the quality metrics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")
}
