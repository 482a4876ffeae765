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

  /** Evaluate `value` ONCE per row and reference it many times:
    * binds the expression to a higher-order-function lambda variable
    * (transform over a 1-element array). Without this, every
    * reference to a computed array/string argument re-evaluates the
    * full expression — e.g. element_at(split(...), i) re-splits the
    * document per shingle element, turning an O(tokens) op into
    * O(tokens²). Catalyst's CollapseProject would inline a plain
    * projection alias, so the lambda binding is the reliable
    * row-local CSE. */
  def bind(value: Column, f: Column => Column): Column =
    element_at(transform(array(value), f), 1)

  /** Whitespace tokenizer: lower, split on \s+, drop empties.
    * DuckDB: list_filter(string_split_regex(lower(t),'\s+'), x->x<>'') */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** Distinct word 3-shingles ("w1 w2 w3") of a token array — the
    * MinHash feature set. Docs under 3 tokens yield an empty set.
    * DuckDB: list_distinct(list_transform(range(1,len(ts)-1),
    *         i -> ts[i]||' '||ts[i+1]||' '||ts[i+2])) */
  def shingles3(toks: Column): Column = bind(toks, ts =>
    when(size(ts) >= 3,
      array_distinct(transform(sequence(lit(1), size(ts) - 2),
        i => concat_ws(" ",
          element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2)))))
      .otherwise(array().cast("array<string>")))

  /** Distinct character 3-grams of lower(text). */
  def charGrams3(text: Column): Column = bind(lower(text), t =>
    when(length(t) >= 3,
      array_distinct(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>")))

  /** SORTED DISTINCT poly-hashes of the character 3-grams of an
    * ALREADY-LOWERED string, in one codegen'd pass (the
    * functions.CharGramHashes expression) — equivalent to hashing
    * charGrams3 gram by gram, but row-local: no explode, no
    * reaggregation shuffle. The caller supplies lower(text) so case
    * folding stays Spark's own. */
  def charGramHashes(loweredText: Column): Column =
    call_function("char_gram_hashes", loweredText)

  /** MinHash permutation modulus (2^31-1, prime). The signature
    * itself is computed as k min-aggregates in Dedup.shingleFeatures
    * (explode + partial agg — hashes computed once per corpus scan). */
  val MinhashP = 2147483647L

  /** Exact Jaccard similarity of two SORTED DISTINCT ARRAY<BIGINT>
    * columns: |∩| / (|a|+|b|-|∩|) in double, |∩| via the codegen'd
    * intersect_count merge (no per-row hash-set allocation). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = call_function("intersect_count", a, b)
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** 64-bit SimHash over an ARRAY<BIGINT> of feature hashes (the
    * codegen'd functions.SimHash64 expression, registered by
    * GraftExtensions). Bit b is set iff Σ_h (2·parity_b(h) − 1) > 0,
    * where parity_b(h) = ((2b+1)·h + 7919·b) mod P, lowest bit — the
    * MinHash-style permutation family. The permutation matters
    * twice: poly hashes live below 2^30, so raw bit extraction past
    * bit 30 would be degenerate (the round-3 32-bit version
    * effectively had 30 bits and saturated on uniform corpora), and
    * permuted parities decorrelate the bits so the fingerprint
    * discriminates. One codegen'd pass per row — not 64 interpreted
    * HOF folds. DuckDB restates the fingerprint as the plain sum of
    * signed bit weights (1L << b), which is exact and overflow-free
    * under checked arithmetic. */
  def simhash64(hashes: Column): Column = call_function("simhash64", hashes)

  /** Highest single-token occurrence count of an ARRAY<STRING> (the
    * codegen'd functions.TopTokenCount expression) — one row-local
    * pass; the oracle restates it as max(c) over unnest + GROUP BY.
    * Empty arrays yield 0. */
  def topTokenCount(toks: Column): Column = call_function("top_token_count", toks)

  /** Stopword membership set used by the quality metrics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")
}
