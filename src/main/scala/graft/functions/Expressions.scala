package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd Catalyst expressions (SURVEY.md §4 "custom
  * pieces"). Both are deterministic, restatable in ANSI/DuckDB SQL
  * for the oracle gate, and stay inside whole-stage codegen (the
  * generated code is a single static call — same pattern as many
  * Spark built-ins that delegate to UTF8String/ArrayData helpers).
  */

/** Rolling polynomial hash over a string's Unicode code points:
  * h = fold(cp: h*31 + cp mod 1e9+7). The workhorse for shingle
  * hashing, MinHash, SimHash and document fingerprinting; DuckDB
  * restatement: list_reduce over ord() of string_split(s,'').
  */
case class PolyHash(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("poly_hash expects STRING")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

object PolyHash {
  final val Mod = 1000000007L
  /** Static helper the generated code calls. ASCII fast path: when
    * byte count == char count the string is pure ASCII and each byte
    * IS its code point — fold the UTF8 bytes directly, no String
    * allocation (this is the hottest kernel in the dedup pipeline).
    * Non-ASCII falls back to the code-point fold. */
  def hash(u: UTF8String): Long = {
    val nb = u.numBytes()
    if (nb == u.numChars()) {
      val bytes = u.getBytes
      var h = 0L
      var i = 0
      while (i < nb) { h = (h * 31 + bytes(i)) % Mod; i += 1 }
      h
    } else hashSlow(u.toString)
  }

  private def hashSlow(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
  /** Same fold over raw bytes (unsigned) — the multimodal payload
    * checksum. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }
}

/** Intersection cardinality of two SORTED, DISTINCT ARRAY<BIGINT>
  * columns via a linear merge — the verification kernel of the dedup
  * pipeline. Replaces array_intersect+size (hash-set allocation per
  * row, interpreted) with a codegen'd counting loop; same value as
  * DuckDB's len(list_intersect(a,b)) on distinct inputs.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "intersect_count expects two ARRAY<BIGINT> (sorted, distinct)")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectCount.count($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "intersect_count"
}

object IntersectCount {
  /** Linear merge over sorted distinct arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** 64-bit SimHash over an ARRAY<BIGINT> of feature hashes, one pass:
  * bit b is set iff Σ_h (2·parity_b(h) − 1) > 0 with parity_b(h) =
  * ((2b+1)·h + 7919·b) mod 2^31−1, lowest bit — the MinHash-style
  * permutation family (poly hashes live below 2^30, so raw bit
  * extraction past bit 30 would be degenerate). Semantically
  * identical to the 64 unrolled HOF folds it replaces (and to the
  * DuckDB restatement in the d3/d6 oracles), but runs as ONE
  * codegen'd JVM loop instead of 64 interpreted `aggregate` passes
  * over the array — the hot per-document kernel of the SimHash
  * family at corpus scale.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("simhash64 expects ARRAY<BIGINT>")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private final val P = 2147483647L
  /** Static helper the generated code calls. */
  def hash(a: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      // the SQL surface admits ARRAY<BIGINT> with null slots;
      // getLong on a null slot would silently fold garbage votes
      require(!a.isNullAt(i), s"simhash64: NULL element at index $i")
      val h = a.getLong(i)
      var b = 0
      while (b < 64) {
        // parity of the permuted hash: vote +1 if odd, -1 if even
        if ((((h * (2 * b + 1) + 7919L * b) % P) & 1L) == 1L) votes(b) += 1
        else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

/** Sorted distinct poly-hashes of a string's character 3-grams in
  * one codegen'd pass — the d4 feature kernel. Equivalent to
  * sort_array(collect_set(poly_hash(explode(charGrams3(s))))) but
  * row-local: the explode-shuffle-reaggregate round trip (one row
  * per gram through an exchange) collapses into a per-row loop, so
  * the corpus's grams never leave their partition. Input must
  * already be lowercased (the caller applies Spark's own `lower` so
  * case folding stays parity-identical with the oracle's
  * lower(text)). Gram hash = PolyHash fold of the gram's 3 code
  * points; under-3-codepoint strings yield an empty array.
  */
case class CharGramHashes(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("char_gram_hashes expects STRING")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    CharGramHashes.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGramHashes.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
  override def prettyName: String = "char_gram_hashes"
}

object CharGramHashes {
  private final val Mod = PolyHash.Mod

  /** Static helper the generated code calls. ASCII fast path folds
    * UTF8 bytes directly (byte == code point); otherwise grams are
    * windows of 3 Unicode code points, matching substring semantics
    * on both engines. */
  def hash(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps: Array[Int] =
      if (u.numBytes() == u.numChars()) {
        val bytes = u.getBytes
        Array.tabulate(bytes.length)(i => bytes(i) & 0xff)
      } else {
        val s = u.toString
        val out = new Array[Int](s.codePointCount(0, s.length))
        var i = 0; var j = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          out(j) = cp; j += 1
          i += Character.charCount(cp)
        }
        out
      }
    val n = math.max(0, cps.length - 2)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = ((cps(i).toLong * 31 + cps(i + 1)) % Mod * 31 + cps(i + 2)) % Mod
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place over the sorted array
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }
}

/** Product-quantization ENCODE in one codegen'd pass: for each of
  * `m` subspaces, the argmin codeword index over a FLATTENED
  * codebook (k codewords × dim floats, position-ordered), squared-L2
  * accumulated in double in ascending dim order with the
  * (dist ASC, index ASC) tiebreak (strict `<` keeps the first
  * minimum). Bit-identical to the interpreted HOF fold it replaces
  * and to the DuckDB row_number restatement in the s7 oracle — but
  * one JVM loop per vector instead of m×k interpreted `aggregate`
  * lambdas (the encode pass dominates s7's cost at corpus scale).
  */
case class PqCodes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(first.dataType) && isFloatArray(second.dataType) &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_codes expects (ARRAY<FLOAT> vec, ARRAY<FLOAT> flat codebook, INT m)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, cb: Any, m: Any): Any =
    PqCodes.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb, m) => s"graft.functions.PqCodes.encode($v, $cb, $m)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqCodes =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "pq_codes"
}

object PqCodes {
  /** Static helper the generated code calls. */
  def encode(v: ArrayData, cb: ArrayData, m: Int): ArrayData = {
    val dim = v.numElements()
    require(m > 0 && dim % m == 0, s"pq_codes: dim $dim not divisible by m $m")
    val sub = dim / m
    require(cb.numElements() > 0 && cb.numElements() % dim == 0,
      s"pq_codes: codebook length ${cb.numElements()} not a multiple of dim $dim")
    val k = cb.numElements() / dim
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val idx = mm * sub + d
          val diff = v.getFloat(idx).toDouble - cb.getFloat(j * dim + idx).toDouble
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j }
        j += 1
      }
      codes(mm) = bestJ
      mm += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }
}

/** Asymmetric-distance computation (the PQ search kernel): squared
  * L2 between a full-precision query and a corpus vector
  * reconstructed from its PQ codes, one codegen'd pass. Per-subspace
  * partial sums accumulate separately and add in ascending subspace
  * order — the EXACT double-addition grouping of the oracle's
  * list(dm ORDER BY m) fold, so results are bit-identical.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  private def isArr(t: DataType, e: DataType): Boolean = t match {
    case ArrayType(`e`, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isArr(first.dataType, FloatType) && isArr(second.dataType, IntegerType) &&
        isArr(third.dataType, FloatType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (ARRAY<FLOAT> query, ARRAY<INT> codes, ARRAY<FLOAT> flat codebook)")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    PqAdc.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (q, codes, cb) => s"graft.functions.PqAdc.adc($q, $codes, $cb)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "pq_adc"
}

object PqAdc {
  /** Static helper the generated code calls. */
  def adc(q: ArrayData, codes: ArrayData, cb: ArrayData): Double = {
    val dim = q.numElements()
    val m = codes.numElements()
    require(m > 0 && dim % m == 0, s"pq_adc: dim $dim not divisible by m $m")
    val sub = dim / m
    require(cb.numElements() % dim == 0,
      s"pq_adc: codebook length ${cb.numElements()} not a multiple of dim $dim")
    val k = cb.numElements() / dim
    var total = 0.0
    var mm = 0
    while (mm < m) {
      val j = codes.getInt(mm)
      require(j >= 0 && j < k, s"pq_adc: code $j outside codebook of $k")
      var acc = 0.0
      var d = 0
      while (d < sub) {
        val idx = mm * sub + d
        val diff = q.getFloat(idx).toDouble - cb.getFloat(j * dim + idx).toDouble
        acc += diff * diff
        d += 1
      }
      total += acc
      mm += 1
    }
    total
  }
}

/** Highest single-token occurrence count in an ARRAY<STRING> token
  * array, one codegen'd pass over an open hash map — the kernel of
  * the Gopher-style repetition quality metrics (a document whose
  * most frequent word dominates its length is boilerplate). DuckDB
  * restatement: max(c) over unnest + GROUP BY (doc, word). Empty
  * arrays yield 0. Row-local by construction: at corpus scale the
  * repetition profile is a narrow projection, never a token shuffle
  * (the explode + count + max restatement the oracle runs would
  * shuffle one row per token).
  */
case class TopTokenCount(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("top_token_count expects ARRAY<STRING>")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TopTokenCount.top(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopTokenCount.top($c)")
  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
  override def prettyName: String = "top_token_count"
}

object TopTokenCount {
  /** Static helper the generated code calls. UTF8String keys hash
    * and compare by bytes — no String materialization. */
  def top(a: ArrayData): Int = {
    val n = a.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      // the SQL surface admits ARRAY<STRING> with null slots; a null
      // token is a caller bug, not a countable word
      require(!a.isNullAt(i), s"top_token_count: NULL element at index $i")
      val c = counts.merge(a.getUTF8String(i), 1, (x, y) => x + y)
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** Cosine similarity over two ARRAY<FLOAT> embeddings, accumulated
  * in double in ascending index order — the exact fold order the
  * DuckDB oracle restates with list_reduce, so results are
  * bit-identical. Returns NULL on length mismatch or zero norm.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("cosine_sim expects two ARRAY<FLOAT>")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local name: two cosine_sim calls can land in the same
      // codegen scope (both children non-nullable emits no braces),
      // and a fixed `r` would collide and kill codegen for the stage
      val r = ctx.freshName("cosRes")
      s"""java.lang.Double $r = graft.functions.CosineSim.cosine($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Static helper the generated code calls; java.lang.Double so the
    * zero-norm / length-mismatch case can be NULL. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Per-document bigram-LM scoring kernel (x26's hot loop): one JVM
  * pass over the text against a small conditional-probability model
  * passed as two ALIGNED broadcast arrays (sorted bigram strings +
  * their P(c2|c1)). Returns ARRAY<DOUBLE> [n_bigrams, sum_prob,
  * min_prob] — the position-ordered sequential sum, so the fold is
  * bit-identical to the oracle's list_reduce. The naive HOF spelling
  * (transform over positions + element_at on a MAP literal) costs
  * O(|text| × |model|) per row because Catalyst map lookup is a
  * linear scan — 14 s at sf0.1; this kernel is O(|model| + |text|)
  * per row (the per-row model HashMap build is bounded by alphabet²
  * BY CONSTRUCTION of a char-bigram model — a word-level model would
  * hoist the build to a per-partition broadcast object instead).
  * Contract: bigrams are UTF-16 code-unit pairs (identical to code
  * points on the BMP; the corpus is plane-0 text). A bigram absent
  * from the model scores 0.0 — with a model trained on the scored
  * corpus itself this never fires.
  */
case class BigramScore(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  private def isArr(t: DataType, e: DataType): Boolean = t match {
    case ArrayType(`e`, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && isArr(second.dataType, StringType) &&
        isArr(third.dataType, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bigram_score expects (STRING text, ARRAY<STRING> grams, ARRAY<DOUBLE> probs)")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, g: Any, p: Any): Any =
    BigramScore.score(t.asInstanceOf[UTF8String],
      g.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, g, p) => s"graft.functions.BigramScore.score($t, $g, $p)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BigramScore =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "bigram_score"
}

object BigramScore {
  /** Static helper the generated code calls. */
  def score(text: UTF8String, grams: ArrayData, probs: ArrayData): ArrayData = {
    val n = grams.numElements()
    require(probs.numElements() == n,
      s"bigram_score: ${probs.numElements()} probs for $n grams")
    val model = new java.util.HashMap[Integer, java.lang.Double](n * 2)
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i).toString
      require(g.length == 2, s"bigram_score: gram '$g' is not 2 code units")
      model.put(Integer.valueOf((g.charAt(0) << 16) | g.charAt(1)),
        java.lang.Double.valueOf(probs.getDouble(i)))
      i += 1
    }
    val s = text.toString
    val m = s.length - 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(0.0, 0.0, 0.0))
    var sum = 0.0
    var mn = java.lang.Double.POSITIVE_INFINITY
    var j = 0
    while (j < m) {
      val p = model.get(Integer.valueOf((s.charAt(j) << 16) | s.charAt(j + 1)))
      val d = if (p == null) 0.0 else p.doubleValue()
      sum += d
      if (d < mn) mn = d
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(m.toDouble, sum, mn))
  }
}

/** Distinct sliding character windows (d10's extraction kernel): one
  * JVM pass emits every DISTINCT length-n substring of the text —
  * the complete candidate key set for exact substring-match dedup.
  * The HOF spelling (transform over positions + substr +
  * array_distinct) paid per-position Substring allocations plus an
  * O(windows²)-ish distinct pass per row; this kernel is a single
  * forward walk into a hash set. Window identity is the VERBATIM
  * string (the shuffle key the oracle restates byte-for-byte);
  * windows are UTF-16 code-unit spans — identical to code points on
  * the BMP, same contract as bigram_score.
  */
case class CharWindows(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "char_windows expects (STRING text, INT window length)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, n: Any): Any =
    CharWindows.windows(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.CharWindows.windows($t, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharWindows =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "char_windows"
}

object CharWindows {
  /** Static helper the generated code calls. */
  def windows(text: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"char_windows: non-positive window $n")
    val s = text.toString
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= s.length) {
      out.add(s.substring(i, i + n))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** Per-document character entropy in micro-nats (the x48 metric) as
  * ONE codegen'd pass — the documented escalation for the
  * interpreted HOF fold (O(k·n) filter passes per doc): count code
  * units in a single sweep, then fold n_c·ln(n_c) over the DISTINCT
  * characters in ascending order — the same order `array_sort` gives
  * 1-char strings (UTF-8 byte order ≡ code-unit order for BMP text),
  * so the double is bit-identical to the HOF path the DuckDB oracle
  * restates. Empty input returns 0.
  */
case class CharEntropyMicro(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("char_entropy_micro expects STRING")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    CharEntropyMicro.entropyMicro(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyMicro.entropyMicro($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
  override def prettyName: String = "char_entropy_micro"
}

object CharEntropyMicro {
  /** Static helper the generated code calls. */
  def entropyMicro(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0L
    // sorted distinct iteration = the HOF path's array_sort order
    val counts = new java.util.TreeMap[Character, Long]()
    var i = 0
    while (i < n) {
      counts.merge(s.charAt(i), 1L, (a, b) => a + b)
      i += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * math.log(c)
    }
    val h = math.log(n.toDouble) - sum / n.toDouble
    math.floor(h * 1000000.0 + 0.5).toLong
  }
}
