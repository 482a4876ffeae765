package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulator for the exact integer second-moment pass: row count,
  * per-dimension sums (Long — same magnitude budget as the SQL
  * `sum(bigint)` it replaces), and the dim·(dim+1)/2 upper-triangle
  * product sums Σxᵢxⱼ carried as signed 128-bit (hi, lo) pairs so a
  * partition can fold an unbounded number of ±1e12-magnitude
  * products without ever touching floating point or BigInteger on
  * the per-row path. */
final class MomentBuffer(val dim: Int) {
  val tri: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  val sx: Array[Long] = new Array[Long](dim)
  val hi: Array[Long] = new Array[Long](tri)
  val lo: Array[Long] = new Array[Long](tri)

  /** 128-bit signed accumulate: acc[k] += p (p sign-extended). */
  @inline def add128(k: Int, p: Long): Unit = {
    val l = lo(k)
    val s = l + p
    // unsigned carry out of the low word (Hacker's Delight 2-13)
    val carry = ((l & p) | ((l | p) & ~s)) >>> 63
    lo(k) = s
    hi(k) += (p >> 63) + carry
  }

  def mergeFrom(o: MomentBuffer): Unit = {
    n += o.n
    var d = 0
    while (d < dim) { sx(d) = Math.addExact(sx(d), o.sx(d)); d += 1 }
    var k = 0
    while (k < tri) {
      val l = lo(k); val p = o.lo(k)
      val s = l + p
      val carry = ((l & p) | ((l | p) & ~s)) >>> 63
      lo(k) = s
      hi(k) += o.hi(k) + carry
      k += 1
    }
  }

  def toBigInteger(k: Int): BigInteger = {
    val b = new Array[Byte](16)
    var x = hi(k); var i = 7
    while (i >= 0) { b(i) = x.toByte; x >>>= 8; i -= 1 }
    x = lo(k); i = 15
    while (i >= 8) { b(i) = x.toByte; x >>>= 8; i -= 1 }
    new BigInteger(b) // big-endian two's complement = signed 128-bit
  }
}

/** `scatter_moments(vec, dim)` — ONE codegen-adjacent corpus pass
  * that folds each `array<long>` micro-lattice vector into the exact
  * integer moments a scatter-matrix build needs: row count n,
  * per-dimension sums Σxᵢ, and the upper-triangle product moments
  * Σxᵢxⱼ (mirrored below the diagonal by the consumer). Replaces the
  * 2080-`struct(i,j,p)`-per-row explode spelling of s32's moment
  * pass: the arithmetic is identical (products in Long — the same
  * budget `element_at(xu,i)·element_at(xu,j)` had, fail-fast via
  * multiplyExact under the engine's ANSI contract — summed exactly),
  * but no per-product rows are materialized, hashed, or exchanged;
  * each partition ships ONE ~50 KB buffer.
  *
  * 100 TB shape: buffer size is O(dim²) regardless of corpus size,
  * partials merge associatively (128-bit adds), and the final
  * exchange is one buffer per partition — the minimum possible
  * traffic for an exact second-moment pass. Magnitude audit: each
  * product |xᵢxⱼ| ≤ ~1.2e12 on the micro-unit lattice, so the signed
  * 128-bit accumulators absorb ~7e25 rows before wrap — effectively
  * unbounded; Σxᵢ in Long holds to ~9e12 rows, the same ceiling as
  * the SQL `sum(bigint)` it replaces (shard-and-merge beyond,
  * documented at the s32 escalation note).
  *
  * Reference anchor: the reference's stats stage accumulates
  * running per-channel moments over the frame stream
  * (`/root/reference/gst-detection-tf.py:220-241`); this is the
  * exact-integer, mergeable analog for embedding corpora.
  */
case class ScatterMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentBuffer]
  with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 512,
    s"scatter_moments dim must be in [1, 512], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"scatter_moments expects ARRAY<BIGINT>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("sxy", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("sxy", DecimalType(38, 0), nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer(dim)

  override def update(buf: MomentBuffer, input: InternalRow): MomentBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == dim,
      s"scatter_moments: expected $dim components, got ${arr.numElements()}")
    val x = arr.toLongArray()
    buf.n += 1
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = x(i)
      buf.sx(i) = Math.addExact(buf.sx(i), xi)
      var j = i
      while (j < dim) {
        buf.add128(k, Math.multiplyExact(xi, x(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: MomentBuffer, other: MomentBuffer): MomentBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MomentBuffer): Any = {
    val sxy = new Array[Any](buf.tri)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        sxy(k) = InternalRow(i, j,
          Decimal(BigDecimal(buf.toBigInteger(k)), 38, 0))
        k += 1
        j += 1
      }
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(buf.sx.clone()),
      new GenericArrayData(sxy))
  }

  override def serialize(buf: MomentBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream((buf.dim + 2 * buf.tri + 2) * 8)
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var d = 0
    while (d < buf.dim) { out.writeLong(buf.sx(d)); d += 1 }
    var k = 0
    while (k < buf.tri) { out.writeLong(buf.hi(k)); out.writeLong(buf.lo(k)); k += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MomentBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MomentBuffer(dim)
    buf.n = in.readLong()
    var d = 0
    while (d < dim) { buf.sx(d) = in.readLong(); d += 1 }
    var k = 0
    while (k < buf.tri) { buf.hi(k) = in.readLong(); buf.lo(k) = in.readLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ScatterMoments =
    copy(child = newChild)
  override def prettyName: String = "scatter_moments"
}

object ScatterMoments {
  /** Builder for SQL registration: dim must be a foldable integer
    * literal (it sizes the aggregation buffer at plan time). */
  def fromArgs(args: Seq[Expression]): ScatterMoments = {
    require(args.length == 2, "scatter_moments expects (vec, dim)")
    require(args(1).foldable, "scatter_moments dim must be a literal")
    ScatterMoments(args(0), args(1).eval().asInstanceOf[Number].intValue())
  }
}
