package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a first-class Catalyst
  * aggregate (`misra_gries(term, capacity)`): the sketch half of the
  * classic two-pass distributed heavy-hitters recipe. One pass with
  * capacity k keeps at most k counters and guarantees every term
  * with true frequency > n/(k+1) survives as a candidate; a second
  * exact-count pass over just the candidates turns the
  * merge-order-dependent sketch into a deterministic exact answer.
  *
  * Scale story: the buffer is O(k) per partial aggregate regardless
  * of vocabulary size, and partials merge associatively (Agarwal et
  * al., "Mergeable Summaries", PODS 2012: summing matched counters
  * then subtracting the (k+1)-st largest preserves the error bound
  * est <= true <= est + n/(k+1)) — so a 100 TB token stream reduces
  * to one k-entry row per partition and a driver-side merge, where a
  * full `groupBy(term)` would shuffle one row per distinct term of
  * an unbounded vocabulary. The exact verify pass then touches only
  * `isin(candidates)` rows, which the scan's dictionary filter can
  * skip at the stripe level.
  *
  * Reference anchor: the reference's metrics stage accumulates
  * per-label counts over an unbounded stream
  * (`/root/reference/gst-detection-tf.py:220-241`); this is the
  * bounded-memory analog for unbounded key domains.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= 65536,
    s"misra_gries capacity must be in [1, 65536], got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects STRING input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long](capacity * 2)

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    val c = buf.get(key)
    if (c != null) {
      buf.put(key, c + 1L)
    } else if (buf.size < capacity) {
      // copy: the UTF8String may point into a reused unsafe-row page
      buf.put(key.clone(), 1L)
    } else {
      // decrement-all; amortized O(1): each sweep pays for `capacity`
      // prior insertions
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    other.forEach { (k, v) =>
      val c = buf.get(k)
      buf.put(k, if (c == null) v else java.lang.Long.valueOf(c + v))
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-st largest count from all, drop <= 0
      val counts = new Array[Long](buf.size)
      var i = 0
      buf.forEach { (_, v) => counts(i) = v; i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - capacity - 1)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val arr = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    buf.forEach { (k, v) => arr(i) = (k, v.longValue); i += 1 }
    // deterministic presentation order (the candidate SET itself is
    // merge-order dependent — consumers must re-verify exactly)
    java.util.Arrays.sort(arr, (a: (UTF8String, Long), b: (UTF8String, Long)) => {
      val byEst = java.lang.Long.compare(b._2, a._2)
      if (byEst != 0) byEst else a._1.compareTo(b._1)
    })
    new GenericArrayData(arr.map { case (k, v) =>
      InternalRow(k, v): Any
    })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, java.lang.Long](capacity * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Builder for SQL registration: capacity must be a foldable
    * integer literal (it sizes the aggregation buffer at plan time). */
  def fromArgs(args: Seq[Expression]): MisraGries = {
    require(args.length == 2, "misra_gries expects (term, capacity)")
    require(args(1).foldable, "misra_gries capacity must be a literal")
    MisraGries(args(0), args(1).eval().asInstanceOf[Number].intValue())
  }
}
