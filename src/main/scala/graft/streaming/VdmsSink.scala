package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import org.apache.spark.sql.DataFrame

/** S7: the VDMS batch sink re-expressed for Structured Streaming.
  *
  * The reference buffers every `AddBoundingBox` record in process
  * memory and flushes once over one connection at end-of-stream
  * (`gst-detection-tf.py:308-322,339-344,421-423`) — which loses all
  * buffered work on a crash. Here each micro-batch is written through
  * `foreachBatch` with per-partition connections and batched RPCs,
  * and replays are IDEMPOTENT by batch id, so checkpoint + restart
  * gives effectively-exactly-once delivery the reference lacks
  * (SURVEY.md §2.7 exactly-once row).
  */
trait MetadataStore extends Serializable {
  /** Open a connection in this task; `add` is called with bounded
    * record batches (the reference's single batched query() call,
    * amortized per partition). */
  def connect(): MetadataConnection
  /** True if this micro-batch was already committed (replay after
    * restart) — callers skip it. */
  def isCommitted(batchId: Long): Boolean
  def commit(batchId: Long): Unit
}

trait MetadataConnection {
  def add(records: Seq[String]): Unit
  def close(): Unit
}

/** In-memory store: the hermetic test double standing in for the
  * VDMS client (the real client would hold a TCP connection per
  * partition). Safe in local mode where executors share the JVM. */
class InMemoryStore extends MetadataStore {
  def connect(): MetadataConnection = new MetadataConnection {
    def add(records: Seq[String]): Unit =
      records.foreach(InMemoryStore.records.add)
    def close(): Unit = ()
  }
  def isCommitted(batchId: Long): Boolean =
    InMemoryStore.committed.containsKey(batchId)
  def commit(batchId: Long): Unit =
    InMemoryStore.committed.put(batchId, java.lang.Boolean.TRUE)
}

object InMemoryStore {
  // a queue, not a set: identical wire records from different frames
  // are distinct uploads and must both be stored
  private[streaming] val records = new ConcurrentLinkedQueue[String]()
  private[streaming] val committed = new ConcurrentHashMap[Long, java.lang.Boolean]()
  def size: Int = records.size
  def committedCount: Int = committed.size
  def all: Seq[String] = {
    val it = records.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  def reset(): Unit = { records.clear(); committed.clear() }
}

object VdmsSink {
  /** foreachBatch body: idempotent-by-batch-id write of a one-column
    * DataFrame of JSON wire records. Records flow executor-side
    * through per-partition connections — the driver never collects
    * the batch. */
  def writeBatch(store: MetadataStore, rpcBatch: Int = 1024)(
      batch: DataFrame, batchId: Long): Unit = {
    if (!store.isCommitted(batchId)) {
      batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = store.connect()
          try rows.grouped(rpcBatch).foreach(g => conn.add(g.map(_.getString(0))))
          finally conn.close()
        }
      }
      store.commit(batchId)
    }
  }
}
