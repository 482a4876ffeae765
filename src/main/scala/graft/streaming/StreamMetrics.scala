package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

/** P14/A3/S10: the reference's per-stage metrics map
  * (`gst-detection-tf.py:75-91,96-105,426-433`) re-expressed with
  * Spark's native observability: `observe()` metrics surface in each
  * StreamingQueryProgress, and the fps-display numbers (S5,
  * `run.sh:34-37`) are the progress' processedRowsPerSecond — no
  * hand-rolled timers in the data path.
  */
class ObservedMetricsListener extends StreamingQueryListener {
  /** observation name -> (metric name -> value), latest batch wins */
  private val observed = new ConcurrentHashMap[String, Map[String, Any]]()
  /** batchId -> processed rows/sec (the fps display analog) */
  private val rates = new ConcurrentHashMap[Long, Double]()
  @volatile private var rowsTotal = 0L

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.observedMetrics.asScala.foreach { case (name, row) =>
      observed.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
    }
    rates.put(p.batchId, p.processedRowsPerSecond)
    rowsTotal += p.numInputRows
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def metric(observation: String, name: String): Option[Any] =
    Option(observed.get(observation)).flatMap(_.get(name))
  def totalInputRows: Long = rowsTotal
  def fps: Map[Long, Double] = rates.asScala.toMap
}
