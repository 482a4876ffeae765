package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.Frame

/** S1/S3: the frame-stream source and its schema contract.
  *
  * S1 (filesrc): a directory of frame-metadata parquet becomes a
  * bounded or unbounded stream — `readStream` watches the directory
  * like the reference's filesrc reads its file, with
  * `maxFilesPerTrigger` as the backpressure knob (the `queue`
  * element's role, `run.sh:53`).
  *
  * S3 (caps negotiation): the declared Frame StructType is the
  * exchange contract; `conform` is the caps filter — it fails fast
  * on missing/mistyped columns instead of letting a bad schema flow
  * downstream (`gst-detection-tf.py:50-59,243-247`).
  */
object FrameSource {
  val frameSchema: StructType = Encoders.product[Frame].schema

  /** Caps-filter: assert + project a DataFrame onto the Frame
    * contract (names present, types cast-compatible, declared
    * order). Throws IllegalArgumentException on a contract breach. */
  def conform(df: DataFrame): Dataset[Frame] = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = frameSchema.fields.filter(f => !have.contains(f.name))
    require(missing.isEmpty,
      s"frame stream missing columns: ${missing.map(_.name).mkString(", ")}")
    import org.apache.spark.sql.functions.col
    df.select(frameSchema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
      .as[Frame](Encoders.product[Frame])
  }

  /** Batch read of a frame table. */
  def frames(spark: SparkSession, path: String): Dataset[Frame] =
    conform(spark.read.schema(frameSchema).parquet(path))

  /** Streaming read of a frame directory; `maxFilesPerTrigger`
    * bounds each micro-batch (backpressure). */
  def frameStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 4): Dataset[Frame] =
    conform(spark.readStream
      .schema(frameSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path))
}
