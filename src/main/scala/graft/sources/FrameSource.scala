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

  /** binaryFile's fixed schema, declared (file streaming sources
    * need an explicit schema). */
  private val binaryFileSchema = StructType.fromDDL(
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")

  /** S1+S2 fused on REAL VIDEO FILES: watch a directory of MP4s as a
    * stream (the reference's `filesrc location=*.mp4` shape,
    * `run.sh:53`), decode each arriving container to pixels — the
    * full hop: box walk → avcC SPS → NAL walk → I_PCM slice parse →
    * planar YUV → BT.601 RGB — and emit the same `Frame` rows the
    * detection pipeline consumes. `maxFilesPerTrigger` is the
    * backpressure knob (whole files are the admission unit, exactly
    * the decode/inference decoupling queue's role).
    *
    * 100 TB shape: decode is partition-local per FILE (bytes never
    * shuffle; frames explode inside the map), so executor count
    * scales ingest linearly — the distributed `decodebin` fan-out.
    * The decode itself is LAZY (the GOP iterator walks the stsc/
    * stco/stsz sample tables incrementally), so the flatMap holds
    * one decoded picture plus one reference in flight, not the whole
    * file's pictures — the admission unit is the file's COMPRESSED
    * bytes (binaryFile materializes each file's content column per
    * row; cap file size upstream if sources can exceed executor
    * memory). Since round 14 the source rides the FULL decode
    * envelope — every intra rung (I_PCM, CAVLC I_16x16/I_4x4 with
    * chroma, deblocking) AND P slices with quarter-pel motion
    * (Inter.decodeGopFrames' one-reference DPB is per-task state);
    * anything outside refuses loudly by class, never silently
    * garbled. */
  def videoFileStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 2): Dataset[Frame] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.operators.Codecs
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.mp4")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("modificationTime"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (p, mt, bytes) =>
        // binaryFile's path column is URI-formatted — decode it so a
        // filename with spaces/non-ASCII yields its user-facing name,
        // not a percent-encoded video_id
        val decoded = try new java.net.URI(p).getPath catch {
          case _: java.net.URISyntaxException => p
        }
        val vid = decoded.substring(decoded.lastIndexOf('/') + 1)
        graft.operators.Inter.decodeGopFrames(bytes).zipWithIndex.map {
          case (f, i) =>
            val planes = f.y ++ f.cb ++ f.cr
            Frame(vid, i.toLong, mt, f.height, f.width,
              Codecs.Y4mCodec.yuv420ToRgb(planes, 0, f.width, f.height))
        }
      }
  }
}
