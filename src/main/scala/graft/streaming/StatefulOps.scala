package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.model.Frame

/** Keyed streaming state (SURVEY.md §2.7 "stateful ops"): the
  * reference keeps unpartitioned in-process counters
  * (`self.num_frames`, `gst-detection-tf.py:127,410`); the engine
  * keys the same state by video so it scales horizontally — each
  * video's counter lives with its shuffle partition, checkpointed
  * with the query.
  */
object StatefulOps {

  final case class VideoProgress(video_id: String, frames_total: Long,
      max_frame_id: Long)

  /** Watermark-bounded streaming dedup via Spark's own
    * `dropDuplicatesWithinWatermark`: exactly-once per key within
    * the watermark horizon, with the dedup state EVICTED once the
    * watermark passes — the bounded-state contract StreamingDedup
    * implements by hand for near-dups, here for exact keys with
    * zero custom state code. The right default for at-least-once
    * upstreams (e.g. a redelivering frame source): duplicates
    * arrive close together, so state stays proportional to the
    * watermark window, not the stream's lifetime key count. */
  def dedupWithinWatermark(frames: Dataset[Frame],
      delay: String): Dataset[Frame] =
    frames.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("video_id", "frame_id")

  /** A1 as keyed streaming state: running per-video frame count +
    * high-water frame id, emitted once per video per micro-batch
    * (update mode). */
  def runningFrameCounts(frames: Dataset[Frame]): Dataset[VideoProgress] = {
    implicit val keyEnc = Encoders.STRING
    implicit val progressEnc = Encoders.product[VideoProgress]
    frames.groupByKey(_.video_id)
      .mapGroupsWithState[VideoProgress, VideoProgress](
        GroupStateTimeout.NoTimeout) {
        (vid: String, it: Iterator[Frame], state: GroupState[VideoProgress]) =>
          val prev = state.getOption.getOrElse(VideoProgress(vid, 0L, -1L))
          var n = prev.frames_total
          var hi = prev.max_frame_id
          it.foreach { f => n += 1; if (f.frame_id > hi) hi = f.frame_id }
          val next = VideoProgress(vid, n, hi)
          state.update(next)
          next
      }
  }
}
