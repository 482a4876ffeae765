package graft

import graft.operators.Codecs
import graft.operators.Codecs.Mp4.PcmFrame

/** Round-12 additions: lazy per-file video decode (one frame in
  * flight), and the index-lifecycle loose ends.
  */
class Round12Spec extends SparkTestBase {

  private def lcgPlanes(w: Int, h: Int, seed: Long): PcmFrame = {
    var s = seed
    def next(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 256).toInt
    }
    PcmFrame(w, h,
      Array.fill(w * h)(next().toByte),
      Array.fill(w * h / 4)(next().toByte),
      Array.fill(w * h / 4)(next().toByte))
  }

  private def mux3(frames: Seq[PcmFrame], w: Int, h: Int): Array[Byte] = {
    val nals = frames.zipWithIndex.map { case (fr, f) =>
      Seq(Codecs.Mp4.buildIdrPcmSlice(fr, frameNum = 0,
        frameNumBits = 4, idrPicId = f))
    }
    Codecs.Mp4.mux(nals, keyframes = (1 to frames.size),
      timescale = 90000, sampleDelta = 3000, width = w, height = h)
  }

  test("decodeIPcmFrames is LAZY: frames materialize one at a time, " +
    "a corrupt later sample is untouched until the walk reaches it") {
    val (w, h) = (16, 16)
    val frames = (0 until 3).map(f => lcgPlanes(w, h, 0xBAD5EEDL + f))
    val mp4 = mux3(frames, w, h)
    // corrupt the THIRD sample's NAL header byte in mdat
    // (nal_unit_type 5 -> 1): an EAGER whole-file decode would throw
    // before yielding anything; the lazy walk must still serve
    // frames 1 and 2 and only fail when asked for frame 3
    val mdat = Codecs.Mp4.boxes(mp4, 0, mp4.length)
      .find(_.fourcc == "mdat").get
    val lenPrefix = 4
    val sampleLens = frames.map(fr =>
      lenPrefix + Codecs.Mp4.buildIdrPcmSlice(fr, frameNum = 0,
        frameNumBits = 4, idrPicId = frames.indexOf(fr)).length)
    val off3 = mdat.off + sampleLens(0) + sampleLens(1) + lenPrefix
    assert((mp4(off3) & 0x1f) === 5)
    mp4(off3) = ((mp4(off3) & 0xe0) | 1).toByte
    val it = Codecs.Mp4.decodeIPcmFrames(mp4)
    val f1 = it.next()
    val f2 = it.next()
    assert(f1.y.toSeq === frames(0).y.toSeq)
    assert(f2.y.toSeq === frames(1).y.toSeq)
    val e = intercept[IllegalArgumentException] { it.next() }
    assert(e.getMessage.contains("IDR"))
  }

  test("IndexedLex.backfill (pipelined tokenize) == sequential " +
    "ingestBatch, and a re-run is a marker-skipped no-op") {
    import org.apache.spark.sql.functions._
    import graft.streaming.IndexedLex
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("ixbf").toString
    val seqIdx = s"$root/seq"; val pipIdx = s"$root/pip"
    val slices = (0L until 3L).map(b =>
      (docs.filter(col("doc_id") % 3 === b), b))
    slices.foreach { case (df, b) =>
      IndexedLex.ingestBatch(spark, seqIdx, df, b)
    }
    IndexedLex.backfill(spark, pipIdx, slices)
    val terms = Seq("hash", "merge", "spark", "window")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val seqServe = canon(IndexedLex.serve(spark, seqIdx, terms))
    val pipServe = canon(IndexedLex.serve(spark, pipIdx, terms))
    assert(seqServe.nonEmpty && pipServe === seqServe)
    // replay: all markers present -> the whole backfill is a no-op
    IndexedLex.backfill(spark, pipIdx, slices)
    assert(canon(IndexedLex.serve(spark, pipIdx, terms)) === seqServe)
  }

  test("nalPayloadIterator matches the eager walk NAL-for-NAL") {
    val (w, h) = (32, 16)
    val frames = (0 until 4).map(f => lcgPlanes(w, h, 0xFEED5L + f))
    val mp4 = mux3(frames, w, h)
    val eager = Codecs.Mp4.nalPayloads(mp4)
    val lazySeq = Codecs.Mp4.nalPayloadIterator(mp4).toSeq
    assert(lazySeq.size === eager.size)
    lazySeq.zip(eager).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }
}
