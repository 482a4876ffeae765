package graft

import org.apache.spark.sql.functions._
import graft.streaming.{IndexedDedup, IndexedLex}

/** Round-13 additions: the two escalation guards the round-12 ledger
  * declared but did not code (tracklet-closure fallback, r76
  * distributed prefix sum), and the crashed-ingest half of the
  * compaction concurrency contract (markerless partitions are
  * excluded from the rebuild and rewritten whole by the replay).
  */
class Round13Spec extends SparkTestBase {
  import testImplicits._

  // ---- escalation guard (a): tracklet closure ----------------------

  test("tracklets escalation: an oversized video routes through the " +
    "distributed CC closure and labels exactly like the in-partition walk") {
    // video "big": a 20-frame chain (one box per frame, same spot) +
    // a singleton on frame 1; video "sm": a 2-frame chain. With
    // maxEdgesPerVideo = 5, "big" (21 boxes) must take the CC path
    // while "sm" keeps the walk.
    val chain = (1 to 20).map(f => ("big", f.toLong, 1L, 0, 0, 10, 10, 9))
    val single = Seq(("big", 1L, 2L, 500, 500, 510, 510, 3))
    val sm = Seq(
      ("sm", 1L, 1L, 0, 0, 10, 10, 9),
      ("sm", 2L, 1L, 1, 0, 11, 10, 9))
    val boxes = (chain ++ single ++ sm)
      .toDF("video_id", "frame_id", "box_ref", "x", "y", "w", "h",
        "label_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val direct = canon(graft.queries.VideoQueries.tracklets(boxes))
    val guarded = canon(graft.queries.VideoQueries.tracklets(boxes,
      maxEdgesPerVideo = 5L))
    assert(direct.size === 23 && guarded === direct)
    // and the labels themselves are right: the 20-box chain shares
    // one id (its frame-1 root), the singletons label themselves
    val got = graft.queries.VideoQueries
      .tracklets(boxes, maxEdgesPerVideo = 5L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    def poly(s: String) =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def node(v: String, f: Long, r: Long) =
      poly(v) * 100000000L + f * 100L + r
    val root = node("big", 1L, 1L)
    (1 to 20).foreach(f => assert(got(("big", f.toLong, 1L)) === root))
    assert(got(("big", 1L, 2L)) === node("big", 1L, 2L))
    assert(got(("sm", 1L, 1L)) === node("sm", 1L, 1L))
    assert(got(("sm", 2L, 1L)) === node("sm", 1L, 1L))
  }

  // ---- escalation guard (b): r76 distributed prefix sum ------------

  test("mannWhitney escalation: the two-phase range-partitioned " +
    "prefix sum equals the single-task window, hand-checked U") {
    val orders = (Seq(1.00, 2.00, 3.00).map(("1-URGENT", _)) ++
      Seq(1.00, 2.50).map(("5-LOW", _)))
      .toDF("o_orderpriority", "o_totalprice")
    val single = graft.queries.Relational6
      .mannWhitney(orders, "1-URGENT", "5-LOW")
      .as[(Long, Long, Long, Long)].head()
    // U_A = ties(1.00)/2 + {2.00>1.00} + {3.00>1.00, 3.00>2.50}
    //     = 0.5 + 1 + 2 = 3.5  ->  u2_a = 7; u2_b = 2*3*2 - 7 = 5
    assert(single === ((3L, 2L, 7L, 5L)))
    // force the escalation: every distinct value is over the limit
    val escalated = graft.queries.Relational6
      .mannWhitney(orders, "1-URGENT", "5-LOW", maxSingleTaskValues = 1L)
      .as[(Long, Long, Long, Long)].head()
    assert(escalated === single)
    // and on real data: same answer both ways over the sf orders
    val t = graft.sources.Tables.orders(spark, sf)
    val a = graft.queries.Relational6.mannWhitney(t, "1-URGENT", "5-LOW")
      .as[(Long, Long, Long, Long)].head()
    val b = graft.queries.Relational6.mannWhitney(t, "1-URGENT", "5-LOW",
      maxSingleTaskValues = 1L).as[(Long, Long, Long, Long)].head()
    assert(a === b)
  }

  // ---- crashed-ingest compaction: lexical index ---------------------

  test("IndexedLex.compact drops a markerless (crashed) batch; the " +
    "replay re-ingests it and serve equals a fresh build") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("ixcr").toString + "/ix"
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    IndexedLex.ingestBatch(spark, idx, b0, 0L)
    IndexedLex.ingestBatch(spark, idx, b1, 1L)
    // simulate a crash AFTER batch 1's sink writes, BEFORE its
    // marker: the data is on disk, the certificate is not
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(idx, "_ingested_1"), false))
    IndexedLex.compact(spark, idx)
    // the uncertified partial is gone from every table (a fold into
    // the rebuild would double-count it against the replay below)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/doclen/ingest_id=1")))
    assert(spark.read.parquet(s"$idx/stats")
      .agg(sum("n_docs")).head().getLong(0) === b0.count())
    // the at-least-once replay re-ingests batch 1 whole
    IndexedLex.ingestBatch(spark, idx, b1, 1L)
    val terms = Seq("hash", "merge", "spark", "window")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val got = canon(IndexedLex.serve(spark, idx, terms))
    val scratch = canon(graft.queries.RetrievalQueries.bm25(
      graft.sources.Tables.documents(spark, sf), terms, topK = 20))
    assert(got.nonEmpty && got === scratch)
    // stats did NOT double-count: compacted row + batch-1 partial
    assert(spark.read.parquet(s"$idx/stats")
      .agg(sum("n_docs")).head().getLong(0) === docs.count())
  }

  // ---- crashed-ingest compaction: near-dup index ---------------------

  test("IndexedDedup.compact drops a markerless batch; crash + " +
    "compact + replay equals compact-then-ingest") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("nddc").toString
    val crashed = s"$root/crashed"; val ref = s"$root/ref"
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    val thr = 0.8
    // crashed path: ingest 0, ingest 1, lose 1's marker, compact,
    // replay 1
    IndexedDedup.ingestBatch(spark, crashed, b0, thr, 0L)
    IndexedDedup.ingestBatch(spark, crashed, b1, thr, 1L)
    val fs = new org.apache.hadoop.fs.Path(crashed)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(crashed, "_ingested_1"), false))
    IndexedDedup.compact(spark, crashed, maxBucket = 4)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$crashed/features/ingest_id=1")))
    IndexedDedup.ingestBatch(spark, crashed, b1, thr, 1L)
    // reference path: the same operation order without the crash
    IndexedDedup.ingestBatch(spark, ref, b0, thr, 0L)
    IndexedDedup.compact(spark, ref, maxBucket = 4)
    IndexedDedup.ingestBatch(spark, ref, b1, thr, 1L)
    def canon(path: String, table: String) =
      spark.read.parquet(s"$path/$table").collect()
        .map(_.toString).sorted.toSeq
    Seq("bands", "features", "verdicts").foreach { t =>
      assert(canon(crashed, t) === canon(ref, t), t)
    }
  }
}
