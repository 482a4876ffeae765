package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.queries.{CorpusQueries, MediaQueries, Relational6}
import graft.operators.Graph

/** Round-11 additions, part 2: the nonparametric statistics trio
  * (r76 Mann-Whitney, r77 Kendall, r78 Benford), the rich-club
  * curve (g17), tokenizer fertility (x70), and the PCM clipping
  * audit (m31). Every test cross-checks the distributed plan against
  * an independent driver-side brute force on the same data.
  */
class Round11bSpec extends SparkTestBase {
  import testImplicits._

  private def ordersDf(rows: Seq[(Long, String, Double)]) =
    rows.toDF("o_custkey", "o_orderpriority", "o_totalprice")
      .withColumn("o_orderkey", col("o_custkey"))

  test("r76 Mann-Whitney u2 matches the quadratic brute force, ties included") {
    // values engineered with cross-group ties (30.00 appears in both)
    val a = Seq(10.00, 30.00, 30.00, 55.10, 99.99)
    val b = Seq(5.00, 30.00, 42.42, 55.10)
    val rows = a.map(v => (1L, "1-URGENT", v)) ++
      b.map(v => (2L, "5-LOW", v)) ++
      Seq((3L, "3-MEDIUM", 77.77)) // excluded priority must not count
    val out = Relational6.mannWhitney(ordersDf(rows), "1-URGENT", "5-LOW")
      .collect().head
    val ac = a.map(v => math.floor(v * 100).toLong)
    val bc = b.map(v => math.floor(v * 100).toLong)
    val u2 = (for (x <- ac; y <- bc) yield {
      if (x > y) 2L else if (x == y) 1L else 0L
    }).sum
    assert(out.getAs[Long]("n_a") === a.length.toLong)
    assert(out.getAs[Long]("n_b") === b.length.toLong)
    assert(out.getAs[Long]("u2_a") === u2)
    assert(out.getAs[Long]("u2_b") ===
      2L * a.length * b.length - u2)
  }

  test("r77 Kendall tallies match the brute force; sign-split division is floor-free") {
    // one strictly increasing series (tau = +1), one with a tie and a
    // reversal so nc - nd goes NEGATIVE and the sign split is exercised
    def ev(ty: String, day: Int, v: Double) =
      (ty, Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), v, 1L, s"$ty$day")
    val rows =
      (0 until 4).map(d => ev("up", d, 10.0 * (d + 1))) ++
        Seq(ev("dn", 0, 90.0), ev("dn", 1, 50.0), ev("dn", 2, 50.0),
          ev("dn", 3, 10.0))
    val df = rows.toDF("event_type", "ts", "value", "user_id", "event_id")
    val out = Relational6.kendallDaily(df).collect()
      .map(r => r.getString(0) -> r).toMap
    def brute(ys: Seq[Long]): (Long, Long, Long) = {
      val ps = for (i <- ys.indices; j <- ys.indices if i < j)
        yield math.signum(ys(j) - ys(i)).toLong
      (ps.count(_ == 1L).toLong, ps.count(_ == -1L).toLong,
        ps.count(_ == 0L).toLong)
    }
    val (ncU, ndU, ntU) = brute(Seq(1000L, 2000L, 3000L, 4000L))
    assert(out("up").getAs[Long]("nc") === ncU)
    assert(out("up").getAs[Long]("tau_a_ppm") === 1000000L)
    val ysD = Seq(9000L, 5000L, 5000L, 1000L)
    val (ncD, ndD, ntD) = brute(ysD)
    assert(out("dn").getAs[Long]("nc") === ncD)
    assert(out("dn").getAs[Long]("nd") === ndD)
    assert(out("dn").getAs[Long]("n_ties") === ntD)
    val nPairs = out("dn").getAs[Long]("n_pairs")
    assert(nPairs === ncD + ndD + ntD)
    val expected = math.signum(ncD - ndD) *
      (math.abs(ncD - ndD) * 1000000L / nPairs)
    assert(out("dn").getAs[Long]("tau_a_ppm") === expected)
    assert(out("dn").getAs[Long]("tau_a_ppm") < 0L)
  }

  test("r78 Benford digits, shares, and deviations match the brute force") {
    // amounts covering every leading digit incl. multi-occurrence
    val cents = Seq(101L, 123L, 2000L, 2999L, 30000L, 4L, 5L, 60L,
      70L, 80L, 90L, 95L)
    val rows = cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, "1-URGENT", c / 100.0 + 1e-9) } // +eps: floor-safe
    val out = Relational6.benford(ordersDf(rows)).collect()
      .map(r => r.getAs[Long]("digit") -> r).toMap
    val digits = cents.map(_.toString.head.asDigit.toLong)
    val byD = digits.groupBy(identity).view.mapValues(_.length.toLong)
    val total = digits.length.toLong
    val exp = Map(1L -> 301029L, 2L -> 176091L, 3L -> 124938L,
      4L -> 96910L, 5L -> 79181L, 6L -> 66946L, 7L -> 57991L,
      8L -> 51152L, 9L -> 45757L)
    assert(out.keySet === byD.keys.toSet)
    for ((d, n) <- byD) {
      assert(out(d).getAs[Long]("n") === n)
      val obs = n * 1000000L / total
      assert(out(d).getAs[Long]("obs_ppm") === obs)
      assert(out(d).getAs[Long]("exp_ppm") === exp(d))
      assert(out(d).getAs[Long]("dev_ppm") === math.abs(obs - exp(d)))
    }
  }

  test("g17 rich-club curve matches the brute force on a hub clique + leaves") {
    // 4-clique of hubs {1,2,3,4} (degree 3 + leaves), node 1..4 each
    // with one leaf (10x) — so k=3 keeps only the clique
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val leaves = (1L to 4L).map(i => (i, 10L + i))
    val pairs = (clique ++ leaves).toDF("doc_a", "doc_b")
    val out = Graph.richClub(pairs, Seq(1, 2, 3, 4))
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    // degrees: hubs 4 (3 clique + 1 leaf), leaves 1
    assert(out(1L).getAs[Long]("n_nodes") === 4L) // hubs only
    assert(out(1L).getAs[Long]("n_edges") === 6L) // the clique
    assert(out(1L).getAs[Long]("phi_ppm") === 1000000L) // complete
    assert(out(3L).getAs[Long]("n_nodes") === 4L)
    assert(out(3L).getAs[Long]("phi_ppm") === 1000000L)
    assert(!out.contains(4L))
  }

  test("m31 clipping audit agrees with a driver-side restatement of the fixture") {
    val out = MediaQueries.m31ClippingAudit(spark, sf).collect()
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (64 + id % 97).toInt
      val pcm = Array.tabulate(n) { i =>
        val base = ((id * 31 + i.toLong * 97) % 65536) - 32768
        math.max(-32768L, math.min(32767L, 2L * base)).toInt
      }
      def clipped(s: Int) = s == 32767 || s == -32768
      var run = 0; var maxRun = 0
      pcm.foreach { s =>
        if (clipped(s)) { run += 1; maxRun = math.max(maxRun, run) }
        else run = 0
      }
      assert(r.getAs[Int]("n_samples") === n)
      assert(r.getAs[Int]("n_clipped") === pcm.count(clipped))
      assert(r.getAs[Long]("dc_sum") === pcm.map(_.toLong).sum)
      assert(r.getAs[Int]("peak") === pcm.map(math.abs).max)
      assert(r.getAs[Int]("max_clip_run") === maxRun)
    }
    // the fixture must actually exercise the audit: real clipping, in runs
    assert(out.exists(_.getAs[Int]("max_clip_run") >= 2))
  }

  test("r79 runs test: run count, tallies and expectation match the brute force") {
    def ev(ty: String, day: Int, v: Double) =
      (ty, Timestamp.valueOf(f"2024-02-${day + 1}%02d 09:00:00"), v, 1L, s"$ty$day")
    // series: +,+,-,0,+,- → zeros drop → signs [+,+,-,+,-] → 4 runs
    val vals = Seq(10.0, 20.0, 30.0, 25.0, 25.0, 40.0, 5.0)
    val rows = vals.zipWithIndex.map { case (v, d) => ev("s", d, v) }
    val df = rows.toDF("event_type", "ts", "value", "user_id", "event_id")
    val out = Relational6.runsTest(df).collect().head
    assert(out.getAs[Long]("n_plus") === 3L)
    assert(out.getAs[Long]("n_minus") === 2L)
    assert(out.getAs[Long]("n_runs") === 4L)
    // E[R] = 1 + 2*3*2/5 = 3.4 → 3400000 ppm
    assert(out.getAs[Long]("expected_r_ppm") === 3400000L)
  }

  test("m32 seek plan: stss round-trip drives sync choice; discard bounded by GOP") {
    val out = MediaQueries.m32SeekPlan(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Int]("n_samples")
      val s = r.getAs[Int]("seek_sample")
      val kf = r.getAs[Int]("start_sync")
      assert(s >= 1 && s <= n)
      assert(kf <= s && (kf - 1) % 3 === 0) // sync samples are 1,4,7,…
      assert(r.getAs[Int]("n_discard") === s - kf)
      assert(r.getAs[Int]("n_discard") < 3) // never more than one GOP
      assert(r.getAs[Long]("bitrate_bps") > 0L)
    }
    // mid-stream target must sometimes land off a sync sample,
    // or the discard path is untested
    assert(out.exists(_.getAs[Int]("n_discard") > 0))
  }

  test("s33 norm audit: buckets partition the corpus; saturation only past |x| >= 1") {
    import graft.queries.LlmQueries
    val out = LlmQueries.s33NormAudit(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(out.map(_.getAs[Long]("n_vecs")).sum === emb.count())
    out.foreach { r =>
      val d = r.getAs[Int]("norm2_digits")
      val lo = r.getAs[Long]("min_norm2"); val hi = r.getAs[Long]("max_norm2")
      assert(lo <= hi)
      assert(lo.toString.length === d && hi.toString.length === d)
    }
    // driver-side brute force on a few vectors
    val some = emb.limit(5).collect()
    some.foreach { row =>
      val q = row.getSeq[Float](row.fieldIndex("embedding"))
        .map(x => math.floor(x * 1000000.0 + 0.5).toLong)
      val n2 = q.map(x => x * x).sum
      val digits = n2.toString.length
      val b = out.find(_.getAs[Int]("norm2_digits") == digits)
      assert(b.isDefined, s"vector norm2 $n2 has no bucket")
      assert(b.get.getAs[Long]("min_norm2") <= n2 &&
        n2 <= b.get.getAs[Long]("max_norm2"))
    }
  }

  test("r80 difference-in-differences matches the hand-computed lift") {
    import graft.queries.Relational6
    def t(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // treated (PROMO part 1): mean 10.00 before, 14.00 after (+4.00)
    // control (part 2):       mean 20.00 before, 21.00 after (+1.00)
    // DiD = 4.00 - 1.00 = 3.00 → 3_000_000 micro-cents... (300 cents
    // → 300_000_000 micro) — means are in MICRO-CENTS
    val li = Seq(
      (1L, t("1997-05-01"), 10.00, 0.0), (1L, t("1997-06-01"), 10.00, 0.0),
      (1L, t("1998-05-01"), 14.00, 0.0),
      (2L, t("1997-05-01"), 20.00, 0.0),
      (2L, t("1998-05-01"), 22.00, 0.0), (2L, t("1998-06-01"), 20.00, 0.0)
    ).toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val parts = Seq((1L, "PROMO"), (2L, "SMALL")).toDF("p_partkey", "p_type")
    val out = Relational6.promoDid(li, parts, "1998-01-01").collect().head
    assert(out.getAs[Long]("t1_n") === 2L)
    assert(out.getAs[Long]("t2_n") === 1L)
    assert(out.getAs[Long]("c1_n") === 1L)
    assert(out.getAs[Long]("c2_n") === 2L)
    assert(out.getAs[Long]("t1_mean") === 1000L * 1000000L)
    assert(out.getAs[Long]("t2_mean") === 1400L * 1000000L)
    assert(out.getAs[Long]("c1_mean") === 2000L * 1000000L)
    assert(out.getAs[Long]("c2_mean") === 2100L * 1000000L)
    // (1400-1000) - (2100-2000) = 300 cents lift
    assert(out.getAs[Long]("did_micro_cents") === 300L * 1000000L)
  }

  test("v17 dwell reconciles with v16's tracklets; zones bounded by boxes") {
    import graft.queries.VideoQueries
    val dwell = VideoQueries.v17TrackletDwell(spark, sf).collect()
    val tl = VideoQueries.v16Tracklets(spark, sf).collect()
      .groupBy(r => (r.getAs[String]("video_id"), r.getAs[Long]("tracklet_id")))
    assert(dwell.map(_.getAs[Long]("n_boxes")).sum === tl.values.map(_.length.toLong).sum)
    dwell.foreach { r =>
      val key = (r.getAs[String]("video_id"), r.getAs[Long]("tracklet_id"))
      val members = tl(key)
      assert(r.getAs[Long]("n_boxes") === members.length.toLong)
      val frames = members.map(_.getAs[Long]("frame_id"))
      assert(r.getAs[Long]("first_frame") === frames.min)
      assert(r.getAs[Long]("last_frame") === frames.max)
      val nz = r.getAs[Long]("n_zones")
      assert(nz >= 1L && nz <= math.min(members.length.toLong, 16L))
    }
    // the report must contain real multi-zone tracks, or the zone
    // column is vacuous
    assert(dwell.exists(_.getAs[Long]("n_zones") > 1L))
  }

  test("s34 PQ distortion matches a driver-side argmin + fold brute force") {
    import graft.operators.Similarity
    // dim 4, m 2 (sub 2), 3 codewords; vectors engineered so one
    // subspace has a tie (equal distance to codewords 0 and 1) and
    // the other a clear winner
    val cb = Seq(
      (0L, Seq(0f, 0f, 10f, 10f)),
      (1L, Seq(2f, 0f, 0f, 0f)),
      (2L, Seq(9f, 9f, 9f, 9f))
    ).toDF("vec_id", "embedding")
    val vecs = Seq(
      (10L, Seq(1f, 0f, 9f, 9f)),   // ms0: tie cw0/cw1 (d=1) -> cw0
      (11L, Seq(8f, 8f, 0.5f, 0f))  // ms0: cw2, ms1: cw1
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqDistortion(vecs, cb, m = 2, dim = 4)
      .collect().map(r => r.getAs[Int]("subspace") -> r).toMap
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val cws = Map(0 -> Seq(0f, 0f, 10f, 10f), 1 -> Seq(2f, 0f, 0f, 0f),
      2 -> Seq(9f, 9f, 9f, 9f))
    val vs = Map(10L -> Seq(1f, 0f, 9f, 9f), 11L -> Seq(8f, 8f, 0.5f, 0f))
    for (ms <- 0 to 1) {
      val errs = vs.values.map { v =>
        val sv = v.slice(ms * 2, ms * 2 + 2)
        val best = (0 to 2).map(j =>
          (l2(sv, cws(j).slice(ms * 2, ms * 2 + 2)), j)).min
        math.floor(best._1 * 1000000.0).toLong
      }.toSeq
      val r = out(ms)
      assert(r.getAs[Long]("n_vecs") === 2L)
      assert(r.getAs[Long]("total_err_micro") === errs.sum)
      assert(r.getAs[Long]("max_err_micro") === errs.max)
      assert(r.getAs[Long]("mean_err_micro") === errs.sum / 2)
    }
  }

  test("x70 fertility: per-language sums reconcile with x68 and fertility >= 1e6") {
    val x70 = CorpusQueries.x70TokenFertility(spark, sf).collect()
    val x68 = CorpusQueries.x68BpeApplyHeldout(spark, sf)
      .agg(sum("n_words"), sum("n_tokens")).collect().head
    assert(x70.map(_.getAs[Long]("n_words")).sum === x68.getLong(0))
    assert(x70.map(_.getAs[Long]("n_tokens")).sum === x68.getLong(1))
    x70.foreach { r =>
      // BPE merging only ever joins characters: token count per word
      // is >= 1, so fertility (tokens per word) is >= 1.0
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("fertility_ppm") >= 1000000L)
      val expected = (BigInt(r.getAs[Long]("n_tokens")) * 1000000 /
        BigInt(r.getAs[Long]("n_words"))).toLong
      assert(r.getAs[Long]("fertility_ppm") === expected)
    }
  }
}
