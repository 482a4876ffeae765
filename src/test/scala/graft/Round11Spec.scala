package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-11 additions: the scatter_moments fold that retired s32's
  * 2080-struct-per-row explode moment pass. */
class Round11Spec extends SparkTestBase {
  import testImplicits._

  /** Seeded LCG so the corpus is deterministic but adversarial:
    * negative components, magnitudes up to the full micro-unit range,
    * and a row count that doesn't divide the partition count. */
  private def randomMicro(rows: Int, dim: Int, seed: Long) = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val data = (1 to rows).map { _ =>
      Seq.fill(dim) {
        val r = next()
        // components in [-1.2e6, 1.2e6] — slightly past the unit
        // lattice to prove the headroom audit
        (Math.floorMod(r, 2400001L) - 1200000L)
      }
    }
    data.toDF("xu").repartition(7)
  }

  test("scatter_moments fold is bit-identical to the explode spelling") {
    val micro = randomMicro(rows = 311, dim = 16, seed = 0xA5F00D11L)
    val (fa, fsx, fn) = Similarity.momentFrames(micro, 16)
    val (ea, esx, en) = Similarity.momentFramesExplode(micro, 16)
    val foldSxy = fa.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getDecimal(2).toBigInteger)).sortBy(t => (t._1, t._2))
    val explSxy = ea.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getDecimal(2).toBigInteger)).sortBy(t => (t._1, t._2))
    assert(foldSxy.length === 16 * 17 / 2)
    assert(foldSxy.toSeq === explSxy.toSeq)
    val foldSx = fsx.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val explSx = esx.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(foldSx.toSeq === explSx.toSeq)
    assert(fn.collect().head.getLong(0) === 311L)
    assert(en.collect().head.getLong(0) === 311L)
  }

  test("scatter_moments matches a driver-side BigInt brute force") {
    val rows = Seq(
      Seq(3L, -5L, 7L),
      Seq(-1000000L, 1000000L, 999999L),
      Seq(0L, 0L, 0L),
      Seq(1200000L, -1200000L, 1L),
      Seq(42L, 17L, -99L))
    val df = rows.toDF("xu").repartition(3)
    val m = df.agg(expr("scatter_moments(xu, 3)").as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sxy")).collect().head
    assert(m.getLong(0) === rows.length.toLong)
    val sx = m.getSeq[Long](1)
    for (d <- 0 until 3)
      assert(sx(d) === rows.map(_(d)).sum, s"sx($d)")
    val sxy = m.getSeq[org.apache.spark.sql.Row](2)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).toBigInteger)).toMap
    for (i <- 0 until 3; j <- i until 3) {
      val want = rows.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      assert(BigInt(sxy((i, j))) === want, s"sxy($i,$j)")
    }
  }

  test("scatter_moments 128-bit accumulators survive low-word carries") {
    // identical rows whose products force the low word past 2^63:
    // p = 1.2e6^2 = 1.44e12 per row; 2^63/1.44e12 ≈ 6.4e6 rows would
    // be needed to carry, so instead stress the carry path directly
    // with the widest lattice values over many rows via merge: the
    // repartition(7) random suite above covers mixed-sign carries;
    // here pin an exact value: 5000 rows of the max product.
    val df = (1 to 5000).map(_ => Seq(1200000L, -1200000L)).toDF("xu")
      .repartition(5)
    val m = df.agg(expr("scatter_moments(xu, 2)").as("m"))
      .select(col("m.sxy")).collect().head
    val sxy = m.getSeq[org.apache.spark.sql.Row](0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).toBigInteger)).toMap
    val p = BigInt(1200000L) * BigInt(1200000L)
    assert(BigInt(sxy((0, 0))) === p * 5000)
    assert(BigInt(sxy((0, 1))) === -p * 5000)
    assert(BigInt(sxy((1, 1))) === p * 5000)
  }

  test("s32 top principal component still produces the full surface") {
    val df = graft.queries.LlmQueries.s32TopPc(spark, sf)
    val rows = df.collect()
    assert(rows.length === 64)
    // the seed direction is all-ones micro; after 2 iterations the
    // leading share must be a sane ppm value
    assert(rows.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 1000000L))
  }

  test("x68 held-out BPE apply: counts bounded by words and characters") {
    import graft.queries.CorpusQueries
    import graft.functions.TextFunctions
    val out = CorpusQueries.x68BpeApplyHeldout(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.nonEmpty)
    // reference word/char counts straight off the held-out docs
    val refRows = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("nw"),
        aggregate(transform(col("ts"), t => length(t).cast("long")),
          lit(0L), (a, b) => a + b).as("nc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    refRows.filter(_._2._1 > 0).foreach { case (id, (nw, nc)) =>
      val (gw, gt) = out(id)
      assert(gw === nw, s"doc $id word count")
      // each word tokenizes to between 1 (fully merged) and its
      // character count (no merges apply) tokens
      assert(gt >= nw && gt <= nc, s"doc $id token bound: $gt vs [$nw,$nc]")
    }
    // 3 learned merges must actually fire somewhere on held-out text
    assert(out.values.map(_._2).sum <
      refRows.filter(r => out.contains(r._1)).values.map(_._2).sum)
  }

  test("m28 NAL histogram agrees with m27's walk totals") {
    import graft.queries.MediaQueries
    val h = MediaQueries.m28NalHistogram(spark, sf).collect()
    val m27 = MediaQueries.m27Mp4Index(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap // doc_id -> n_nals
    val perDoc = h.groupBy(_.getLong(0))
    assert(perDoc.keySet === m27.keySet)
    perDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getLong(2)).sum === m27(id).toLong,
        s"doc $id NAL total")
      // per-doc stats identical across that doc's histogram rows
      assert(rows.map(_.getLong(3)).distinct.length === 1)
      assert(rows.map(_.getLong(4)).distinct.length === 1)
      assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 31))
    }
  }
}
