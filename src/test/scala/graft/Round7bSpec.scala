package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Round-7 continuation specs: range search (s19) and later
  * additions from the same session. */
class Round7bSpec extends SparkTestBase {
  import testImplicits._

  test("s19 range search: probing ALL cells equals brute-force threshold filter") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val cents = emb.filter(col("vec_id") < 8)
    val tau = 0.2
    // nprobe = 8 = every centroid -> blocking loses nothing
    val got = Similarity.rangeSearch(emb, queries, cents, tau, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    val brute = emb.alias("c").join(queries.alias("q"),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        graft.functions.TextFunctions.cosineSim(
          col("q.embedding"), col("c.embedding")).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "tau=0.2 should catch at least one pair at sf0.001")
  }

  test("s19 range search results are a subset of brute force at nprobe=2") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val cents = emb.filter(col("vec_id") < 8)
    val got = Similarity.rangeSearch(emb, queries, cents, 0.2, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSet
    val all = Similarity.rangeSearch(emb, queries, cents, 0.2, nprobe = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.subsetOf(all))
    // every returned cosine respects the bar
    got.foreach { case (_, _, c) => assert(c >= 0.2 - 1e-9) }
  }

  test("r39 plan: top-10 is a TakeOrdered, date predicates reach the scans") {
    val df = graft.queries.Relational3.r39ShippingPriority(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-10 must be per-partition heaps, not a full sort")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("l_shipdate") && optimized.contains("o_orderdate"))
    // rows respect both predicates and the segment
    val rows = df.collect()
    assert(rows.length <= 10)
  }

  test("r40: bilateral pair appears in both directions with broadcast nations") {
    val df = graft.queries.Relational3.r40VolumeShipping(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "nation joins must broadcast")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach { case (s, c) =>
      assert(Set("NATION_1", "NATION_2").contains(s) && s != c)
    }
  }

  test("x38 JSD: identical snapshots diverge 0, disjoint alphabets diverge 1") {
    import graft.queries.CorpusQueries.tokenDrift
    // identical: same text on both sides -> jsd exactly 0
    val same = Seq(("en", true, "a b c a"), ("en", false, "a b c a"))
      .toDF("lang", "is_a", "text")
    val r0 = tokenDrift(same).select("jsd_nano").as[Long].head()
    assert(r0 == 0L)
    // disjoint vocabularies -> jsd exactly 1 (log2 base)
    val disj = Seq(("en", true, "a a b"), ("en", false, "x y y"))
      .toDF("lang", "is_a", "text")
    val r1 = tokenDrift(disj).select("jsd_nano").as[Long].head()
    assert(r1 == 1000000000L, s"got $r1")
    // symmetry: swapping snapshots leaves jsd unchanged
    val ab = Seq(("en", true, "a a b c"), ("en", false, "a b b d"))
      .toDF("lang", "is_a", "text")
    val ba = ab.withColumn("is_a", !col("is_a"))
    assert(tokenDrift(ab).select("jsd_nano").as[Long].head() ==
      tokenDrift(ba).select("jsd_nano").as[Long].head())
    // new/dropped term accounting
    val row = tokenDrift(ab).select("n_new_terms", "n_dropped_terms")
      .as[(Long, Long)].head()
    assert(row == ((1L, 1L)), "d is new, c is dropped")
  }

  test("m12 resample: length contract and interpolation bounds hold per doc") {
    val rows = graft.queries.MediaQueries.m12Resample(spark, sf)
      .as[(Long, Int, Int, Int, Long, Int, Int, Long)].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { case (id, nIn, nOut, rate, _, mn, mx, _) =>
      assert(nOut == 2 * nIn - 1, s"doc $id: 2x upsample minus right edge")
      assert(rate == 16000)
      // interpolated midpoints can never escape the source range
      assert(mn >= -32768 && mx <= 32767)
    }
    // spot-check one doc against a direct recomputation
    val id = rows.head._1
    val n = (64 + id % 97).toInt
    val s = Array.tabulate(n)(i => (((id * 31 + i.toLong * 97) % 65536) - 32768).toInt)
    val exp = (0 until 2 * n - 1).map(i =>
      if (i % 2 == 0) s(i / 2) else (s((i - 1) / 2) + s((i - 1) / 2 + 1)) / 2)
    val got = rows.find(_._1 == id).get
    assert(got._5 == exp.map(_.toLong).sum && got._6 == exp.min && got._7 == exp.max)
  }

  test("g4 clustering coefficient: triangle=1.0, path=0, star center=0") {
    import graft.operators.Graph
    // triangle abc + pendant d on a; star center e with leaves f,g
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L), (5L, 7L))
      .toDF("doc_a", "doc_b")
    val cc = Graph.clusteringCoefficients(pairs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // b and c: deg 2, 1 triangle -> cc = 1.0
    assert(cc(2L)._4 == 1.0 && cc(3L)._4 == 1.0)
    // a: deg 3, 1 triangle -> 2*1/(3*2) = 0.333333
    assert(math.abs(cc(1L)._4 - 0.333333) < 1e-9)
    // pendant d: deg 1 -> 0 by convention
    assert(cc(4L)._4 == 0.0 && cc(4L)._2 == 1)
    // star center e: deg 2, no triangle -> 0
    assert(cc(5L)._4 == 0.0 && cc(5L)._3 == 0)
    assert(cc.size == 7)
  }

  test("d14 chunk dedup: cross-doc drop, within-doc drop, empty doc, rewrite md5") {
    import graft.queries.CorpusQueries
    def md5s(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "a b c d e f"),   // two chunks, both first occurrences
      (2L, "a b c x y"),     // chunk "a b c" duplicates doc 1 -> dropped
      (3L, "p q r p q r"),   // within-doc repeat -> second dropped
      (4L, " ")              // zero tokens -> zero chunks
    ).toDF("doc_id", "text")
    val got = CorpusQueries.chunkDedup(docs, 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, 10L, md5s("a b c d e f"))))
    assert(got(2L) == ((2L, 2L, 1L, 3L, md5s("x y"))))
    assert(got(3L) == ((3L, 2L, 1L, 5L, md5s("p q r"))))
    assert(got(4L) == ((4L, 0L, 0L, 0L, md5s(""))))
  }

  test("s20 knn graph: single cell equals brute-force all-source top-k") {
    val emb = Tables.embeddings(spark, sf)
    // one centroid -> every vector in one cell -> blocking loses nothing
    val got = Similarity.knnGraph(emb, emb.filter(col("vec_id") < 1), k = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    val brute = emb.alias("a").join(emb.alias("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src_id"), col("b.vec_id").as("dst_id"),
        graft.functions.TextFunctions.cosineSim(
          col("a.embedding"), col("b.embedding")).as("cos"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src_id"))
          .orderBy(col("cos").desc, col("dst_id"))))
      .filter(col("rnk") <= 3)
      .select(col("src_id"), col("dst_id"), col("rnk"), round(col("cos"), 6))
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == brute && got.nonEmpty)
    // every source with >= 3 candidates has exactly 3 neighbors
    val counts = got.groupBy(_._1).map(_._2.size).toSet
    assert(counts == Set(3))
  }

  test("s20 knn graph reuses the cell-assignment exchange in the shuffled-join regime") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = Tables.embeddings(spark, sf)
      val df = Similarity.knnGraph(emb, emb.filter(col("vec_id") < 8), k = 3)
      df.collect() // let AQE finalize the plan (stage reuse happens at runtime)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        "identical assignment subplans must share one exchange when neither broadcasts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("r41 top-100 plans as TakeOrderedAndProject; r42 plans a left anti join") {
    val r41 = graft.queries.Relational3.r41LargeOrders(spark, sf)
    assert(r41.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val r42 = graft.queries.Relational3.r42DormantCustomers(spark, sf)
    val p42 = r42.queryExecution.executedPlan.toString
    assert(p42.contains("LeftAnti"))
    // threshold must be integer-exact: no double comparison in the filter
    assert(p42.contains("bal_cents"))
  }

  test("m13 color histogram: per-channel bins sum to the decoded pixel count") {
    val hist = graft.queries.MediaQueries.m13ColorHist(spark, sf)
      .groupBy(col("doc_id"), col("channel"))
      .agg(sum(col("cnt")).as("n"))
      .as[(Long, String, Long)].collect()
    assert(hist.nonEmpty)
    hist.foreach { case (id, _, n) =>
      val expected = (8 + id % 13) * (8 + id % 7)
      assert(n == expected, s"doc $id: $n != $expected")
    }
    // all three channels present per doc
    assert(hist.groupBy(_._1).forall(_._2.map(_._2).toSet == Set("r", "g", "b")))
  }

  test("x39 merged incremental profile equals the direct full-corpus profile") {
    import graft.queries.CorpusQueries
    val docs = Tables.documents(spark, sf)
    val direct = CorpusQueries.mergeableStats(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val merged = CorpusQueries.x39IncrementalProfile(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(merged == direct && direct.nonEmpty)
  }

  test("v9 NMS: kept boxes pairwise below IoU, ranks contiguous, suppression occurs") {
    val rows = graft.queries.VideoQueries.v9Nms(spark, sf)
      .select(col("video_id"), col("frame_id"), col("n_cands"),
        col("nms_rank"), col("x"), col("y"), col("w"), col("h"))
      .as[(String, Long, Int, Int, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    val byFrame = rows.groupBy(r => (r._1, r._2))
    def iouOver(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): Boolean = {
      val ix = math.max(0, math.min(a._3, b._3) - math.max(a._1, b._1))
      val iy = math.max(0, math.min(a._4, b._4) - math.max(a._2, b._2))
      val inter = ix.toLong * iy
      val union = (a._3 - a._1).toLong * (a._4 - a._2) +
        (b._3 - b._1).toLong * (b._4 - b._2) - inter
      20 * inter > 3 * union
    }
    byFrame.foreach { case (_, fr) =>
      val boxes = fr.sortBy(_._4).map(r => (r._5, r._6, r._7, r._8))
      assert(fr.map(_._4).sorted.toSeq == (1 to fr.length), "ranks contiguous")
      assert(fr.length <= fr.head._3, "kept <= candidates")
      for (i <- boxes.indices; j <- 0 until i)
        assert(!iouOver(boxes(j), boxes(i)), "kept boxes must not overlap > 0.15")
    }
    // the corpus must actually exercise suppression somewhere
    assert(byFrame.exists { case (_, fr) => fr.length < fr.head._3 })
  }

  test("x40 served index equals x28 from scratch; postings scan prunes by term") {
    import graft.queries.RetrievalQueries
    val served = RetrievalQueries.x40LexIndexServe(spark, sf)
    val fresh = RetrievalQueries.x28Bm25(spark, sf)
    val s = served.as[(Long, Long, Long, Double, Int)].collect().toSet
    val f = fresh.as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(s == f && s.nonEmpty)
    // the postings read must carry partition filters on term
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("term"),
      "serve path must prune postings directories by query term")
  }

  test("x41 incrementally updated index equals a fresh full build (x40)") {
    import graft.queries.RetrievalQueries
    val updated = RetrievalQueries.x41LexIndexUpdate(spark, sf)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    val rebuilt = RetrievalQueries.x40LexIndexServe(spark, sf)
      .as[(Long, Long, Long, Double, Int)].collect().toSet
    assert(updated == rebuilt && updated.nonEmpty)
  }

  test("g5 assortativity: star is exactly -1, regular graph degenerates to 0") {
    import graft.operators.Graph
    // 3-star: center 0 with leaves 1,2,3 -> perfectly disassortative
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    val s = Graph.degreeAssortativity(star)
      .as[(Long, Long, Long, Double)].head()
    assert(s == ((4L, 3L, 3L, -1.0)))
    // triangle: every degree equal -> zero variance -> 0.0 by contract
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val t = Graph.degreeAssortativity(tri)
      .as[(Long, Long, Long, Double)].head()
    assert(t == ((3L, 3L, 2L, 0.0)))
  }

  test("s21 compacted index answers exactly like s18's tombstone-filtered serve") {
    import graft.queries.LlmQueries
    val compacted = LlmQueries.s21IndexCompact(spark, sf)
      .as[(Long, Long, Int, Double)].collect().toSet
    val softDeleted = LlmQueries.s18IndexDelete(spark, sf)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(compacted == softDeleted && compacted.nonEmpty)
  }

  test("m14 loudness normalization: peak lands at 30000, zero signal passes through") {
    val rows = graft.queries.MediaQueries.m14Normalize(spark, sf)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, maxIn, peakOut, _) =>
      if (maxIn > 0) {
        // integer truncation can land slightly under, never over
        assert(peakOut <= 30000 && peakOut > 29000, s"doc $id peak $peakOut")
      } else assert(peakOut == 0)
    }
  }

  test("asOfLeft keeps unmatched left rows; ties at equal time attribute") {
    import graft.operators.AsOfJoin
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val left = Seq((1L, ts(5), "early"), (1L, ts(20), "late"), (2L, ts(10), "tie"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 100L), (2L, ts(10), 200L))
      .toDF("k", "rt", "rid")
    val got = AsOfJoin.asOfLeft(left, right, "k", "t", "rt")
      .select(col("tag"),
        when(col("asof").isNull, -1L).otherwise(col("asof.rid")).as("rid"))
      .as[(String, Long)].collect().toMap
    // before any right row -> kept with NULL; after -> latest; equal t -> matches
    assert(got == Map("early" -> -1L, "late" -> 100L, "tie" -> 200L))
  }

  test("x42 capstone agrees with its d14 and x37 constituents per source") {
    import graft.queries.CorpusQueries
    val v3 = CorpusQueries.x42CurationV3(spark, sf)
      .select("source", "n_chunks", "n_kept_chunks", "n_flagged")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sf)
    val d14 = CorpusQueries.chunkDedup(Tables.spread(docs), 12)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum("n_chunks").as("c"), sum("n_kept").as("k"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val x37 = CorpusQueries.x37PerplexityFilter(spark, sf)
      .select("source", "n_flagged").as[(String, Long)].collect().toMap
    assert(v3.nonEmpty && v3.keySet == d14.keySet)
    v3.foreach { case (s, (_, c, k, f)) =>
      assert((c, k) == ((d14(s)._2, d14(s)._3)) && f == x37(s), s"source $s")
    }
  }

  test("d14 randomized parity: distributed dedup equals an in-memory reference") {
    import graft.queries.CorpusQueries
    def md5s(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // 5-word vocabulary, short docs -> dense chunk collisions
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (0L until 30L).map { id =>
      val n = rnd.nextInt(21)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // reference: first-seen map over occurrences in (doc, idx) order
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val chunks = toks.grouped(3).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(c => seen.add(c))
      (id, chunks.length.toLong, kept.length.toLong,
        kept.map(_.length.toLong).sum, md5s(kept.mkString(" ")))
    }.toSet
    val got = CorpusQueries.chunkDedup(docs.toDF("doc_id", "text"), 3)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == expected)
  }

  test("r45 plan: top-20 is a TakeOrdered, returnflag and date reach the scans") {
    val df = graft.queries.Relational3.r45ReturnedRevenue(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("l_returnflag") && plan.contains("o_orderdate"))
    assert(df.collect().length <= 20)
  }

  test("m15 downmix: one doc re-derived in memory matches the pipeline row") {
    val rows = graft.queries.MediaQueries.m15Downmix(spark, sf)
      .as[(Long, Int, Int, Long, Int, Int, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._3 == 2))
    val (id, n, _, sum, mn, mx, fp) = rows.head
    def samp(i: Int): Int = (((id * 31 + i.toLong * 97) % 65536) - 32768).toInt
    val mono = (0 until n).map(i => (samp(i) + samp((i + 7) % n)) / 2)
    assert(sum == mono.map(_.toLong).sum && mn == mono.min && mx == mono.max)
    val expFp = mono.foldLeft(0L)((a, v) => (a * 31 + (v + 32768)) % 1000000007L)
    assert(fp == expFp)
  }

  test("x43 approx quantiles respect the GK rank-error bound vs exact ranks") {
    // the query's own certificates must all hold (this is what the
    // oracle gates on: a broken sketch flips ok_* to false)
    val certs = graft.queries.LlmQueries.x43ApproxQuantiles(spark, sf)
      .select("lang", "n_docs", "ok_p50", "ok_p90", "ok_p99")
      .as[(String, Long, Boolean, Boolean, Boolean)].collect()
    assert(certs.nonEmpty)
    certs.foreach { case (lang, n, a, b, c) =>
      assert(a && b && c, s"$lang (n=$n) failed a GK certificate") }
    // and an INDEPENDENT driver-side restatement of the bound, so the
    // certificate arithmetic itself is cross-checked: recompute the
    // sketch values and verify their exact ranks directly
    val approx = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(percentile_approx(col("n_chars"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(100)).as("qs"))
      .select(col("lang"), col("qs").getItem(0), col("qs").getItem(1),
        col("qs").getItem(2))
      .as[(String, Long, Long, Long)].collect()
    val byLang = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (lang, p50, p90, p99) =>
      val xs = byLang(lang); val n = xs.length
      def rankOk(v: Long, q: Double): Unit = {
        val lo = xs.count(_ < v)   // rank window of the value
        val hi = xs.count(_ <= v)
        val target = q * n; val tol = n / 100.0 + 1
        assert(lo - tol <= target && target <= hi + tol,
          s"$lang q=$q v=$v rank [$lo,$hi] target $target")
      }
      rankOk(p50, 0.5); rankOk(p90, 0.9); rankOk(p99, 0.99)
    }
  }

  test("x44 snapshot diff classifies a hand-built fixture exactly") {
    import graft.queries.CorpusQueries
    val a = Seq((1L, "en", "same"), (2L, "en", "old"), (3L, "de", "gone"))
      .toDF("doc_id", "lang", "text")
    val b = Seq((1L, "en", "same"), (2L, "en", "new"), (4L, "de", "fresh"))
      .toDF("doc_id", "lang", "text")
    val got = CorpusQueries.snapshotDiff(a, b)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 1L, 1L, 0L, 0L)))
    assert(got("de") == (("de", 0L, 0L, 1L, 1L)))
  }

  test("s19 plan has no sort and no window (threshold replaces top-k)") {
    val df = graft.queries.LlmQueries.s19RangeSearch(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "range search must not rank")
    assert(!plan.contains("Sort"), s"range search must not sort:\n$plan")
  }
}
