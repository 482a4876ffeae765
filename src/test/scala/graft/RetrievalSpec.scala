package graft

import org.apache.spark.sql.functions._

/** Lexical retrieval (x28/x29), filtered ANN (s16), and the
  * one-pass GIF frame extraction m4/m7 decode through.
  */
class RetrievalSpec extends SparkTestBase {
  import testImplicits._
  import graft.queries.RetrievalQueries
  import graft.operators.Similarity

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x28 bm25: hand-checked scores, non-matching docs excluded") {
    val docs = Seq(
      (1L, "hash hash foo"),
      (2L, "hash bar"),
      (3L, "nope")).toDF("doc_id", "text")
    val rows = RetrievalQueries.bm25(docs, Seq("hash"), topK = 10)
      .select("doc_id", "dl", "n_matched", "score", "rnk")
      .as[(Long, Long, Long, Double, Int)].collect().sortBy(_._1)
    // N=3, total_dl=6, avgdl=2, df=2, idf=ln((3-2+0.5)/2.5+1)=ln(1.6)
    val idf = math.log(1.6)
    def score(tf: Long, dl: Long): Double =
      round6(idf * (tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / 2.0))))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 never matches
    val byDoc = rows.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._4 === score(2, 3))
    assert(byDoc(2L)._4 === score(1, 2))
    // doc 1 (tf=2) outranks doc 2 (tf=1) despite being longer
    assert(byDoc(1L)._5 === 1 && byDoc(2L)._5 === 2)
    assert(byDoc(1L)._3 === 1L && byDoc(2L)._3 === 1L)
  }

  test("x28 bm25: multi-term scores add in sorted-term order") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha alpha"),
      (3L, "beta"),
      (4L, "gamma")).toDF("doc_id", "text")
    val got = RetrievalQueries.bm25(docs, Seq("beta", "alpha"), topK = 10)
      .select("doc_id", "n_matched").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("x29 tfidf: unique terms outrank ubiquitous ones; ln(N/N) = 0") {
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common other"),
      (3L, "common third")).toDF("doc_id", "text")
    val rows = RetrievalQueries.tfidfKeywords(docs, topK = 2)
      .select("doc_id", "term", "tfidf", "rnk")
      .as[(Long, String, Double, Int)].collect()
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._4)
    // "rare": tf=2, df=1 -> 2*ln(3); "common": df=3 -> tfidf 0
    assert(doc1.head._2 === "rare")
    assert(doc1.head._3 === round6(2.0 * math.log(3.0)))
    val common = rows.filter(_._2 == "common")
    assert(common.nonEmpty && common.forall(_._3 === 0.0))
  }

  test("s16 filtered ann: neighbors honor the predicate; nprobe=all " +
    "equals brute force over the filtered corpus") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(8)(rnd.nextGaussian().toFloat)
    val corpus = (0L until 40L).map(i => (i, vec(), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") < 4)
    val cents = corpus.filter(col("vec_id") % 10 === 0)
    val filtered = corpus.filter(col("label") === 2)
    def knnSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rnk").as[(Long, Long, Int)]
        .collect().toSet
    val got = Similarity.knnIvfProbe(filtered, queries, cents,
      k = 3, nprobe = 4)
    // every neighbor passes the predicate
    val labels = got.join(corpus.select(col("vec_id").as("neighbor_id"),
      col("label")), Seq("neighbor_id")).select("label").as[Int].collect()
    assert(labels.nonEmpty && labels.forall(_ == 2))
    // probing every cell over the filtered corpus == brute force on it
    assert(knnSet(got) ===
      knnSet(Similarity.knnBruteForce(filtered, queries, k = 3)))
  }

  test("GIF extractAllFramesRgb equals per-frame extraction") {
    import graft.operators.Codecs.ImageIoCodecs.GifCodec
    val (pr, pg, pb) = (
      Array.tabulate(256)(v => v.toByte),
      Array.tabulate(256)(v => ((v * 37) % 256).toByte),
      Array.tabulate(256)(v => ((v * 91) % 256).toByte))
    val (w, h, nf) = (7, 5, 3)
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h)(i => ((11 + f * 31 + i * 13) % 256).toByte)
    }
    val gif = GifCodec.encodeIndexedFrames(w, h, pr, pg, pb, frames)
    val all = GifCodec.extractAllFramesRgb(gif)
    assert(all.length === nf)
    for (f <- 0 until nf) {
      val (fw, fh, rgb) = GifCodec.extractFrameRgb(gif, f)
      assert((all(f)._1, all(f)._2) === ((fw, fh)))
      assert(all(f)._3.toSeq === rgb.toSeq)
    }
  }

  test("s22 hybridRrf: overlap doc fuses both legs, single-leg docs " +
    "carry the 0 sentinel, RRF order hand-checked") {
    val docs = Seq(
      (1L, "alpha alpha"),          // lex rank 1 (tf=2)
      (2L, "alpha"),                // lex rank 2 AND vec rank 1
      (3L, "other"),                // vec leg only
      (4L, "alpha filler filler"))  // lex rank 3: cut by kLeg=2
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),      // the query embedding
      (1L, Array(0f, 1f, 0f)),      // cos 0: cut
      (2L, Array(1f, 0f, 0f)),      // cos 1      -> vec rank 1
      (3L, Array(1f, 1f, 0f)),      // cos 1/sqrt2 -> vec rank 2
      (4L, Array(0f, 0f, 1f)))      // cos 0: cut
      .toDF("vec_id", "embedding")
    val got = RetrievalQueries.hybridRrf(docs, emb, Seq("alpha"),
      kLeg = 2, kOut = 5)
      .select("doc_id", "lex_rnk", "vec_rnk", "rrf", "rnk")
      .as[(Long, Int, Int, Double, Int)].collect().toSeq
    // doc2 fuses 1/62 + 1/61; doc1 lex-only 1/61; doc3 vec-only 1/62
    assert(got === Seq(
      (2L, 2, 1, round6(1.0 / 62 + 1.0 / 61), 1),
      (1L, 1, 0, round6(1.0 / 61), 2),
      (3L, 0, 2, round6(1.0 / 62), 3)))
  }

  test("s26 mmrDiversify: picks equal an in-memory greedy MMR replay, " +
    "step 1 is pure relevance, no repeats") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.mmrDiversify(emb, queries)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.length === 25)
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        (0 until 64).foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byQ = got.groupBy(_._1)
    (0L until 5L).foreach { q =>
      val rows = byQ(q).sortBy(_._3)
      assert(rows.map(_._3) === (1 to 5).toArray)
      assert(rows.map(_._2).distinct.length === 5)
      // replay the greedy loop
      val rel = vecs.keys.filter(_ != q).map(n =>
        n -> cos(vecs(q), vecs(n))).toMap
      val shortlist = rel.toSeq.sortBy { case (n, r) => (-r, n) }.take(20)
      var sel = List(shortlist.minBy { case (n, r) => (-r, n) })
      (2 to 5).foreach { _ =>
        val cands = shortlist.filterNot(c => sel.exists(_._1 == c._1))
          .map { case (n, r) =>
            val msim = sel.map(s => cos(vecs(n), vecs(s._1))).max
            (n, 0.7 * r - 0.3 * msim)
          }
        sel = sel :+ cands.minBy { case (n, sc) => (-sc, n) }
      }
      rows.zip(sel).foreach { case ((_, gn, _, gm), (en, em)) =>
        assert(gn === en, s"query $q pick")
        assert(math.abs(gm - em) < 2e-6, s"query $q score")
      }
    }
  }

  test("s25 knnRandomProjection: projected distances match a scala " +
    "re-fold, recall vs exact projected L2 is perfect by construction") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Similarity.knnRandomProjection(emb, queries, k = 10)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.length === 50 && got.forall(_._4 >= 0.0))
    // re-fold the projection + distance for every returned pair
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    def proj(x: Array[Float]): Array[Double] =
      Array.tabulate(16) { j =>
        (0 until 64).foldLeft(0.0) { (acc, d) =>
          val sgn = 1 - 2 * ((((j * 64 + d).toLong * 1103515245L + 12345L)
            / 65536L) % 2)
          acc + x(d).toDouble * sgn
        }
      }
    got.foreach { case (q, n, _, dist) =>
      val (pq, pn) = (proj(vecs(q)), proj(vecs(n)))
      val d = (0 until 16).foldLeft(0.0) { (acc, i) =>
        acc + (pq(i) - pn(i)) * (pq(i) - pn(i))
      }
      assert(math.abs(dist - BigDecimal(d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"pair ($q,$n)")
    }
    // ranking is genuinely by projected distance: recompute rank 1
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val pq = proj(vecs(q))
      val best = vecs.keys.filter(_ != q).minBy { n =>
        val pn = proj(vecs(n))
        val d = (0 until 16).foldLeft(0.0) { (acc, i) =>
          acc + (pq(i) - pn(i)) * (pq(i) - pn(i)) }
        (d, n)
      }
      assert(rows.minBy(_._3)._2 === best, s"query $q rank-1")
    }
  }
}
