package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TopTokenCount}
import graft.operators.Codecs
import graft.queries.{LlmQueries, Relational2}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Round-6 additions: repetition quality (TopTokenCount), WAV PCM
  * decode, bloom-prefiltered decontamination, semantic dedup, pivot.
  */
class Round6Spec extends SparkTestBase {
  import testImplicits._

  test("top_token_count: empty, ties, dominance, unicode") {
    def arr(ts: String*): ArrayData =
      ArrayData.toArrayData(ts.map(UTF8String.fromString).toArray)
    assert(TopTokenCount.top(arr()) === 0)
    assert(TopTokenCount.top(arr("a", "b", "c")) === 1)
    assert(TopTokenCount.top(arr("a", "b", "a", "b")) === 2)
    assert(TopTokenCount.top(arr("x", "x", "x", "y")) === 3)
    assert(TopTokenCount.top(arr("ü", "ü", "u")) === 2)
    // through the SQL surface (codegen path)
    val got = Seq(Seq("w", "w", "v")).toDF("ts")
      .select(TextFunctions.topTokenCount(col("ts"))).head().getInt(0)
    assert(got === 2)
  }

  test("x14 repetition metrics on a hand-checked doc") {
    val df = Seq((1L, "a a b"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = LlmQueries.repetitionProfile(df)
    assert(out.columns.toSeq === Seq("doc_id", "n_tok", "n_distinct",
      "top_n", "dup_word_frac", "top_word_frac", "dup_bigram_frac"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    val d1 = byId(1L) // "a a b": 3 tokens, 2 distinct, "a" twice
    assert(d1.getInt(1) === 3 && d1.getInt(2) === 2 && d1.getInt(3) === 2)
    assert(d1.getDouble(4) === math.rint(1.0 / 3 * 1e6) / 1e6) // dup_word_frac
    assert(d1.getDouble(5) === math.rint(2.0 / 3 * 1e6) / 1e6) // top_word_frac
    assert(d1.getDouble(6) === 0.0) // bigrams "a a","a b" both distinct
    val d2 = byId(2L) // empty text: all zeros, no NULLs, no division
    assert(d2.getInt(1) === 0 && d2.getInt(3) === 0 && d2.getDouble(4) === 0.0)
    val d3 = byId(3L) // single token: bigram metrics guarded to 0
    assert(d3.getInt(1) === 1 && d3.getDouble(6) === 0.0)
  }

  test("WavCodec.decodePcm16 round-trips arbitrary samples") {
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345)
    val wav = Codecs.WavCodec.encodePcm16(16000, 1, samples)
    val (h, back) = Codecs.WavCodec.decodePcm16(wav)
    assert(h.sampleRate === 16000 && h.channels === 1 && h.bitsPerSample === 16)
    assert(back.toSeq === samples.toSeq)
    // stereo: frames = samples / channels, samples stay interleaved
    val st = Codecs.WavCodec.encodePcm16(8000, 2, samples)
    val (h2, back2) = Codecs.WavCodec.decodePcm16(st)
    assert(h2.channels === 2 && h2.nSampleFrames === 3)
    assert(back2.toSeq === samples.toSeq)
    // truncated data chunk fails loudly
    val cut = java.util.Arrays.copyOf(wav, wav.length - 2)
    val e = intercept[IllegalArgumentException] {
      Codecs.WavCodec.decodePcm16(cut)
    }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("WAV"))
  }

  test("might_contain: bloom built by bloom_filter_agg answers membership") {
    val vals = (1L to 200L).map(i => i * 37)
    val bloom = vals.toDF("v")
      .agg(expr("bloom_filter_agg(xxhash64(v), " +
        "CAST(1000 AS BIGINT), CAST(8000 AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]](0)
    val probe = (vals ++ Seq(999999937L)).toDF("v")
      .select(col("v"), call_function("might_contain",
        lit(bloom), xxhash64(col("v"))).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // no false negatives ever
    vals.foreach(v => assert(probe(v), s"bloom missed member $v"))
  }

  test("x15 bloom decontamination ≡ x13 exact decontamination") {
    val exact = LlmQueries.x13Decontaminate(spark, sf).collect()
      .map(_.toSeq).toSet
    val bloomed = LlmQueries.x15BloomDecontaminate(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(exact.nonEmpty, "fixture should contain contamination")
    assert(bloomed === exact)
  }

  test("d7 semantic dedup: ordered pairs, threshold, cell-consistency") {
    val rows = LlmQueries.d7SemanticDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "pairs must be vec_a < vec_b")
      assert(r.getDouble(3) >= 0.40 - 1e-9)
    }
    // spot-check: every reported pair's members share the reported cell
    val cells = graft.operators.Similarity.assignCells(
      graft.sources.Tables.embeddings(spark, sf),
      graft.sources.Tables.embeddings(spark, sf).filter(col("vec_id") < 8))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(cells(r.getLong(1)) === r.getLong(0))
      assert(cells(r.getLong(2)) === r.getLong(0))
    }
  }

  test("s7 PQ-ADC with a self codebook recovers exact L2 ranking") {
    import org.apache.spark.sql.expressions.Window
    // when every corpus vector is its own codeword, encode assigns
    // each vector to itself (distance 0) and ADC degenerates to the
    // exact asymmetric L2 — the PQ analog of s6's "nprobe=all ==
    // brute force" recovery property
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 100)
    val queries = emb.filter(col("vec_id") < 3)
    val pq = graft.operators.Similarity
      .knnPqAdc(emb, queries, emb, m = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = {
      val joined = emb.alias("c")
        .join(broadcast(queries.alias("q")),
          col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"),
          col("c.vec_id").as("neighbor_id"),
          aggregate(sequence(lit(0), lit(63)), lit(0.0), (acc, d) => {
            val diff =
              element_at(col("q.embedding"), d + 1).cast("double") -
              element_at(col("c.embedding"), d + 1).cast("double")
            acc + diff * diff
          }).as("dist"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("dist").asc, col("neighbor_id"))
      joined.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    assert(pq === exact)
  }

  test("s8 IVF-PQ: one cell + self codebook degenerates to exact L2") {
    // with a single centroid every vector shares one cell, and a
    // self codebook makes ADC exact — so the full composition must
    // reproduce knnPqAdc, which the s7 spec pins to brute-force L2
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 100)
    val queries = emb.filter(col("vec_id") < 3)
    val oneCell = emb.filter(col("vec_id") === 0)
    val composed = graft.operators.Similarity
      .knnIvfPq(emb, queries, oneCell, emb, m = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val flat = graft.operators.Similarity
      .knnPqAdc(emb, queries, emb, m = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(composed === flat)
  }

  test("r25 range window: trailing-1h frame hand-checked") {
    // events at t=0s, 30m, 59m59s, 61m: the 61m row's 1h frame drops
    // the t=0 row (61m - 1h > 0) but keeps 30m and 59m59s
    val t0 = 1700000000000000L // epoch micros
    val us = Seq(0L, 1800L * 1000000, 3599L * 1000000, 3660L * 1000000)
    val ev = us.zipWithIndex.map { case (u, i) =>
      (i.toLong, "click", new java.sql.Timestamp((t0 + u) / 1000), 1.5) }
      .toDF("event_id", "event_type", "ts", "value")
    val rows = Relational2.trailingWindowStats(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // value 1.5 -> 150 cents each, so cents_1h = 150 * n_1h pins the
    // floor(x*100+0.5) derivation too
    assert(rows === Map(0L -> ((1L, 150L)), 1L -> ((2L, 300L)),
      2L -> ((3L, 450L)), 3L -> ((3L, 450L))))
  }

  test("Scrub: PII rules mask email/ip/phone, rule order holds") {
    import graft.operators.Scrub
    // comma after the phone: the phone rule's optional trailer
    // ([ -]?[0-9]{0,4}) would otherwise consume a following space
    val txt = "mail a.b+c@ex.co or 10.0.0.1 call +1 555 0100, now 42"
    val out = Seq(txt).toDF("t")
      .select(Scrub.scrub(col("t"), Scrub.PiiRules :+ Scrub.NumberRule).as("s"),
        Scrub.matchCount(col("t"), Scrub.NumberRule).as("nm"))
      .head()
    assert(out.getString(0) === "mail [EMAIL] or [IP] call [PHONE], now [NUM]")
    // digit runs in the raw text: 10,0,0,1 + 1,555,0100 + 42
    assert(out.getInt(1) === 8)
  }

  test("x16 packStats: hand-checked chunk and boundary accounting") {
    import graft.queries.CorpusQueries
    // one lang, one shard: token counts 4,4,4 at capacity 10 ->
    // cum 4,8,12; doc3 spans the cut at 10 (chunk 0 -> 1)
    val docs = Seq(
      (1L, "en", "a b c d"), (2L, "en", "e f g h"), (3L, "en", "i j k l"))
      .toDF("doc_id", "lang", "text")
    val r = CorpusQueries.packStats(docs, capacity = 10, shards = 1).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(2) === 3L)  // n_docs
    assert(row.getLong(3) === 12L) // total_tokens
    assert(row.getLong(4) === 2L)  // n_chunks
    assert(row.getLong(5) === 1L)  // n_boundary_docs
  }

  test("d8 repeatedNgrams: shared 5-gram found, unique ones filtered") {
    import graft.queries.CorpusQueries
    val boiler = "all rights reserved by example corp"
    val docs = Seq(
      (1L, s"alpha beta $boiler"), (2L, s"$boiler gamma delta"),
      (3L, "nothing shared here at all friends"))
      .toDF("doc_id", "text")
    val rows = CorpusQueries.repeatedNgrams(docs, n = 5, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // the 6-token boilerplate yields two 5-grams, each in docs 1 and 2
    assert(rows.length === 2)
    rows.foreach { case (gram, nDocs, firstDoc) =>
      assert(gram.split(" ").length === 5)
      assert(nDocs === 2L && firstDoc === 1L)
      assert(boiler.contains(gram))
    }
  }

  test("d7 with TRAINED centroids: k-means quantizer plugs into the same API") {
    import graft.operators.{KMeans, Similarity}
    import graft.functions.TextFunctions
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 200)
    val trained = KMeans.train(emb, k = 4, iters = 3)
    val cells = Similarity.assignCells(emb, trained)
    // every vector lands in a trained cell, and within-cell pairing
    // (the d7 shape) produces only ordered same-cell pairs
    assert(cells.filter(col("cell").isNull).count() === 0)
    val a = cells.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = cells.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    val pairs = a.join(b, Seq("cell")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", TextFunctions.cosineSim(col("ea"), col("eb")))
      .filter(col("cos") >= 0.35)
    assert(pairs.filter(col("vec_a") >= col("vec_b")).count() === 0)
    assert(pairs.count() > 0, "trained cells should yield candidate pairs")
  }

  test("codec fuzz: corrupted payloads fail cleanly, never AIOOBE/NPE") {
    import graft.operators.{Codecs, Multimodal}
    // deterministic corruptions of four valid payloads: truncations
    // at every boundary region plus byte flips from a fixed LCG —
    // every malformed input must surface as the codecs' contractual
    // IllegalArgumentException (require), never an index/NPE crash
    val wav = Codecs.WavCodec.encodePcm16(8000, 1,
      Array.tabulate(64)(i => (i * 37 - 1000).toShort))
    val bmp = Codecs.BmpCodec.encodeRgb(9, 7,
      Array.tabulate(9 * 7 * 3)(i => (i * 29).toByte))
    val png = Codecs.ImageIoCodecs.encodeRgb("png", 8, 5,
      Array.tabulate(8 * 5 * 3)(i => (i * 31).toByte))
    val y4m = Codecs.Y4mCodec.encodeRgbFrames(6, 4,
      Seq(Array.tabulate(6 * 4 * 3)(i => (i * 13).toByte)))
    val avi = Codecs.AviMjpegCodec.encodeJpegFrames(8, 6,
      Seq(Codecs.ImageIoCodecs.encodeRgb("jpg", 8, 6,
        Array.tabulate(8 * 6 * 3)(i => (i * 17).toByte))),
      interleaved = true)
    var seed = 123456789L
    def nextInt(bound: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val payloads = Seq("wav" -> wav, "bmp" -> bmp, "png" -> png,
      "y4m" -> y4m, "avi" -> avi)
    for ((name, good) <- payloads) {
      val cuts = Seq(1, 4, 11, good.length / 2, good.length - 1)
      val flips = (1 to 20).map { _ =>
        val b = good.clone(); val at = nextInt(good.length)
        b(at) = (b(at) ^ (1 << nextInt(8))).toByte; b
      }
      for ((bad, i) <- (cuts.map(java.util.Arrays.copyOf(good, _)) ++ flips)
          .zipWithIndex) {
        // decode outside the assertion: the catch must only classify
        // codec exceptions, never swallow a failed assert (or a
        // fatal VM error) into a misleading "leaked" report
        val decoded =
          try Some(Codecs.AutoCodec.decode(
            Multimodal.MediaRecord(i.toLong, "media", bad)))
          catch {
            case _: IllegalArgumentException => None // clean contractual failure
            case scala.util.control.NonFatal(e) =>
              fail(s"$name corruption #$i leaked ${e.getClass.getName}: " +
                s"${e.getMessage}")
          }
        // surviving a flip is fine (payload may still be valid);
        // the decode contract just has to hold
        decoded.foreach(dec => assert(dec.byte_len === bad.length))
      }
    }
  }

  test("connectedComponents: chains merge, islands stay apart, converges") {
    import graft.operators.Components
    // two components: {1,2,3,4} via a chain (1-2, 2-3, 3-4) that
    // pairwise dropping would under-merge, and {10,11}; plus a
    // self-contained edge (20,20)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val got = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // empty edge list → empty labeling, no iteration blow-up
    assert(Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() === 0L)
  }

  test("r24 pivot: cells partition the orders table") {
    val out = Relational2.r24Pivot(spark, sf)
    assert(out.columns.toSeq === Seq("o_orderpriority", "f_n", "f_cents",
      "o_n", "o_cents", "p_n", "p_cents"))
    val rows = out.collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum
    val expected = graft.sources.Tables.orders(spark, sf).count()
    assert(total === expected, "pivoted counts must partition the table")
    // cents are non-negative and zero only alongside a zero count
    rows.foreach { r =>
      Seq((1, 2), (3, 4), (5, 6)).foreach { case (n, c) =>
        if (r.getLong(n) == 0L) assert(r.getLong(c) === 0L)
      }
    }
  }
}
