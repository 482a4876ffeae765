package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Scrub
import graft.sources.Tables

/** Round-5 corpus-curation operators — the remaining first-class
  * steps of a large-scale training-data pipeline beyond dedup (d1–d6)
  * and quality scoring (x1): repetition-based quality signals,
  * corpus-level repeated-sequence detection, sequence packing into
  * fixed context windows, and pattern scrubbing/PII masking. Each
  * has an exact DuckDB oracle (LlmQueries parity rules: integer
  * arithmetic, guarded divisions, round(...,6) at the edge only).
  */
object CorpusQueries {
  import LlmQueries.{polySql, tsSql}

  // ---- x14: repetition quality signals ----------------------------

  /** x14: per-document repetition signals (the Gopher-style quality
    * gates a corpus filter runs besides x1's length/stopword
    * ratios): top-word fraction, distinct-word ratio via sorted-run
    * counting, and duplicate-2-gram fraction. ENTIRELY row-local —
    * the mode of the token multiset is computed by sorting the token
    * array and taking the longest run (O(n log n) per doc, no
    * explode, no shuffle), so at 100 TB this is a narrow projection
    * folded into the document scan. */
  def repetitionStats(docsIn: DataFrame): DataFrame = {
    import TextFunctions.bind
    val zero = struct(lit(0).as("n_tokens"), lit(0).as("n_distinct"),
      lit(0).as("top_n"), lit(0).as("n_2grams"), lit(0).as("nd_2grams"))
    val m = bind(TextFunctions.tokens(col("text")), ts =>
      bind(array_sort(ts), s => bind(size(s), n =>
        when(n === 0, zero).otherwise {
          // run starts in the sorted array + terminal sentinel n+1;
          // greatest(i-1, 1) keeps the lookback in bounds at i=1
          // (the i===1 disjunct already owns that row)
          val starts = concat(
            filter(sequence(lit(1), n), i => (i === lit(1)) ||
              (element_at(s, i) =!= element_at(s, greatest(i - 1, lit(1))))),
            array(n + 1))
          bind(starts, bs => {
            val runs = transform(sequence(lit(1), size(bs) - 1),
              j => element_at(bs, j + 1) - element_at(bs, j))
            val nd2 = size(array_distinct(transform(sequence(lit(1), n - 1),
              i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1)))))
            struct(n.as("n_tokens"), (size(bs) - 1).as("n_distinct"),
              array_max(runs).as("top_n"),
              when(n >= 2, n - 1).otherwise(0).as("n_2grams"),
              when(n >= 2, nd2).otherwise(0).as("nd_2grams"))
          })
        })))
    docsIn.select(col("doc_id"), m.as("m"))
      .select(col("doc_id"), col("m.n_tokens").as("n_tokens"),
        col("m.n_distinct").as("n_distinct"), col("m.top_n").as("top_n"),
        col("m.n_2grams").as("n_2grams"), col("m.nd_2grams").as("nd_2grams"))
      .withColumn("top_word_ratio", when(col("n_tokens") === 0, 0.0)
        .otherwise(round(col("top_n").cast("double") / col("n_tokens"), 6)))
      .withColumn("dup_2gram_ratio", when(col("n_2grams") === 0, 0.0)
        .otherwise(round((col("n_2grams") - col("nd_2grams")).cast("double")
          / col("n_2grams"), 6)))
  }

  def x14Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionStats(Tables.documents(spark, dir))

  val x14Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |s AS (SELECT doc_id, ts, list_sort(ts) AS ss,
       |    CAST(len(ts) AS INT) AS n FROM t),
       |b AS (SELECT doc_id, ts, ss, n,
       |    list_concat(list_filter(range(1, n + 1),
       |        i -> i = 1 OR ss[i] <> ss[greatest(i - 1, 1)]),
       |      [CAST(n + 1 AS BIGINT)]) AS bs
       |  FROM s),
       |m AS (SELECT doc_id, n AS n_tokens,
       |    CASE WHEN n = 0 THEN 0 ELSE CAST(len(bs) - 1 AS INT) END
       |      AS n_distinct,
       |    CASE WHEN n = 0 THEN 0 ELSE CAST(list_max(
       |      list_transform(range(1, len(bs)), j -> bs[j + 1] - bs[j]))
       |      AS INT) END AS top_n,
       |    CASE WHEN n >= 2 THEN n - 1 ELSE 0 END AS n_2grams,
       |    CASE WHEN n >= 2 THEN CAST(len(list_distinct(
       |      list_transform(range(1, n), i -> ts[i] || ' ' || ts[i + 1])))
       |      AS INT) ELSE 0 END AS nd_2grams
       |  FROM b)
       |SELECT doc_id, n_tokens, n_distinct, top_n, n_2grams, nd_2grams,
       |  CASE WHEN n_tokens = 0 THEN 0.0 ELSE
       |    round(CAST(top_n AS DOUBLE) / n_tokens, 6) END AS top_word_ratio,
       |  CASE WHEN n_2grams = 0 THEN 0.0 ELSE
       |    round(CAST(n_2grams - nd_2grams AS DOUBLE) / n_2grams, 6) END
       |    AS dup_2gram_ratio
       |FROM m""".stripMargin

  // ---- d7: corpus-level repeated n-gram detection -----------------

  /** d7: repeated word-5-gram detection across the corpus — the
    * "dedup exact repeated sequences" operator (the intra-corpus
    * repetition that near-dup pair finding d2/d4/d6 doesn't see:
    * boilerplate phrases shared by otherwise-different documents).
    * Plan: one scan → row-local gram explode → TWO-LEVEL hash agg
    * ((gram, doc) then gram — both get map-side partial aggregation,
    * and no count-distinct Expand ever materializes), so the shuffle
    * carries one row per distinct (gram, doc), not one per token.
    * At 100 TB the gram key would be poly-hashed to 8 bytes before
    * the exchange; here the gram text itself is the key so the
    * output names the offending phrases. */
  def repeatedNgrams(docsIn: DataFrame, n: Int, minDocs: Int): DataFrame = {
    import TextFunctions.bind
    val grams = docsIn
      .select(col("doc_id"), bind(TextFunctions.tokens(col("text")), ts =>
        when(size(ts) >= n,
          transform(sequence(lit(1), size(ts) - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*)))
          .otherwise(array().cast("array<string>"))).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("gram"))
    grams.groupBy(col("gram"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  def d7RepeatedNgrams(spark: SparkSession, dir: String): DataFrame =
    repeatedNgrams(Tables.documents(spark, dir), n = 5, minDocs = 2)

  val d7Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |g AS (SELECT doc_id, array_to_string(ts[i:i + 4], ' ') AS gram
       |  FROM t, unnest(range(1, len(ts) - 3)) r(i)
       |  WHERE len(ts) >= 5),
       |gd AS (SELECT gram, doc_id, count(*) AS c FROM g GROUP BY 1, 2)
       |SELECT gram, count(*) AS n_docs, CAST(sum(c) AS BIGINT) AS n_occ,
       |  min(doc_id) AS first_doc
       |FROM gd GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  // ---- x15: sequence packing into context windows -----------------

  /** x15: sequence packing — the concat-and-chunk step that turns a
    * document corpus into fixed-capacity training windows (documents
    * are concatenated in doc_id order and cut every `capacity`
    * tokens; a doc whose span crosses a cut is boundary-split).
    * Packing is deterministic and PARALLEL: docs are sharded by a
    * content-independent hash (poly_hash(doc_id) mod `shards`) and
    * each (lang, shard) packs independently — the window's running
    * sum is the only sequential piece and it is bounded by shard
    * size, which is exactly how a 100 TB corpus packs (per-shard
    * output files, one window cursor per shard, no global order). */
  def packStats(docs: DataFrame, capacity: Int, shards: Int): DataFrame = {
    val base = docs.select(col("lang"),
      (TextFunctions.polyHash(col("doc_id").cast("string")) % shards)
        .as("shard"),
      col("doc_id"), size(TextFunctions.tokens(col("text"))).as("n_tok"))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
    base.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_first", expr(s"(cum - n_tok) div $capacity"))
      .withColumn("chunk_last", expr(s"(cum - 1) div $capacity"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        count(when(col("chunk_last") > col("chunk_first"), 1))
          .as("n_boundary_docs"))
      .withColumn("n_chunks",
        expr(s"(greatest(total_tokens, 1) - 1) div $capacity + 1"))
      .select(col("lang"), col("shard"), col("n_docs"), col("total_tokens"),
        col("n_chunks"), col("n_boundary_docs"))
  }

  def x15Pack(spark: SparkSession, dir: String): DataFrame =
    packStats(Tables.documents(spark, dir), capacity = 256, shards = 8)

  val x15Sql: String =
    s"""WITH d AS (SELECT lang,
       |    ${polySql("CAST(doc_id AS VARCHAR)")} % 8 AS shard, doc_id,
       |    CAST(len($tsSql) AS INT) AS n_tok
       |  FROM documents),
       |w AS (SELECT lang, shard, n_tok,
       |    CAST(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id)
       |      AS BIGINT) AS cum
       |  FROM d),
       |c AS (SELECT lang, shard, n_tok,
       |    (cum - n_tok) // 256 AS chunk_first,
       |    (cum - 1) // 256 AS chunk_last
       |  FROM w)
       |SELECT lang, shard, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |  (greatest(CAST(sum(n_tok) AS BIGINT), 1) - 1) // 256 + 1 AS n_chunks,
       |  count(*) FILTER (chunk_last > chunk_first) AS n_boundary_docs
       |FROM c GROUP BY 1, 2""".stripMargin

  // ---- x16: pattern scrub / extraction ----------------------------

  /** x16: pattern scrubbing + structured extraction over the event
    * props strings (operators.Scrub): digit-run normalization, match
    * counting, and typed extraction of the embedded value — the
    * number-normalization face of the PII-masking operator (the PII
    * rules themselves are spec-covered on fixture text; this corpus
    * carries no PII by construction). Row-local regexps folded into
    * the scan; the only exchange carries one row per event_type. */
  def x16Scrub(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = Scrub.scrub(col("props"), Seq(Scrub.NumberRule))
    val ext = regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
    Tables.events(spark, dir)
      .select(col("event_type"), col("props"), scrubbed.as("scrubbed"),
        Scrub.matchCount(col("props"), Scrub.NumberRule).as("nm"),
        when(ext === "", 0L).otherwise(ext.cast("long")).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("nm")).as("n_matches"),
        count(when(col("scrubbed") =!= col("props"), 1)).as("n_changed"),
        countDistinct(col("scrubbed")).as("n_forms"),
        sum(col("k")).as("k_sum"), min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
  }

  val x16Sql: String =
    """WITH s AS (SELECT event_type, props,
      |    regexp_replace(props, '[0-9]+', '[NUM]', 'g') AS scrubbed,
      |    len(regexp_extract_all(props, '[0-9]+')) AS nm,
      |    CASE WHEN regexp_extract(props, '"k": ([0-9]+)', 1) = '' THEN 0
      |      ELSE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
      |      END AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(nm) AS BIGINT) AS n_matches,
      |  count(*) FILTER (scrubbed <> props) AS n_changed,
      |  count(DISTINCT scrubbed) AS n_forms,
      |  CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
      |FROM s GROUP BY 1""".stripMargin
}
