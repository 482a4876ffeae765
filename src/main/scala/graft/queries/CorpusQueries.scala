package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Scrub}
import graft.sources.Tables

/** Corpus-curation operators begun in round 5 and wired in round 6 —
  * first-class steps of a large-scale training-data pipeline beyond
  * dedup (d1–d7) and quality scoring (x1/x14): corpus-level
  * repeated-sequence detection, sequence packing into fixed context
  * windows, and pattern scrubbing/PII masking. Each has an exact
  * DuckDB oracle (LlmQueries parity rules: integer arithmetic,
  * guarded divisions, round(...,6) at the edge only). Round 5 also
  * drafted a sorted-run repetition profile here; it was superseded
  * by LlmQueries.x14Repetition's codegen'd top_token_count kernel
  * (O(n) single pass vs O(n log n) sort) and removed.
  */
object CorpusQueries {
  import LlmQueries.{polySql, tsSql}

  // ---- d8: corpus-level repeated n-gram detection -----------------

  /** d8: repeated word-5-gram detection across the corpus — the
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
  /** (doc_id, gram) word-n-gram explode shared by d8/x58 — row-local
    * gram construction from one tokens() pass. */
  private def wordGrams(docsIn: DataFrame, n: Int): DataFrame = {
    import TextFunctions.bind
    docsIn
      .select(col("doc_id"), bind(TextFunctions.tokens(col("text")), ts =>
        when(size(ts) >= n,
          transform(sequence(lit(1), size(ts) - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*)))
          .otherwise(array().cast("array<string>"))).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("gram"))
  }

  def repeatedNgrams(docsIn: DataFrame, n: Int, minDocs: Int): DataFrame = {
    val grams = wordGrams(docsIn, n)
    grams.groupBy(col("gram"), col("doc_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  def d8RepeatedNgrams(spark: SparkSession, dir: String): DataFrame =
    repeatedNgrams(Tables.spread(Tables.documents(spark, dir)),
      n = 5, minDocs = 2)

  val d8Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |g AS (SELECT doc_id, array_to_string(ts[i:i + 4], ' ') AS gram
       |  FROM t, unnest(range(1, len(ts) - 3)) r(i)
       |  WHERE len(ts) >= 5),
       |gd AS (SELECT gram, doc_id, count(*) AS c FROM g GROUP BY 1, 2)
       |SELECT gram, count(*) AS n_docs, CAST(sum(c) AS BIGINT) AS n_occ,
       |  min(doc_id) AS first_doc
       |FROM gd GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  // ---- x22: n-gram-overlap decontamination ------------------------

  /** x22: n-gram-OVERLAP decontamination — the published benchmark-
    * contamination check (the 8-to-13-token-gram sweep of the GPT-3
    * and PaLM data cards): an eval doc is contaminated if it shares
    * ANY word 8-gram with ANY train doc, a far stricter net than
    * x13/x15's whole-prefix fingerprint (which only catches
    * near-verbatim copies). Output: one row per contaminated eval
    * doc with how many of its distinct grams appear in train and the
    * summed train-doc incidence of those grams.
    *
    * 100 TB shape: grams never leave their partition as text — each
    * doc row-locally explodes to DISTINCT gram poly-hashes (8 bytes
    * on the exchange, the d8 discipline taken one step further), the
    * train side pre-aggregates to ONE row per distinct gram before
    * the join, so the eval×train join fans out at most once per
    * (eval doc, gram) no matter how boilerplate-common the gram is,
    * and the final agg is a partial-agg groupBy on doc_id. No
    * all-pairs doc comparison anywhere. */
  def ngramDecontaminate(docs: DataFrame, n: Int): DataFrame = {
    import TextFunctions.bind
    val h = TextFunctions.polyHash(col("doc_id").cast("string")) % 10
    val split = when(h < 8, "train").when(h === 8, "val").otherwise("test")
    val gramHashes = bind(TextFunctions.tokens(col("text")), ts =>
      when(size(ts) >= n,
        array_distinct(transform(sequence(lit(1), size(ts) - (n - 1)), i =>
          TextFunctions.polyHash(
            concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*)))))
        .otherwise(array().cast("array<bigint>")))
    val g = docs.select(col("doc_id"), col("lang"), split.as("split"),
      explode(gramHashes).as("gram"))
    val trainGrams = g.filter(col("split") === "train")
      .groupBy(col("gram")).agg(count(lit(1)).as("n_train_docs"))
    g.filter(col("split") =!= "train")
      .join(trainGrams, Seq("gram"))
      .groupBy(col("doc_id"), col("lang"), col("split"))
      .agg(count(lit(1)).as("n_shared_grams"),
        sum(col("n_train_docs")).as("contamination_weight"))
  }

  def x22NgramDecontaminate(spark: SparkSession, dir: String): DataFrame =
    ngramDecontaminate(Tables.spread(Tables.documents(spark, dir)), n = 8)

  val x22Sql: String = {
    val splitSql =
      s"""CASE WHEN ${polySql("CAST(doc_id AS VARCHAR)")} % 10 < 8 THEN 'train'
         |    WHEN ${polySql("CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
         |    ELSE 'test' END""".stripMargin
    s"""WITH tk AS (SELECT doc_id, lang, $splitSql AS split, $tsSql AS ts
       |  FROM documents),
       |g AS (SELECT DISTINCT doc_id, lang, split,
       |    ${polySql("array_to_string(ts[i:i + 7], ' ')")} AS gram
       |  FROM tk, unnest(range(1, len(ts) - 6)) r(i)
       |  WHERE len(ts) >= 8),
       |tg AS (SELECT gram, count(*) AS n_train_docs FROM g
       |  WHERE split = 'train' GROUP BY 1)
       |SELECT doc_id, lang, split, count(*) AS n_shared_grams,
       |  CAST(sum(n_train_docs) AS BIGINT) AS contamination_weight
       |FROM g JOIN tg USING (gram) WHERE split <> 'train'
       |GROUP BY 1, 2, 3""".stripMargin
  }

  // ---- x16: sequence packing into context windows -----------------

  /** x16: sequence packing — the concat-and-chunk step that turns a
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

  def x16Pack(spark: SparkSession, dir: String): DataFrame =
    packStats(Tables.documents(spark, dir), capacity = 256, shards = 8)

  val x16Sql: String =
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

  // ---- x21: the materialized packing map --------------------------

  /** x21: the doc→window assignment a trainer actually consumes —
    * x16's window cursor WITHOUT the final aggregate: one row per
    * document carrying its shard, its first-token offset in the
    * shard's concatenated stream, and the chunk span [chunk_first,
    * chunk_last] (a span crossing a cut means the doc is
    * boundary-split). Same plan as x16 minus the groupBy: one scan,
    * one bounded per-(lang, shard) running sum, zero extra
    * shuffles — at 100 TB this IS the packing output, written
    * partitioned by (lang, shard) next to the shard files.
    *
    * Zero-token docs occupy no tokens; their span is pinned to
    * [chunk_first, chunk_first] (the `greatest` guards) — without
    * the guard an empty doc at an exact chunk boundary would emit
    * chunk_last < chunk_first, and Spark's `div` (truncate toward
    * zero) would disagree with DuckDB's `//` (floor) on the cum=0
    * corner. */
  def packMap(docs: DataFrame, capacity: Int, shards: Int): DataFrame = {
    val base = docs.select(col("lang"),
      (TextFunctions.polyHash(col("doc_id").cast("string")) % shards)
        .as("shard"),
      col("doc_id"), size(TextFunctions.tokens(col("text"))).as("n_tok"))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
    base.withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"),
        (col("cum") - col("n_tok")).as("token_offset"),
        expr(s"(cum - n_tok) div $capacity").as("chunk_first"),
        expr(s"greatest((cum - n_tok) div $capacity," +
          s" (greatest(cum, 1) - 1) div $capacity)").as("chunk_last"))
  }

  def x21PackMap(spark: SparkSession, dir: String): DataFrame =
    packMap(Tables.documents(spark, dir), capacity = 256, shards = 8)

  val x21Sql: String =
    s"""WITH d AS (SELECT lang,
       |    ${polySql("CAST(doc_id AS VARCHAR)")} % 8 AS shard, doc_id,
       |    CAST(len($tsSql) AS INT) AS n_tok
       |  FROM documents),
       |w AS (SELECT lang, shard, doc_id, n_tok,
       |    CAST(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id)
       |      AS BIGINT) AS cum
       |  FROM d)
       |SELECT doc_id, lang, shard, n_tok,
       |  cum - n_tok AS token_offset,
       |  (cum - n_tok) // 256 AS chunk_first,
       |  greatest((cum - n_tok) // 256, (greatest(cum, 1) - 1) // 256)
       |    AS chunk_last
       |FROM w""".stripMargin

  // ---- x17: pattern scrub / extraction ----------------------------

  /** x17: pattern scrubbing + structured extraction over the event
    * props strings (operators.Scrub): digit-run normalization, match
    * counting, and typed extraction of the embedded value — the
    * number-normalization face of the PII-masking operator (the PII
    * rules themselves are spec-covered on fixture text; this corpus
    * carries no PII by construction). Row-local regexps folded into
    * the scan; the only exchange carries one row per event_type. */
  def x17Scrub(spark: SparkSession, dir: String): DataFrame = {
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

  // ---- x23: incremental (batch-vs-corpus) exact dedup --------------

  /** x23: incremental ingest dedup — the daily-crawl shape: the new
    * batch (here the doc_id%10==7 slice, standing in for today's
    * ingestion) is admitted only where its content hash is absent
    * from the existing corpus (every other doc), then deduplicated
    * within itself (operators.Dedup.incrementalDedup). Unlike d1,
    * which summarizes a whole-corpus dedup, this is the shape that
    * RUNS REPEATEDLY: corpus hashes are a materialized bucketed
    * table in production, so each day's anti-join co-locates and
    * only the batch moves. */
  def x23IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.incrementalDedup(
      corpus = docs.filter(col("doc_id") % 10 =!= 7),
      batch = docs.filter(col("doc_id") % 10 === 7))
  }

  val x23Sql: String =
    """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
      |SELECT content_hash, min(doc_id) AS doc_id, count(*) AS n_in_batch
      |FROM h WHERE doc_id % 10 = 7
      |  AND content_hash NOT IN (
      |    SELECT content_hash FROM h WHERE doc_id % 10 <> 7)
      |GROUP BY 1""".stripMargin

  // ---- x24: cluster representative by quality ----------------------

  /** x24: cluster-representative selection — d9 gives the duplicate
    * CLUSTERS, x1 gives per-doc quality; production curation keeps
    * the BEST doc per cluster, not the lowest-id one (the min-id
    * survivor is an arbitrary member; the argmax-quality member is
    * the one worth training on). Quality rides IN PLACE on the
    * documents scan (textStatsCol — never a self-join to re-attach a
    * row-local metric) and the cluster map joins in as a broadcast:
    * the CC output is tiny relative to the corpus (only docs that
    * near-dup anything). Tiebreak (quality DESC, doc_id ASC) keeps
    * the pick deterministic. */
  def x24ClusterRep(spark: SparkSession, dir: String): DataFrame = {
    // spread: the quality-stats pass is a heavy row-local kernel on
    // a single-split scan — fan it out (row-local, results unchanged)
    val docs = Tables.spread(Tables.documents(spark, dir))
    val clusters = LlmQueries.d9DedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster"))
    val quality = docs
      .select(col("doc_id"), col("n_chars"), LlmQueries.textStatsCol.as("s"))
      .select(col("doc_id"), LlmQueries.qualityFrom(col("s")).as("quality"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("quality").desc, col("doc_id"))
    quality.join(broadcast(clusters), Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("rep_doc"),
        col("quality").as("rep_quality"), col("n_members"))
  }

  val x24Sql: String =
    s"""WITH ${LlmQueries.statsCtesSql()},
       |q AS (SELECT doc_id, ${LlmQueries.qualitySql} AS quality FROM m),
       |c AS (SELECT doc_id, cluster FROM (
       |${LlmQueries.d9Sql}
       |)),
       |j AS (SELECT c.cluster, c.doc_id, q.quality,
       |    row_number() OVER (PARTITION BY c.cluster
       |      ORDER BY q.quality DESC, c.doc_id) AS rn,
       |    count(*) OVER (PARTITION BY c.cluster) AS n_members
       |  FROM c JOIN q USING (doc_id))
       |SELECT cluster, doc_id AS rep_doc, quality AS rep_quality, n_members
       |FROM j WHERE rn = 1""".stripMargin

  // ---- x25: token-budget data selection -----------------------------

  /** x25: quality-ranked selection under a token budget — the "pick
    * the best B tokens per source" step that turns scored corpora
    * into a training mixture (the budget face of x19's rate-based
    * mixing): per source, docs rank by (quality DESC, doc_id) and
    * survive while the running token total stays within budget —
    * a greedy prefix, deterministic and stable under corpus growth
    * at the selection edge only. One scan (quality + token count are
    * the same row-local stats struct), one per-source window sum —
    * the exchange carries (source) partitions, and at 100 TB the
    * per-source sort is the only super-linear piece, bounded by the
    * largest single source (shard it further by the x16 cursor trick
    * if one source dominates). */
  def tokenBudgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    val base = docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        LlmQueries.textStatsCol.as("s"))
      .select(col("source"), col("doc_id"),
        col("s.n_tokens").as("n_tok"),
        LlmQueries.qualityFrom(col("s")).as("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    base.withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  def x25TokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSelect(Tables.documents(spark, dir), budget = 300L)

  val x25Sql: String =
    s"""WITH ${LlmQueries.statsCtesSql("source")},
       |q AS (SELECT source, doc_id, n_tokens AS n_tok,
       |    ${LlmQueries.qualitySql} AS quality
       |  FROM m),
       |w AS (SELECT source, doc_id, n_tok, quality,
       |    CAST(sum(n_tok) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id) AS BIGINT) AS cum_tokens
       |  FROM q)
       |SELECT source, doc_id, n_tok, quality, cum_tokens
       |FROM w WHERE cum_tokens <= 300""".stripMargin

  // ---- x26: corpus-trained bigram-LM quality scoring ----------------

  /** x26: statistical language-model quality scoring — the CCNet/
    * KenLM-style filter ranked by how plausible each document is
    * under a model TRAINED ON THE CORPUS ITSELF: P(c2|c1) =
    * count(c1c2) / count(c1·) over character bigrams, each doc scored
    * by the average transition probability of its own bigrams plus
    * the minimum (its single most surprising transition — the
    * gibberish detector). Train and score are one pipeline: the
    * bigram counts are a two-level hash agg like d8 (shuffle one row
    * per distinct bigram — bounded by alphabet², a few KB at ANY
    * corpus size), the finished model folds into ONE broadcast map
    * row, and scoring is a row-local position-ordered fold over each
    * doc's own text against that map — no second shuffle, no join of
    * docs to grams. Probabilities are exact integer ratios and the
    * per-doc fold runs in ascending position order on both engines,
    * so the double sums are bit-identical (the x9/x21 parity rule). */
  /** Char-bigram MLE model P(c2|c1) from a training slice, folded to
    * ONE broadcast row of two ALIGNED arrays (sorted by gram) — the
    * shape the bigram_score kernel indexes. The first x26 spelling
    * kept a MAP column and scored with transform + element_at:
    * Catalyst map lookup is a linear scan, so scoring cost
    * O(|text|×|model|)/row — 14 s at sf0.1 vs 0.6 s for the kernel
    * (the same interpreted-HOF lesson as simhash64 /
    * char_gram_hashes / PqAdc). */
  def bigramModelRow(train: DataFrame): DataFrame = {
    val bg = train.filter(length(col("text")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - 1),
        i => col("text").substr(i, lit(2)))).as("g"))
    val model = bg.groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .withColumn("c1tot", sum(col("c2"))
        .over(Window.partitionBy(substring(col("g"), 1, 1))))
      .select(col("g"),
        (col("c2").cast("double") / col("c1tot").cast("double")).as("p"))
    model
      .agg(sort_array(collect_list(struct(col("g"), col("p")))).as("gp"))
      .select(transform(col("gp"), x => x.getField("g")).as("grams"),
        transform(col("gp"), x => x.getField("p")).as("probs"))
  }

  def bigramLmScore(docs: DataFrame): DataFrame = {
    val modelRow = bigramModelRow(docs)
    docs.crossJoin(broadcast(modelRow))
      .select(col("doc_id"), call_function("bigram_score",
        col("text"), col("grams"), col("probs")).as("sc"))
      .select(col("doc_id"),
        element_at(col("sc"), 1).cast("long").as("n_bigrams"),
        round(when(element_at(col("sc"), 1) > 0,
          element_at(col("sc"), 2) / element_at(col("sc"), 1))
          .otherwise(0.0), 6).as("avg_prob"),
        round(element_at(col("sc"), 3), 6).as("min_prob"))
  }

  def x26BigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScore(Tables.spread(Tables.documents(spark, dir)))

  val x26Sql: String =
    """WITH bg AS (SELECT doc_id, i, substr(text, i, 2) AS g
      |  FROM documents, LATERAL (SELECT
      |    unnest(generate_series(1, length(text) - 1)) AS i) t
      |  WHERE length(text) >= 2),
      |cnt2 AS (SELECT g, count(*) AS c2 FROM bg GROUP BY g),
      |cnt1 AS (SELECT substr(g, 1, 1) AS c1, sum(c2) AS c1tot
      |  FROM cnt2 GROUP BY 1),
      |model AS (SELECT g, CAST(c2 AS DOUBLE) / CAST(c1tot AS DOUBLE) AS p
      |  FROM cnt2 JOIN cnt1 ON substr(g, 1, 1) = c1),
      |probs AS (SELECT doc_id, list(p ORDER BY i) AS ps
      |  FROM bg JOIN model USING (g) GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(coalesce(len(ps), 0) AS BIGINT) AS n_bigrams,
      |  round(CASE WHEN len(ps) > 0 THEN
      |      list_reduce(list_prepend(CAST(0 AS DOUBLE), ps), (x, y) -> x + y)
      |        / len(ps)
      |    ELSE 0.0 END, 6) AS avg_prob,
      |  round(coalesce(list_aggregate(ps, 'min'), 0.0), 6) AS min_prob
      |FROM documents d LEFT JOIN probs USING (doc_id)""".stripMargin

  // ---- x30: Zipf rank-frequency vocabulary profile -----------------

  /** x30: the corpus VOCABULARY profile — top-30 terms by frequency
    * with rank, corpus share, and cumulative share: the Zipf
    * rank-frequency curve every corpus report opens with (and the
    * empirical basis for stopword lists and tokenizer-vocabulary
    * sizing). Shares stay integer until the output edge (freq and
    * an ordered cumulative sum of freqs over the 30-row head,
    * divided by the one total-token count and rounded) — the
    * x9/x21 parity discipline.
    *
    * 100 TB shape: explode → immediate partial agg (one row per
    * distinct term on the exchange, vocabulary-bounded), the
    * top-30 cut is TakeOrderedAndProject on (freq DESC, term), and
    * the rank/cumsum window runs over 30 rows. The total-token
    * count is the same aggregate reused (ReuseExchange), broadcast
    * as one row. */
  def zipfProfile(docs: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val total = tf.agg(sum(col("freq")).as("total"))
    val top = tf.orderBy(col("freq").desc, col("term")).limit(topK)
    val w = Window.orderBy(col("freq").desc, col("term"))
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cum_freq",
        sum(col("freq")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("term"), col("rank"), col("freq"),
        round(col("freq").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        round(col("cum_freq").cast("double") / col("total").cast("double"), 6)
          .as("cum_share"))
  }

  def x30ZipfProfile(spark: SparkSession, dir: String): DataFrame =
    zipfProfile(Tables.spread(Tables.documents(spark, dir)), topK = 30)

  val x30Sql: String =
    s"""WITH tk AS (SELECT unnest($tsSql) AS term FROM documents),
       |tf AS (SELECT term, count(*) AS freq FROM tk GROUP BY 1),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM tf),
       |top AS (SELECT term, freq FROM tf
       |  ORDER BY freq DESC, term LIMIT 30),
       |r AS (SELECT term, freq,
       |    CAST(row_number() OVER (ORDER BY freq DESC, term) AS INT) AS rank,
       |    CAST(sum(freq) OVER (ORDER BY freq DESC, term
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_freq
       |  FROM top)
       |SELECT term, rank, freq,
       |  round(CAST(freq AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |  round(CAST(cum_freq AS DOUBLE) / CAST(total AS DOUBLE), 6)
       |    AS cum_share
       |FROM r CROSS JOIN tot""".stripMargin

  // ---- x31: exact-moment correlation profile ----------------------

  /** x31: per-language Pearson CORRELATION between document length
    * (n_chars) and token count, plus the least-squares slope — the
    * "are these two quality signals redundant?" question every
    * curation pipeline asks before combining filters. The five
    * moments (Σx, Σy, Σx², Σy², Σxy) accumulate as EXACT integer
    * sums — commutative, so partition order can't shift them — and
    * floats appear only in the final r = (nΣxy−ΣxΣy) /
    * (√(nΣx²−Σx²)·√(nΣy²−Σy²)) step, computed identically from the
    * same exact integers on both engines (the x1 parity discipline:
    * integer until the rounded edge). Degenerate languages (a
    * constant x or y) emit 0.0, not NULL.
    *
    * 100 TB shape: ONE partial-agg shuffle carrying five longs per
    * language — the same cost as a count(*). At extreme scale the
    * moment sums escalate to decimal(38,0) (still exact, still
    * partial-aggregable); the formula is unchanged. */
  def x31CorrProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("lang"),
      col("n_chars").as("x"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("y"))
    val g = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val d1 = col("n") * col("sxx") - col("sx") * col("sx")
    val d2 = col("n") * col("syy") - col("sy") * col("sy")
    g.select(col("lang"), col("n"),
      when(d1 === 0L || d2 === 0L, 0.0)
        .otherwise(round(num.cast("double")
          / (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))), 6))
        .as("corr_chars_tokens"),
      when(d1 === 0L, 0.0)
        .otherwise(round(num.cast("double") / d1.cast("double"), 6))
        .as("tokens_per_char_slope"))
  }

  val x31Sql: String =
    s"""WITH t AS (SELECT lang, n_chars AS x,
       |    CAST(len($tsSql) AS BIGINT) AS y FROM documents),
       |g AS (SELECT lang, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
       |    CAST(sum(x*y) AS BIGINT) AS sxy
       |  FROM t GROUP BY 1),
       |d AS (SELECT lang, n, n*sxy - sx*sy AS num,
       |    n*sxx - sx*sx AS d1, n*syy - sy*sy AS d2 FROM g)
       |SELECT lang, n,
       |  CASE WHEN d1 = 0 OR d2 = 0 THEN 0.0 ELSE
       |    round(CAST(num AS DOUBLE) / (sqrt(CAST(d1 AS DOUBLE))
       |      * sqrt(CAST(d2 AS DOUBLE))), 6) END AS corr_chars_tokens,
       |  CASE WHEN d1 = 0 THEN 0.0 ELSE
       |    round(CAST(num AS DOUBLE) / CAST(d1 AS DOUBLE), 6) END
       |    AS tokens_per_char_slope
       |FROM d""".stripMargin

  // ---- x32: value-atomic equi-depth histogram ---------------------

  /** x32: EQUI-DEPTH histogram of document length — 10 buckets of
    * (approximately) equal population, the optimizer-statistics
    * shape every engine builds for selectivity estimation. Ties are
    * kept VALUE-ATOMIC: the histogram is computed over the distinct
    * values with their counts, a value's whole population lands in
    * the bucket of its cumulative-before rank (`cum_before·B div N`),
    * and a value whose count spans several bucket widths simply
    * leaves some buckets empty. That choice is what makes the
    * operator scale-safe: the only ordered pass runs over DISTINCT
    * values (bounded by the value domain, here document lengths),
    * never over rows — the classic `ntile() OVER (ORDER BY ...)`
    * formulation would drag every ROW through one global sort
    * partition, the canonical 100 TB scale-killer.
    *
    * 100 TB shape: one partial-agg shuffle to (value, count); the
    * cumulative window runs over ≤ |domain| rows; N broadcasts as a
    * one-row fold. */
  def x32EquiDepth(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.documents(spark, dir)
      .groupBy(col("n_chars").as("val")).agg(count(lit(1)).as("c"))
    val total = vals.agg(sum(col("c")).as("n_total"))
    val w = Window.orderBy(col("val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(total))
      .select(col("val"), col("c"),
        expr("(cum - c) * 10 div n_total").as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("val")).as("lo"), max(col("val")).as("hi"),
        sum(col("c")).as("n_docs"))
  }

  val x32Sql: String =
    """WITH v AS (SELECT n_chars AS val, count(*) AS c
      |  FROM documents GROUP BY 1),
      |w AS (SELECT val, c, CAST(sum(c) OVER (ORDER BY val
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum FROM v),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM v),
      |b AS (SELECT val, c, (cum - c) * 10 // n_total AS bucket
      |  FROM w CROSS JOIN t)
      |SELECT bucket, min(val) AS lo, max(val) AS hi,
      |  CAST(sum(c) AS BIGINT) AS n_docs
      |FROM b GROUP BY 1""".stripMargin

  // ---- x35: per-source dataset card -------------------------------

  /** x35: the DATASET CARD — one row per source with the numbers a
    * datasheet/nutrition-facts block reports: volume (docs, chars,
    * tokens), language breadth, exact-duplicate mass, and quality
    * mass (the x1 score in summed micro-units — LONGS, so partition
    * order can't move the total). The capstone profiling query a
    * data consumer reads before training on a source.
    *
    * 100 TB shape: deliberately NOT one agg with two COUNT(DISTINCT)s
    * (that plans an Expand doubling every scanned row). Instead
    * three partial-agg legs — per-source sums; per-(source, md5)
    * then per-source; per-(source, lang) then per-source — joined on
    * the |sources|-row key. Every exchange carries aggregated rows;
    * the corpus is scanned once per leg with only the needed
    * columns. */
  def x35DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stats = docs
      .select(col("source"), col("n_chars"),
        LlmQueries.textStatsCol.as("s"))
      .select(col("source"), col("n_chars"),
        col("s.n_tokens").as("n_tokens"),
        floor(LlmQueries.qualityFrom(col("s")) * 1000000 + 0.5)
          .cast("long").as("q_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(col("q_micro")).as("quality_micro_sum"))
    val distinctTexts = docs
      .groupBy(col("source"), md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum(col("c") - 1).as("n_exact_dup_docs"))
    val langs = docs.select(col("source"), col("lang")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_langs"))
    stats.join(distinctTexts, Seq("source")).join(langs, Seq("source"))
  }

  val x35Sql: String =
    s"""WITH ${LlmQueries.statsCtesSql("source")},
       |st AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(sum(CAST(floor((${LlmQueries.qualitySql}) * 1000000 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS quality_micro_sum
       |  FROM m GROUP BY 1),
       |dh AS (SELECT source, md5(text) AS h, count(*) AS c
       |  FROM documents GROUP BY 1, 2),
       |dt AS (SELECT source, count(*) AS n_distinct_texts,
       |    CAST(sum(c - 1) AS BIGINT) AS n_exact_dup_docs
       |  FROM dh GROUP BY 1),
       |lg AS (SELECT source, count(*) AS n_langs FROM
       |  (SELECT DISTINCT source, lang FROM documents) GROUP BY 1)
       |SELECT source, n_docs, total_chars, total_tokens,
       |  quality_micro_sum, n_distinct_texts, n_exact_dup_docs, n_langs
       |FROM st JOIN dt USING (source) JOIN lg USING (source)""".stripMargin

  // ---- x36: two-pass heavy hitters (Misra–Gries + exact verify) ---

  /** x36: corpus HEAVY HITTERS with bounded memory — which terms
    * exceed 1/64 of all token occurrences. Pass 1 runs the custom
    * `misra_gries(term, 256)` Catalyst aggregate (Sketches.scala):
    * O(256) state per partition partial regardless of vocabulary
    * size, merged associatively, yielding a candidate list that
    * provably contains every term with frequency > n/257 — a strict
    * superset of the n/64 report threshold. Pass 2 re-scans with
    * `term.isin(candidates)` and exact-counts only those terms, so
    * the final output is exact and deterministic even though the
    * sketch itself is merge-order dependent.
    *
    * 100 TB shape: this is the groupBy-free answer to "top terms of
    * an unbounded vocabulary" — x30's zipf profile shuffles one row
    * per DISTINCT term (fine for a bounded vocabulary, unbounded
    * cost for URLs/IDs/code tokens); x36's exchange carries one
    * 256-entry sketch row per partition, and the verify pass's
    * filter prunes to candidate rows at the scan. The one-row
    * driver fold of the sketch is the x15 bloom pattern: O(k) bytes,
    * disclosed, and charged to the bench's timed region. */
  def x36HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val sketch = toks.agg(
      expr("misra_gries(term, 256)").as("cands"),
      count(lit(1)).as("n")).head()
    val cands = sketch.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val n = sketch.getLong(1)
    toks.where(col("term").isin(cands: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(64L) >= lit(n))
      .select(col("term"), col("cnt"),
        round(col("cnt").cast("double") / lit(n.toDouble), 6).as("share"))
  }

  val x36Sql: String =
    s"""WITH tk AS (SELECT unnest($tsSql) AS term FROM documents),
       |tot AS (SELECT count(*) AS n FROM tk),
       |tf AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1)
       |SELECT term, CAST(cnt AS BIGINT) AS cnt,
       |  round(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
       |FROM tf CROSS JOIN tot WHERE cnt * 64 >= n""".stripMargin

  // ---- x37: cross-corpus perplexity filter (CCNet shape) ----------

  /** x37: PERPLEXITY-style quality filtering against a REFERENCE
    * model — the CCNet recipe (Wenzek et al. 2020): train a small LM
    * on a trusted slice (here the `src0` source), score every
    * document against it, and flag documents whose likelihood falls
    * below half the reference slice's own mean. x26 scores a corpus
    * against ITSELF (self-perplexity); x37 is the cross-corpus form
    * a curation pipeline actually runs — "which sources drift from
    * the reference distribution, and how much of each would a
    * perplexity gate drop?" Out-of-vocabulary bigrams score 0
    * (bigram_score's contract), so unseen-alphabet text is maximally
    * penalized — exactly the behavior wanted from a drift gate.
    *
    * Cross-engine exactness: each doc's mean bigram probability is
    * quantized to integer MICRO units (floor(p*1e6+0.5), the x35
    * discipline) the moment it leaves the kernel; the reference mean
    * and the flag predicate (2*score*ref_n < ref_sum) then stay in
    * exact integer arithmetic, immune to cross-engine double
    * summation order.
    *
    * 100 TB shape: the model is ONE broadcast row (vocab² bounded);
    * scoring is a narrow codegen'd projection over the scan; the
    * reference stats fold to a second one-row broadcast; the only
    * exchange is the final per-source partial agg. Training scans
    * only the reference slice (source pushed to the scan). */
  def x37PerplexityFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val model = bigramModelRow(docs.filter(col("source") === "src0"))
    val scored = docs.crossJoin(broadcast(model))
      .select(col("doc_id"), col("source"), call_function("bigram_score",
        col("text"), col("grams"), col("probs")).as("sc"))
      .select(col("doc_id"), col("source"),
        when(element_at(col("sc"), 1) > 0,
          floor(element_at(col("sc"), 2) / element_at(col("sc"), 1)
            * lit(1000000.0) + lit(0.5)))
          .otherwise(0L).cast("long").as("score_micro"))
    val ref = scored.where(col("source") === "src0")
      .agg(sum(col("score_micro")).as("ref_sum"),
        count(lit(1)).as("ref_n"))
    scored.crossJoin(broadcast(ref))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_micro")).as("score_micro_sum"),
        sum(when(col("score_micro") * lit(2L) * col("ref_n") < col("ref_sum"),
          1L).otherwise(0L)).as("n_flagged"))
      .select(col("source"), col("n_docs"), col("score_micro_sum"),
        col("n_flagged"),
        round(col("n_flagged").cast("double") / col("n_docs").cast("double"),
          6).as("flag_rate"))
  }

  val x37Sql: String =
    """WITH bgm AS (SELECT substr(text, i, 2) AS g
      |  FROM documents, LATERAL (SELECT
      |    unnest(generate_series(1, length(text) - 1)) AS i) t
      |  WHERE source = 'src0' AND length(text) >= 2),
      |cnt2 AS (SELECT g, count(*) AS c2 FROM bgm GROUP BY g),
      |cnt1 AS (SELECT substr(g, 1, 1) AS c1, sum(c2) AS c1tot
      |  FROM cnt2 GROUP BY 1),
      |model AS (SELECT g, CAST(c2 AS DOUBLE) / CAST(c1tot AS DOUBLE) AS p
      |  FROM cnt2 JOIN cnt1 ON substr(g, 1, 1) = c1),
      |bg AS (SELECT doc_id, i, substr(text, i, 2) AS g
      |  FROM documents, LATERAL (SELECT
      |    unnest(generate_series(1, length(text) - 1)) AS i) t
      |  WHERE length(text) >= 2),
      |probs AS (SELECT doc_id, list(coalesce(p, 0.0) ORDER BY i) AS ps
      |  FROM bg LEFT JOIN model USING (g) GROUP BY doc_id),
      |sc AS (SELECT d.doc_id, d.source,
      |    CASE WHEN coalesce(len(ps), 0) > 0 THEN
      |      CAST(floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), ps),
      |        (x, y) -> x + y) / len(ps) * 1000000 + 0.5) AS BIGINT)
      |    ELSE 0 END AS score_micro
      |  FROM documents d LEFT JOIN probs USING (doc_id)),
      |refstat AS (SELECT CAST(sum(score_micro) AS BIGINT) AS ref_sum,
      |    count(*) AS ref_n
      |  FROM sc WHERE source = 'src0')
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(score_micro) AS BIGINT) AS score_micro_sum,
      |  CAST(count(*) FILTER (score_micro * 2 * ref_n < ref_sum)
      |    AS BIGINT) AS n_flagged,
      |  round(CAST(count(*) FILTER (score_micro * 2 * ref_n < ref_sum)
      |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS flag_rate
      |FROM sc CROSS JOIN refstat GROUP BY source""".stripMargin

  // ---- x38: corpus drift (Jensen–Shannon divergence) --------------

  /** x38: DISTRIBUTION DRIFT between two corpus snapshots — the
    * monitoring primitive a continuously-ingesting pipeline runs
    * before every training refresh: per language, the Jensen–Shannon
    * divergence between the token distributions of snapshot A
    * (even doc_ids — "yesterday's corpus") and snapshot B (odd —
    * "today's"), plus the exact new-term / dropped-term counts.
    * JSD is symmetric and bounded [0,1] (log2), so one threshold
    * works for every language regardless of vocabulary size.
    *
    * Cross-engine exactness: each term's JSD contribution is a
    * deterministic double expression over INTEGER counts, quantized
    * to nano units (floor(c*1e9+0.5)) the moment it is computed;
    * per-language totals are then exact integer sums — immune to
    * summation order, the same discipline as x35/x37's micro units.
    *
    * 100 TB shape: one scan → explode → ONE (lang, term) partial agg
    * with the A/B split folded into conditional sums (no second
    * scan, no join between snapshots); language totals are a 5-row
    * broadcast; contribution + quantization is a narrow projection;
    * the final per-lang sum rides the same exchange. */
  def x38Drift(spark: SparkSession, dir: String): DataFrame =
    tokenDrift(Tables.spread(Tables.documents(spark, dir))
      .withColumn("is_a", col("doc_id") % 2 === 0))

  /** The x38 A/B conditional term counts — also the STREAMING drift
    * monitor's state shape: run over a streaming frame in update
    * mode, this same aggregation maintains the running snapshot
    * incrementally (counts are monotone, one state row per
    * (lang, term)), and driftFromCounts on the final snapshot equals
    * the batch x38 exactly (spec-asserted parity). */
  def termCounts(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("is_a"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))

  /** Core of x38 over any (lang, is_a, text) frame. */
  def tokenDrift(docs: DataFrame): DataFrame =
    driftFromCounts(termCounts(docs))

  /** JSD + new/dropped-term report from a (lang, term, ca, cb)
    * count relation (batch-computed or a streamed snapshot). */
  def driftFromCounts(cnt: DataFrame): DataFrame = {
    val totals = cnt.groupBy(col("lang")).agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val p = when(col("na") > 0,
      col("ca").cast("double") / col("na").cast("double")).otherwise(lit(0.0))
    val q = when(col("nb") > 0,
      col("cb").cast("double") / col("nb").cast("double")).otherwise(lit(0.0))
    val contrib = lit(0.5) *
      (when(col("ca") > 0, p * log2(p * lit(2.0) / (p + q))).otherwise(lit(0.0)) +
       when(col("cb") > 0, q * log2(q * lit(2.0) / (p + q))).otherwise(lit(0.0)))
    cnt.join(broadcast(totals), "lang")
      .select(col("lang"), col("ca"), col("cb"), col("na"), col("nb"),
        floor(contrib * lit(1000000000.0) + lit(0.5)).cast("long").as("nano"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("ca") === 0, 1L).otherwise(0L)).as("n_new_terms"),
        sum(when(col("cb") === 0, 1L).otherwise(0L)).as("n_dropped_terms"),
        first(col("na")).as("n_tokens_a"),
        first(col("nb")).as("n_tokens_b"),
        sum(col("nano")).as("jsd_nano"))
      .select(col("lang"), col("n_terms"), col("n_new_terms"),
        col("n_dropped_terms"), col("n_tokens_a"), col("n_tokens_b"),
        col("jsd_nano"),
        round(col("jsd_nano").cast("double") / lit(1000000000.0), 6).as("jsd"))
  }

  val x38Sql: String =
    s"""WITH tk AS (SELECT lang, doc_id % 2 = 0 AS is_a, unnest($tsSql) AS term
       |  FROM documents),
       |cnt AS (SELECT lang, term,
       |    CAST(count(*) FILTER (is_a) AS BIGINT) AS ca,
       |    CAST(count(*) FILTER (NOT is_a) AS BIGINT) AS cb
       |  FROM tk GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(cb) AS BIGINT) AS nb FROM cnt GROUP BY 1),
       |c2 AS (SELECT lang, ca, cb, na, nb,
       |    CASE WHEN na > 0 THEN CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
       |      ELSE 0.0 END AS p,
       |    CASE WHEN nb > 0 THEN CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
       |      ELSE 0.0 END AS q
       |  FROM cnt JOIN tot USING (lang)),
       |n3 AS (SELECT lang, ca, cb, na, nb,
       |    CAST(floor(0.5 * (
       |      CASE WHEN ca > 0 THEN p * log2(p * 2.0 / (p + q)) ELSE 0.0 END +
       |      CASE WHEN cb > 0 THEN q * log2(q * 2.0 / (p + q)) ELSE 0.0 END)
       |      * 1000000000.0 + 0.5) AS BIGINT) AS nano
       |  FROM c2)
       |SELECT lang, count(*) AS n_terms,
       |  CAST(count(*) FILTER (ca = 0) AS BIGINT) AS n_new_terms,
       |  CAST(count(*) FILTER (cb = 0) AS BIGINT) AS n_dropped_terms,
       |  min(na) AS n_tokens_a, min(nb) AS n_tokens_b,
       |  CAST(sum(nano) AS BIGINT) AS jsd_nano,
       |  round(CAST(sum(nano) AS DOUBLE) / 1000000000.0, 6) AS jsd
       |FROM n3 GROUP BY 1""".stripMargin

  val x17Sql: String =
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

  // ---- d14: sub-document dedup with doc rewrite (C4 recipe) -------

  /** Core of d14 over any (doc_id, text) frame: split each doc into
    * fixed `chunkTokens`-token chunks ROW-LOCALLY (slices over the
    * token array — no explode→groupBy round trip to rebuild chunks),
    * keep each distinct chunk's FIRST corpus-wide occurrence in
    * global (doc_id, idx) order, drop every later occurrence —
    * across docs AND repeats within one doc — and reconstruct the
    * retained document in chunk order.
    *
    * Determinism: the keeper is min(doc_id·100000 + idx), exact
    * integer arithmetic (idx < 100000 is the documented bound; the
    * extreme-scale escalation is a struct min). The rewrite
    * fingerprint is md5 of kept chunks joined by ' ' in idx order;
    * zero-kept docs fingerprint md5('') on both engines. */
  def chunkDedup(docs: DataFrame, chunkTokens: Int): DataFrame = {
    import TextFunctions.bind
    val n = chunkTokens
    val chunked = docs.select(col("doc_id"),
      bind(TextFunctions.tokens(col("text")), ts =>
        when(size(ts) > 0,
          transform(
            sequence(lit(0), ((size(ts) + lit(n - 1)) / lit(n)).cast("int") - 1),
            i => concat_ws(" ", slice(ts, i * n + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("chunks"))
    val occ = chunked
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("idx", "chunk")))
      .withColumn("ck", md5(col("chunk")))
      .withColumn("ord", col("doc_id") * lit(100000L) + col("idx"))
    // first-occurrence flag via a window min over the chunk key: ONE
    // pass over the occurrence stream (an agg+join-back spelling
    // recomputes the whole tokenize→chunk→hash subtree on both join
    // sides — measured 2× the runtime at sf0.1)
    val agg = occ
      .withColumn("kept", col("ord") ===
        min(col("ord")).over(Window.partitionBy(col("ck"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), length(col("chunk"))).otherwise(lit(0)))
          .as("kept_chars"),
        md5(array_join(transform(array_sort(collect_list(
          when(col("kept"), struct(col("idx"), col("chunk"))))),
          s => s.getField("chunk")), " ")).as("kept_md5"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }

  /** d14: SUB-DOCUMENT dedup with document REWRITE — the C4/
    * RefinedWeb line-dedup recipe adapted to unbroken text (fixed
    * 12-token chunks standing in for lines). d10 DETECTS shared
    * substrings (pairs + shared-window counts); d14 REMOVES them:
    * the boilerplate-scrub step that actually changes the training
    * corpus, with the retained text fingerprinted so the oracle
    * checks the rewrite itself, not just the counts.
    *
    * 100 TB shape: chunking is row-local; the exchange carries one
    * row per chunk occurrence (the operator's honest cost — the
    * chunk IS the unit being deduped), then one partial-agg min per
    * distinct chunk + one equi-join on the chunk key + the per-doc
    * closing agg. At scale the md5 key would shrink to a 64-bit
    * poly-hash before the exchange (the d8 note); md5 here keeps
    * the oracle restatement byte-exact. */
  def d14ChunkDedup(spark: SparkSession, dir: String): DataFrame =
    chunkDedup(Tables.spread(Tables.documents(spark, dir)), 12)

  val d14Sql: String =
    s"""WITH toks AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |ch AS (SELECT doc_id, CAST(i AS INT) AS idx,
       |    array_to_string(ts[i*12+1 : i*12+12], ' ') AS chunk
       |  FROM toks, LATERAL (SELECT
       |    unnest(range(CAST(ceil(len(ts)/12.0) AS INT))) AS i) t
       |  WHERE len(ts) > 0),
       |occ AS (SELECT doc_id, idx, chunk, md5(chunk) AS ck,
       |    doc_id*100000 + idx AS ord FROM ch),
       |keep AS (SELECT ck, min(ord) AS keep_ord FROM occ GROUP BY 1),
       |k AS (SELECT o.doc_id, o.idx, o.chunk, o.ord = keep_ord AS kept
       |  FROM occ o JOIN keep USING (ck)),
       |agg AS (SELECT doc_id, count(*) AS n_chunks,
       |    CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
       |    CAST(coalesce(sum(length(chunk)) FILTER (kept), 0) AS BIGINT)
       |      AS kept_chars,
       |    coalesce(md5(string_agg(chunk, ' ' ORDER BY idx) FILTER (kept)),
       |      md5('')) AS kept_md5
       |  FROM k GROUP BY 1)
       |SELECT d.doc_id, coalesce(n_chunks, 0) AS n_chunks,
       |  coalesce(n_kept, 0) AS n_kept,
       |  coalesce(kept_chars, 0) AS kept_chars,
       |  coalesce(kept_md5, md5('')) AS kept_md5
       |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin

  // ---- x39: incremental corpus profile (merge saved + batch) ------

  /** Mergeable per-language corpus stats — every aggregate is
    * associative (counts/sums add, bounds fold), which is the
    * property that makes the incremental lifecycle exact. */
  def mergeableStats(df: DataFrame): DataFrame =
    df.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("chars_sum"),
      sum(size(TextFunctions.tokens(col("text"))).cast("long"))
        .as("tokens_sum"),
      min(col("n_chars")).as("chars_min"),
      max(col("n_chars")).as("chars_max"))

  /** x39: INCREMENTAL corpus profiling — the refresh lifecycle s17
    * gives the vector index, applied to the profiler: per-language
    * MERGEABLE stats for the standing corpus (doc_id % 10 < 8) are
    * materialized once, and each refresh profiles only the new
    * batch (% 10 >= 8) and MERGES the partial rows — the standing
    * corpus is never re-scanned. countDistinct-style stats are
    * deliberately excluded: they don't merge (x5's exact
    * cardinality and x6's HLL sketch cover that axis). The oracle
    * computes the same stats over the FULL corpus directly, so a
    * drifted merge (double count, lost language, wrong bound fold)
    * breaks the hash. The standing-profile write is charged to the
    * bench timed region (the s10/r36 build-once precedent).
    *
    * 100 TB shape: the saved profile is |langs| rows; the batch
    * scan (one partial agg) is the only corpus work per refresh;
    * the merge is a |langs|-row groupBy. */
  def x39IncrementalProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val path = graft.TmpPaths.workDir(spark, "profile", dir)
    mergeableStats(docs.filter(col("doc_id") % 10 < 8))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .unionByName(mergeableStats(docs.filter(col("doc_id") % 10 >= 8)))
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("chars_sum")).as("chars_sum"),
        sum(col("tokens_sum")).as("tokens_sum"),
        min(col("chars_min")).as("chars_min"),
        max(col("chars_max")).as("chars_max"))
  }

  val x39Sql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       |  CAST(sum(len($tsSql)) AS BIGINT) AS tokens_sum,
       |  min(n_chars) AS chars_min, max(n_chars) AS chars_max
       |FROM documents GROUP BY 1""".stripMargin

  // ---- x44: corpus snapshot diff (data versioning) ----------------

  /** Core of x44 over two (doc_id, lang, text) snapshots: the
    * doc-level DIFF report a versioned corpus store emits between
    * crawls — per language, how many docs are unchanged / changed
    * (same id, different content hash) / removed / added. One FULL
    * OUTER join on doc_id comparing md5(text); every class is a
    * conditional sum on the same |langs|-keyed partial agg. */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val av = a.select(col("doc_id"), col("lang").as("lang_a"),
      md5(col("text")).as("ha"))
    val bv = b.select(col("doc_id"), col("lang").as("lang_b"),
      md5(col("text")).as("hb"))
    av.join(bv, Seq("doc_id"), "full_outer")
      .select(coalesce(col("lang_a"), col("lang_b")).as("lang"),
        col("ha"), col("hb"))
      .groupBy(col("lang"))
      .agg(
        sum(when(col("ha").isNotNull && col("hb").isNotNull &&
          col("ha") === col("hb"), 1L).otherwise(0L)).as("n_unchanged"),
        sum(when(col("ha").isNotNull && col("hb").isNotNull &&
          col("ha") =!= col("hb"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("hb").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("ha").isNull, 1L).otherwise(0L)).as("n_added"))
  }

  /** x44: SNAPSHOT DIFF between two corpus versions — snapshot B is
    * a deterministic simulated next crawl of the documents table
    * (doc_id % 11 == 0 removed, % 7 == 0 re-crawled with edited
    * text, % 13 == 0 re-added under a new id): the report a data
    * lead reads before promoting a new crawl, and the doc-level
    * complement of x38's distribution drift. 100 TB shape: one
    * id-keyed full-outer join (both sides hash-partitioned on the
    * key), content compared by 128-bit hash — text never shuffles —
    * and a |langs|-row closing agg. */
  def x44SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val a = docs.select(col("doc_id"), col("lang"), col("text"))
    val b = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          col("text")))
    snapshotDiff(a, b)
  }

  val x44Sql: String =
    """WITH a AS (SELECT doc_id, lang, md5(text) AS ha FROM documents),
      |b AS (SELECT doc_id, lang,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited'
      |      ELSE text END) AS hb
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, lang, md5(text) FROM documents
      |  WHERE doc_id % 13 = 0),
      |j AS (SELECT coalesce(a.lang, b.lang) AS lang, ha, hb
      |  FROM a FULL OUTER JOIN b USING (doc_id))
      |SELECT lang,
      |  CAST(count(*) FILTER (ha IS NOT NULL AND hb IS NOT NULL
      |    AND ha = hb) AS BIGINT) AS n_unchanged,
      |  CAST(count(*) FILTER (ha IS NOT NULL AND hb IS NOT NULL
      |    AND ha <> hb) AS BIGINT) AS n_changed,
      |  CAST(count(*) FILTER (hb IS NULL) AS BIGINT) AS n_removed,
      |  CAST(count(*) FILTER (ha IS NULL) AS BIGINT) AS n_added
      |FROM j GROUP BY 1""".stripMargin

  // ---- x45: linear quality classifier (per-source gate report) ----

  /** x45: a fixed-weight LOGISTIC quality classifier over the x1
    * feature family — the shape of the fastText/CCNet "keep or drop"
    * model every production pretraining pipeline runs, with the
    * learned weights replaced by a committed linear model (the
    * container has no trainer; the SERVING dataflow is what the
    * engine owns): z = −2 + 4·stop_ratio + 2·min(n_tokens,200)/200 −
    * 3·punct_ratio, keep ⇔ z > 0.
    *
    * Exactness: the features are ratios of row-local INTEGER counts
    * (identical IEEE doubles on both engines), z is the same
    * left-associated +/· tree on both sides, and the KEEP DECISION
    * compares z > 0 — pure arithmetic, never the sigmoid — so the
    * gate cannot drift. Only the reported per-doc score touches
    * exp(): it quantizes to micro-units immediately (the x37
    * discipline) and sums as exact longs, order-independent.
    *
    * 100 TB shape: scoring is a narrow codegen'd projection over the
    * documents scan (the tokenize pass is the shared bind-struct —
    * ONE pass per doc); the only exchange is the ≤|sources|-row
    * partial agg. A model upgrade (more features, an embedding
    * dot-product) stays a projection: this operator never shuffles
    * the corpus. */
  /** the x45 logistic-gate linear term as a per-row column — docsIn
    * must carry `text` and `n_chars`; shared with the x49 capstone. */
  private[queries] def qualityZCol: Column = {
    import TextFunctions.bind
    bind(LlmQueries.textStatsCol, s => {
      val stopRatio = when(s.getField("n_tokens") > 0,
        s.getField("n_stop").cast("double") / s.getField("n_tokens"))
        .otherwise(lit(0.0))
      val punctRatio = when(col("n_chars") > 0,
        s.getField("n_punct").cast("double") / col("n_chars"))
        .otherwise(lit(0.0))
      lit(-2.0) + lit(4.0) * stopRatio +
        lit(2.0) * (least(s.getField("n_tokens"), lit(200)).cast("double") /
          lit(200.0)) -
        lit(3.0) * punctRatio
    })
  }

  def qualityClassifier(docsIn: DataFrame): DataFrame = {
    val feat = docsIn
      .select(col("source"), col("n_chars"),
        LlmQueries.textStatsCol.as("s"))
      .select(col("source"),
        col("s.n_tokens").as("n_tokens"),
        when(col("s.n_tokens") > 0,
          col("s.n_stop").cast("double") / col("s.n_tokens"))
          .otherwise(lit(0.0)).as("stop_ratio"),
        when(col("n_chars") > 0,
          col("s.n_punct").cast("double") / col("n_chars"))
          .otherwise(lit(0.0)).as("punct_ratio"))
    val z = lit(-2.0) + lit(4.0) * col("stop_ratio") +
      lit(2.0) * (least(col("n_tokens"), lit(200)).cast("double") /
        lit(200.0)) -
      lit(3.0) * col("punct_ratio")
    feat.withColumn("z", z)
      .withColumn("score_micro",
        floor(lit(1000000.0) / (lit(1.0) + exp(-col("z"))) + lit(0.5))
          .cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("z") > 0, 1L).otherwise(0L)).as("n_pass"),
        sum(col("score_micro")).as("score_micro_sum"))
      .select(col("source"), col("n_docs"), col("n_pass"),
        round(col("n_pass").cast("double") / col("n_docs").cast("double"), 6)
          .as("pass_rate"),
        col("score_micro_sum"))
  }

  def x45QualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifier(Tables.spread(Tables.documents(spark, dir)))

  val x45Sql: String =
    s"""WITH ${LlmQueries.statsCtesSql("source")},
       |f AS (SELECT source, n_tokens,
       |    CASE WHEN n_tokens > 0
       |      THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END
       |      AS stop_ratio,
       |    CASE WHEN n_chars > 0
       |      THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END
       |      AS punct_ratio
       |  FROM m),
       |zt AS (SELECT source,
       |    -2.0 + 4.0 * stop_ratio
       |      + 2.0 * (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0)
       |      - 3.0 * punct_ratio AS z
       |  FROM f),
       |st AS (SELECT source, z,
       |    CAST(floor(1000000.0 / (1.0 + exp(-z)) + 0.5) AS BIGINT)
       |      AS score_micro
       |  FROM zt)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  round(CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS pass_rate,
       |  CAST(sum(score_micro) AS BIGINT) AS score_micro_sum
       |FROM st GROUP BY 1""".stripMargin

  // ---- x46: BPE merge candidates (vocabulary induction) -----------

  /** x46: the first round of BPE VOCABULARY TRAINING — the top-K
    * most frequent adjacent character pairs across the corpus,
    * weighted by word frequency (each occurrence of "low" votes for
    * "l o" and "o w"). This is the inner loop of byte-pair-encoding
    * tokenizer training (Sennrich et al.) — the one corpus-scale
    * computation a tokenizer build needs; the merge-apply-repeat
    * driver loop is orchestration around repeated calls of exactly
    * this query.
    *
    * 100 TB shape: the plan collapses the corpus to its VOCABULARY
    * before any pair work — explode(tokens) feeds one partial-agg
    * shuffle to (token, count), and pair extraction then runs over
    * |vocab| rows (≈10⁵–10⁶ regardless of corpus size, Heaps' law),
    * not over the corpus. The pair agg is a second tiny shuffle and
    * the top-K is TakeOrderedAndProject. Counts are exact longs
    * end-to-end; ordering ties break on the pair string. */
  def bpeMergeCandidates(docsIn: DataFrame, topK: Int): DataFrame = {
    val tf = docsIn
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pairs = tf.filter(length(col("tok")) >= 2)
      .select(col("c"), explode(transform(
        sequence(lit(1), length(col("tok")) - 1),
        i => concat_ws(" ", col("tok").substr(i, lit(1)),
          col("tok").substr(i + 1, lit(1))))).as("pair"))
    pairs.groupBy(col("pair"))
      .agg(sum(col("c")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("pair"))).cast("int"))
  }

  def x46BpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergeCandidates(Tables.spread(Tables.documents(spark, dir)), 20)

  val x46Sql: String =
    s"""WITH t AS (SELECT $tsSql AS ts FROM documents),
       |tok AS (SELECT unnest(ts) AS tok FROM t),
       |tf AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
       |pr AS (SELECT substr(tok, i, 1) || ' ' || substr(tok, i + 1, 1)
       |      AS pair, c
       |  FROM tf, LATERAL (SELECT
       |    unnest(range(1, length(tok))) AS i) x
       |  WHERE length(tok) >= 2),
       |agg AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n_occurrences
       |  FROM pr GROUP BY 1),
       |r AS (SELECT pair, n_occurrences, CAST(row_number() OVER
       |    (ORDER BY n_occurrences DESC, pair) AS INT) AS rnk FROM agg)
       |SELECT pair, n_occurrences, rnk FROM r WHERE rnk <= 20""".stripMargin

  // ---- x67: BPE merge training (the iterative inner loop) ---------

  /** x67: BPE TOKENIZER TRAINING, the iterative inner loop x46 only
    * counted one round of: three full merge rounds — count adjacent
    * segment pairs weighted by word frequency, adopt the single best
    * pair as a merge rule (count desc, pair lexicographic — the
    * deterministic tie-break), RE-SEGMENT every word type under the
    * new rule, repeat on the updated segmentation. Round N's counts
    * depend on round N−1's merges (after merging 't h', the pair
    * 'th e' exists and 'h e' has shrunk), which is exactly what the
    * one-shot candidate count cannot see; the emitted rows are the
    * learned merge table — the artifact a tokenizer ships.
    *
    * Resegmentation is the left-to-right single-pass BPE apply,
    * expressed as ONE string fold both engines share: the
    * segmentation lives as a chr(31)-delimited string, and the fold
    * appends each segment unless the accumulator's LAST segment is
    * exactly `lhs` and the current is `rhs` (checked with an
    * ends-with on separator+lhs, so partial-segment suffixes can't
    * false-match), in which case the tail rewrites to the merged
    * token. A merge's output can never equal `lhs` again (rhs is
    * non-empty), so the fold is precisely the standard one-pass
    * apply — including the aa|aa run-parity case ('aaa' under (a,a)
    * → [aa, a]).
    *
    * 100 TB shape: ONE corpus pass builds the word-TYPE vocabulary
    * (Heaps' law: |vocab| ≪ corpus); every training round touches
    * only that vocab-bounded frame — pair counting is a partial-agg
    * groupBy over it, the argmax is a 1-row TakeOrdered broadcast,
    * and the resegmentation is a narrow row-local fold. This is the
    * word-type-level counting shape production BPE trainers
    * (HuggingFace tokenizers) actually use. */
  def bpeTrain(docsIn: DataFrame, rounds: Int): DataFrame = {
    import graft.Engine.SnapshotOps
    val SEP = "\u001f"
    var words = docsIn
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .select(array_join(array_remove(split(col("tok"), ""), ""), SEP)
        .as("seg"), col("c"))
      .snapshot()
    val ruleRows = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (round <- 1 to rounds) {
      val pairs = TextFunctions.bind(split(col("seg"), SEP), a =>
        when(size(a) >= 2, transform(sequence(lit(1), size(a) - 1),
          i => struct(element_at(a, i).as("lhs"),
            element_at(a, i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>")))
      val rule = words.select(col("c"), explode(pairs).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("c")).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("lhs"), col("rhs"))
        .limit(1)
        .snapshot()
      ruleRows += rule.select(lit(round).as("merge_round"), col("lhs"),
        col("rhs"), col("n_occurrences"))
      val merged = words.crossJoin(broadcast(
          rule.select(col("lhs").as("ml"), col("rhs").as("mr"))))
        .select(bpeFold(SEP).as("seg"), col("c"))
        .snapshot()
      words.unpersist()
      words = merged
    }
    words.unpersist()
    ruleRows.reduce(_ union _)
  }

  /** The one-pass left-to-right BPE merge fold shared by training
    * (resegmentation) and application (x68): folds the
    * SEP-delimited segmentation in `seg` under the single rule
    * present as (`ml`, `mr`) columns on the row — see the x67
    * scaladoc for why this fold IS the standard one-pass apply. */
  private def bpeFold(SEP: String): Column =
    aggregate(split(col("seg"), SEP), lit(""),
      (acc, sg) => when(acc === "", sg)
        .when((acc === col("ml") ||
            acc.endsWith(concat(lit(SEP), col("ml")))) &&
          sg === col("mr"),
          concat(acc.substr(lit(1),
            length(acc) - length(col("ml"))),
            col("ml"), col("mr")))
        .otherwise(concat(acc, lit(SEP), sg)))

  def x67BpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(Tables.spread(Tables.documents(spark, dir)), rounds = 3)

  // ---- x68: tokenizer APPLY on a held-out split -------------------

  /** x68: TOKENIZE WITH THE TRAINED TABLE — the other half of the
    * x67 lifecycle, turning the learned merge rules into the thing a
    * pipeline actually ships: train the 3-rule merge table on the
    * TRAIN split (doc_id % 10 ≠ 9 — the x44-family split convention),
    * then apply the rules IN MERGE ORDER to the held-out split and
    * emit per-document token accounting (word count, post-merge
    * token count). Application is the identical one-pass fold
    * training used for resegmentation (bpeFold) — one crossJoin per
    * rule against the broadcast 1-row rule frame — so trained
    * artifact and serving path cannot drift.
    *
    * 100 TB shape: rules apply at the held-out WORD-TYPE level
    * (Heaps' law again — distinct(tok) ≪ corpus), then one keyed
    * join rebuilds per-document counts: the corpus-sized work is one
    * explode + one partial-agg groupBy; everything BPE-shaped runs
    * on the vocab-bounded frame. */
  def x68BpeApplyHeldout(spark: SparkSession, dir: String): DataFrame =
    bpeHeldoutPerDoc(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_tokens"))

  /** x68's per-document accounting with `lang`, `source` and the
    * document byte length THREADED THROUGH from the held-out scan
    * (the row already carries them — re-deriving any later would
    * mean a second `documents` scan and a doc-keyed shuffle join).
    * Shared by x68 (drops the extras), x70 (rolls up on lang) and
    * x72 (rolls up on source), so both reports cost x68 + one
    * tiny closing agg. */
  private def bpeHeldoutPerDoc(spark: SparkSession, dir: String): DataFrame = {
    import graft.Engine.SnapshotOps
    val SEP = "\u001f"
    val rounds = 3
    val docs = Tables.spread(Tables.documents(spark, dir))
    val rules = bpeTrain(docs.filter(col("doc_id") % 10 =!= 9), rounds)
      .snapshot()
    val ht = docs.filter(col("doc_id") % 10 === 9)
      .select(col("doc_id"), col("lang"), col("source"),
        octet_length(col("text")).as("nb"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
    var segd = ht.select(col("tok")).distinct()
      .select(col("tok"),
        array_join(array_remove(split(col("tok"), ""), ""), SEP).as("seg"))
    for (r <- 1 to rounds) {
      segd = segd.crossJoin(broadcast(
          rules.filter(col("merge_round") === r)
            .select(col("lhs").as("ml"), col("rhs").as("mr"))))
        .select(col("tok"), bpeFold(SEP).as("seg"))
    }
    val cnt = segd.select(col("tok"),
      size(split(col("seg"), SEP)).as("n_tok"))
    ht.join(cnt, Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("bigint").as("n_tokens"),
        max(col("nb")).cast("bigint").as("n_bytes"))
  }

  /** The DuckDB one-pass merge fold (the SQL twin of bpeFold). */
  private val bpeFoldSql: String =
    """list_reduce(list_prepend('', sg), (acc, s) -> CASE
      |      WHEN acc = '' THEN s
      |      WHEN (acc = ml OR ends_with(acc, chr(31) || ml)) AND
      |        s = mr
      |      THEN left(acc, length(acc) - length(ml)) || ml || mr
      |      ELSE acc || chr(31) || s END)""".stripMargin

  /** Training CTE chain shared by x67 (full corpus) and x68 (train
    * split): t/tf/w0 + per-round sg/pr/rule/w CTEs; `rule$i` holds
    * round i's learned merge. */
  private def bpeTrainSqlCtes(rounds: Int, where: String): String = {
    def roundCtes(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""sg$i AS (SELECT c, string_split(seg, chr(31)) AS sg FROM $prev),
         |pr$i AS (SELECT sg[i] AS lhs, sg[i + 1] AS rhs,
         |    CAST(sum(c) AS BIGINT) AS n_occurrences
         |  FROM sg$i, LATERAL (SELECT
         |    unnest(range(1, len(sg))) AS i) x
         |  WHERE len(sg) >= 2 GROUP BY 1, 2),
         |rule$i AS (SELECT lhs, rhs, n_occurrences FROM pr$i
         |  ORDER BY n_occurrences DESC, lhs, rhs LIMIT 1),
         |w$i AS MATERIALIZED (SELECT
         |    $bpeFoldSql AS seg, c
         |  FROM sg$i CROSS JOIN (SELECT lhs AS ml, rhs AS mr
         |    FROM rule$i) r$i)""".stripMargin
    }
    val body = (1 to rounds).map(roundCtes).mkString(",\n")
    s"""WITH t AS (SELECT $tsSql AS ts FROM documents$where),
       |tf AS (SELECT tok, count(*) AS c FROM (SELECT unnest(ts) AS tok
       |  FROM t) GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT array_to_string(
       |    list_transform(range(length(tok)),
       |      i -> substr(tok, CAST(i + 1 AS INT), 1)), chr(31)) AS seg, c
       |  FROM tf),
       |$body""".stripMargin
  }

  val x67Sql: String = {
    val out = (1 to 3).map(i =>
      s"SELECT $i AS merge_round, lhs, rhs, n_occurrences FROM rule$i")
      .mkString("\nUNION ALL\n")
    bpeTrainSqlCtes(3, "") + "\n" + out
  }

  /** Held-out application CTE chain shared by x68 and x70: train
    * CTEs on the train split, three sequential fold applications at
    * word-type level, then the per-doc rollup `pd` carrying `lang`
    * straight off the held-out rows — the same shape as the Spark
    * plan (bpeHeldoutPerDoc). */
  private val bpeHeldoutSqlCtes: String = {
    def applyCte(i: Int): String =
      s"""a$i AS (SELECT tok, $bpeFoldSql AS seg
         |  FROM (SELECT tok, string_split(seg, chr(31)) AS sg FROM a${i - 1})
         |  CROSS JOIN (SELECT lhs AS ml, rhs AS mr FROM rule$i))""".stripMargin
    bpeTrainSqlCtes(3, " WHERE doc_id % 10 <> 9") +
      s""",
         |ht AS (SELECT doc_id, lang, source, nb, unnest(ts) AS tok FROM
         |  (SELECT doc_id, lang, source, strlen(text) AS nb,
         |     $tsSql AS ts FROM documents
         |   WHERE doc_id % 10 = 9)),
         |ty AS (SELECT DISTINCT tok FROM ht),
         |a0 AS (SELECT tok, array_to_string(
         |    list_transform(range(length(tok)),
         |      i -> substr(tok, CAST(i + 1 AS INT), 1)), chr(31)) AS seg
         |  FROM ty),
         |${(1 to 3).map(applyCte).mkString(",\n")},
         |cnt AS (SELECT tok, len(string_split(seg, chr(31))) AS n_tok
         |  FROM a3),
         |pd AS (SELECT ht.doc_id, ht.lang, ht.source,
         |    count(*) AS n_words,
         |    CAST(sum(cnt.n_tok) AS BIGINT) AS n_tokens,
         |    CAST(max(ht.nb) AS BIGINT) AS n_bytes
         |  FROM ht JOIN cnt ON cnt.tok = ht.tok GROUP BY 1, 2, 3)""".stripMargin
  }

  /** Held-out application oracle: the shared CTE chain, lang
    * dropped. */
  val x68Sql: String =
    bpeHeldoutSqlCtes + "\nSELECT doc_id, n_words, n_tokens FROM pd"

  // ---- x47: semantic outliers vs source centroid ------------------

  /** x47: SEMANTIC OUTLIER detection — each document's cosine to its
    * own source's embedding centroid, reported per source as an
    * outlier rate (cos < 0.05): the curation signal that catches
    * mislabeled feeds, scraper drift, and poisoned batches that
    * lexical quality gates (x1/x45) cannot see. The cross-modal join
    * (documents ⋈ embeddings on doc_id = vec_id) is the same id
    * contract d5/d7 use.
    *
    * Exactness: embedding components quantize to micro-unit longs at
    * the scan, so the per-source component sums are EXACT,
    * order-independent integer aggregation (a float vector mean
    * would depend on reduction order); cosine is then the fixed
    * index-order double fold both engines restate identically
    * (cosine is scale-invariant, so the un-normalized sums serve as
    * the centroid directly), quantized back to micro-units before
    * the threshold compare and the sum — integers from there on.
    *
    * 100 TB shape: one (source, dim) partial-agg shuffle — 64·
    * |sources| rows out regardless of corpus size — then the ≤
    * |sources|-row centroid relation BROADCASTS back onto the
    * embeddings scan: scoring is a narrow projection, no second
    * corpus shuffle. int64 component sums outgrow at ~10¹² docs
    * per source (1e6-unit components × corpus): decimal(38,0) is
    * the documented escalation. */
  /** micro-unit quantization of a float embedding column (the exact
    * integer representation every x47 phase works over). */
  private[graft] def emQuantize(c: Column): Column =
    transform(c, x => floor(x * lit(1000000.0) + lit(0.5)).cast("long"))

  /** per-source centroid as EXACT micro-unit component sums — e must
    * carry (source, em). */
  private[graft] def outlierCentroids(e: DataFrame): DataFrame =
    e.select(col("source"), posexplode(col("em")).as(Seq("dim", "v")))
      .groupBy(col("source"), col("dim")).agg(sum(col("v")).as("s"))
      .groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("s")))),
        p => p.getField("s")).as("cm"))

  /** scores rows (source, em, …) against broadcast centroids,
    * appending `cos_micro`. Pure stream-compatible projection: the
    * join is stream-static with a broadcast build side and no state,
    * so the SAME column tree serves batch x47 and the streaming
    * ingest monitor (StreamingSpec parity test). */
  private[graft] def outlierScores(e: DataFrame, cent: DataFrame): DataFrame = {
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, v) => acc + v)
    def dot(a: Column, b: Column): Column =
      fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))
    e.join(broadcast(cent), Seq("source"))
      .withColumn("cos", dot(col("em"), col("cm")) /
        (sqrt(dot(col("em"), col("em"))) * sqrt(dot(col("cm"), col("cm")))))
      .withColumn("cos_micro",
        floor(col("cos") * lit(1000000.0) + lit(0.5)).cast("long"))
  }

  def semanticOutliers(embIn: DataFrame, docsIn: DataFrame,
      tauMicro: Long): DataFrame = {
    val e = embIn
      .join(docsIn.select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
      .select(col("source"), col("doc_id"),
        emQuantize(col("embedding")).as("em"))
    outlierScores(e, outlierCentroids(e))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cos_micro") < tauMicro, 1L).otherwise(0L))
          .as("n_outliers"),
        min(col("cos_micro")).as("min_cos_micro"),
        sum(col("cos_micro")).as("cos_micro_sum"))
      .select(col("source"), col("n_docs"), col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n_docs").cast("double"),
          6).as("outlier_rate"),
        col("min_cos_micro"),
        round(col("cos_micro_sum").cast("double") /
          col("n_docs").cast("double") / lit(1000000.0), 6).as("mean_cos"))
  }

  def x47SemanticOutliers(spark: SparkSession, dir: String): DataFrame =
    semanticOutliers(Tables.embeddings(spark, dir),
      Tables.documents(spark, dir), tauMicro = 50000L)

  val x47Sql: String = {
    import LlmQueries.cosSql
    s"""WITH e AS (SELECT d.source, v.vec_id AS doc_id,
       |    list_transform(v.embedding,
       |      -- CAST to DOUBLE first: DuckDB types FLOAT * 1000000.0
       |      -- as FLOAT (single-precision multiply), Spark as double
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
       |        AS BIGINT)) AS em
       |  FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id),
       |comp AS (SELECT source, k AS dim, CAST(sum(em[k+1]) AS BIGINT) AS s
       |  FROM e, LATERAL (SELECT unnest(range(64)) AS k) t
       |  GROUP BY 1, 2),
       |cent AS (SELECT source, list(s ORDER BY dim) AS cm
       |  FROM comp GROUP BY 1),
       |sc AS (SELECT e.source, e.doc_id,
       |    CAST(floor(${cosSql("em", "cm")} * 1000000.0 + 0.5) AS BIGINT)
       |      AS cos_micro
       |  FROM e JOIN cent USING (source))
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN cos_micro < 50000 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers,
       |  round(CAST(sum(CASE WHEN cos_micro < 50000 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS outlier_rate,
       |  CAST(min(cos_micro) AS BIGINT) AS min_cos_micro,
       |  round(CAST(sum(cos_micro) AS DOUBLE) / count(*) / 1000000.0, 6)
       |    AS mean_cos
       |FROM sc GROUP BY 1""".stripMargin
  }

  // ---- x48: character-entropy quality profile ---------------------

  /** x48: per-document CHARACTER ENTROPY (Shannon, nats) profiled
    * per source — the quality signal that catches what token-level
    * gates (x1/x45) structurally miss: compressed/base64 blobs and
    * random keys score HIGH (near-uniform characters), while
    * repetitive boilerplate ("aaaa…", padded templates) scores LOW;
    * both ends are cut candidates. H = ln(n) − Σ_c n_c·ln(n_c)/n
    * over the doc's character histogram.
    *
    * Exactness: the histogram fold runs over the SORTED distinct
    * character list (identical order on both engines — a hash-order
    * fold would sum doubles in engine-specific order); counts are
    * exact integers; per-doc H quantizes to micro-nats immediately
    * and aggregates as exact longs. The char split mirrors the
    * tokens discipline: trailing zero-width splits are filtered so
    * the JVM and DuckDB lists agree.
    *
    * 100 TB shape: entirely ROW-LOCAL — one narrow projection over
    * the scan (O(k·n) per doc with k = per-doc distinct chars,
    * alphabet-bounded), then the |sources|-row partial agg. Nothing
    * about the corpus is shuffled; a dedicated codegen'd
    * char-histogram Expression (the top_token_count pattern) is the
    * escalation if k·n per-doc cost ever dominates. */
  /** the x48 per-doc entropy in micro-nats as a per-row column —
    * docsIn must carry `text`; shared with the x49 capstone. Round 9
    * second pass: the codegen'd `char_entropy_micro` expression (ONE
    * sweep + a sorted-distinct fold) replaces the interpreted HOF
    * fold whose per-distinct-char filter passes made the projection
    * O(k·n) per doc — the escalation the x48 scaladoc promised. The
    * expression reproduces the HOF fold's doubles bit-for-bit
    * (same sorted-char order, same ln), spec-pinned by
    * `Round9Spec`'s parity test. */
  private[graft] def entropyMicroCol: Column =
    call_function("char_entropy_micro", col("text"))

  /** the superseded HOF spelling — kept for the parity spec that
    * proves the codegen'd expression computes the identical fold. */
  private[graft] def entropyMicroHofCol: Column = {
    import TextFunctions.bind
    val h = bind(filter(split(col("text"), ""), ch => ch =!= ""), chs =>
      bind(array_sort(array_distinct(chs)), dcs => {
        val n = size(chs).cast("double")
        val contrib = aggregate(dcs, lit(0.0), (acc, c) =>
          acc + bind(size(filter(chs, x => x === c)).cast("double"),
            t => t * log(t)))
        when(size(chs) === 0, lit(0.0))
          .otherwise(log(n) - contrib / n)
      }))
    floor(h * lit(1000000.0) + lit(0.5)).cast("long")
  }

  def entropyProfile(docsIn: DataFrame): DataFrame = {
    docsIn
      .select(col("source"), entropyMicroCol.as("e_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e_micro") < 2750000L, 1L).otherwise(0L)).as("n_low"),
        sum(when(col("e_micro") > 2900000L, 1L).otherwise(0L)).as("n_high"),
        min(col("e_micro")).as("min_e_micro"),
        sum(col("e_micro")).as("e_micro_sum"))
      .select(col("source"), col("n_docs"), col("n_low"), col("n_high"),
        col("min_e_micro"),
        round(col("e_micro_sum").cast("double") /
          col("n_docs").cast("double") / lit(1000000.0), 6)
          .as("mean_entropy"))
  }

  def x48Entropy(spark: SparkSession, dir: String): DataFrame =
    entropyProfile(Tables.spread(Tables.documents(spark, dir)))

  val x48Sql: String =
    """WITH ch AS (SELECT source,
      |    list_filter(string_split(text, ''), x -> x <> '') AS chs
      |  FROM documents),
      |e AS (SELECT source,
      |    CASE WHEN len(chs) = 0 THEN 0.0 ELSE
      |      ln(CAST(len(chs) AS DOUBLE)) -
      |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(list_sort(list_distinct(chs)), c ->
      |          CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) *
      |          ln(CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE)))),
      |        (a, b) -> a + b) / CAST(len(chs) AS DOUBLE)
      |    END AS h
      |  FROM ch),
      |m AS (SELECT source,
      |    CAST(floor(h * 1000000.0 + 0.5) AS BIGINT) AS e_micro FROM e)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN e_micro < 2750000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_low,
      |  CAST(sum(CASE WHEN e_micro > 2900000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_high,
      |  CAST(min(e_micro) AS BIGINT) AS min_e_micro,
      |  round(CAST(sum(e_micro) AS DOUBLE) / count(*) / 1000000.0, 6)
      |    AS mean_entropy
      |FROM m GROUP BY 1""".stripMargin

  // ---- x49: curation capstone v4 (clean-yield report) -------------

  /** x49: curation capstone v4 — the round-9 gates composed into ONE
    * per-source CLEAN-YIELD report: the x45 logistic quality gate
    * (z > 0), the x48 entropy band (neither boilerplate-low nor
    * blob-high), and the x47 semantic gate (not an outlier vs the
    * source centroid), each counted per source alongside n_clean =
    * docs passing ALL three — the number that says how much of a
    * feed survives the full round-9 filter stack. The x10/x20/x42
    * composition statement for this round's primitives.
    *
    * Exactness: all three gates are integer/exact-arithmetic
    * compares (z > 0 is pure double arithmetic from exact ratios,
    * the entropy band and cosine threshold compare micro-unit
    * longs), so every count is drift-free.
    *
    * 100 TB shape: quality + entropy evaluate IN PLACE on the
    * documents scan (one narrow projection, no self-join — the x20
    * lesson); the semantic gate arrives through the one doc_id
    * equi-join against the x47 scoring projection (centroids
    * broadcast); the closing agg is |sources| rows. */
  def x49CurationV4(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val e = Tables.embeddings(spark, dir)
      .join(docs.select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
      .select(col("source"), col("doc_id"),
        emQuantize(col("embedding")).as("em"))
    val sem = outlierScores(e, outlierCentroids(e))
      .select(col("doc_id"), (col("cos_micro") >= 50000L).as("s_ok"))
    docs
      .select(col("doc_id"), col("source"),
        (qualityZCol > 0).as("q_ok"),
        (entropyMicroCol >= 2750000L && entropyMicroCol <= 2900000L)
          .as("h_ok"))
      .join(sem, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("q_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        sum(when(col("h_ok"), 1L).otherwise(0L)).as("n_entropy_ok"),
        sum(when(col("s_ok"), 1L).otherwise(0L)).as("n_semantic_ok"),
        sum(when(col("q_ok") && col("h_ok") && col("s_ok"), 1L)
          .otherwise(0L)).as("n_clean"))
      .select(col("source"), col("n_docs"), col("n_quality_ok"),
        col("n_entropy_ok"), col("n_semantic_ok"), col("n_clean"),
        round(col("n_clean").cast("double") / col("n_docs").cast("double"),
          6).as("yield_rate"))
  }

  val x49Sql: String = {
    import LlmQueries.cosSql
    s"""WITH ${LlmQueries.statsCtesSql("source")},
       |f AS (SELECT doc_id, source, n_tokens,
       |    CASE WHEN n_tokens > 0
       |      THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END
       |      AS stop_ratio,
       |    CASE WHEN n_chars > 0
       |      THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END
       |      AS punct_ratio
       |  FROM m),
       |zt AS (SELECT doc_id, source,
       |    -2.0 + 4.0 * stop_ratio
       |      + 2.0 * (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0)
       |      - 3.0 * punct_ratio AS z
       |  FROM f),
       |chx AS (SELECT doc_id,
       |    list_filter(string_split(text, ''), x -> x <> '') AS chs
       |  FROM documents),
       |ex AS (SELECT doc_id, CAST(floor(
       |    (CASE WHEN len(chs) = 0 THEN 0.0 ELSE
       |      ln(CAST(len(chs) AS DOUBLE)) -
       |      list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(list_sort(list_distinct(chs)), c ->
       |          CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE) *
       |          ln(CAST(len(list_filter(chs, x -> x = c)) AS DOUBLE)))),
       |        (a, b) -> a + b) / CAST(len(chs) AS DOUBLE)
       |    END) * 1000000.0 + 0.5) AS BIGINT) AS e_micro
       |  FROM chx),
       |ee AS (SELECT d.source, v.vec_id AS doc_id,
       |    list_transform(v.embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
       |        AS BIGINT)) AS em
       |  FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id),
       |comp AS (SELECT source, k AS dim, CAST(sum(em[k+1]) AS BIGINT) AS s
       |  FROM ee, LATERAL (SELECT unnest(range(64)) AS k) t
       |  GROUP BY 1, 2),
       |cent AS (SELECT source, list(s ORDER BY dim) AS cm
       |  FROM comp GROUP BY 1),
       |sc AS (SELECT ee.doc_id,
       |    CAST(floor(${cosSql("em", "cm")} * 1000000.0 + 0.5) AS BIGINT)
       |      AS cos_micro
       |  FROM ee JOIN cent USING (source)),
       |g AS (SELECT zt.source, zt.doc_id,
       |    CASE WHEN z > 0 THEN 1 ELSE 0 END AS q_ok,
       |    CASE WHEN e_micro >= 2750000 AND e_micro <= 2900000
       |      THEN 1 ELSE 0 END AS h_ok,
       |    CASE WHEN cos_micro >= 50000 THEN 1 ELSE 0 END AS s_ok
       |  FROM zt JOIN ex USING (doc_id) JOIN sc USING (doc_id))
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(q_ok) AS BIGINT) AS n_quality_ok,
       |  CAST(sum(h_ok) AS BIGINT) AS n_entropy_ok,
       |  CAST(sum(s_ok) AS BIGINT) AS n_semantic_ok,
       |  CAST(sum(CASE WHEN q_ok = 1 AND h_ok = 1 AND s_ok = 1
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       |  round(CAST(sum(CASE WHEN q_ok = 1 AND h_ok = 1 AND s_ok = 1
       |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS yield_rate
       |FROM g GROUP BY 1""".stripMargin
  }

  // ---- x50: sequence-length bucketing (padding-waste report) ------

  /** x50: SEQUENCE-LENGTH BUCKETING — docs grouped into power-of-two
    * token-length buckets with the padding waste each bucket pays if
    * batched at its ceiling: the batching-efficiency report behind
    * every bucketed-batching / packing decision (x16 packs greedily;
    * x50 quantifies what plain padded batching would cost instead —
    * together they are the trade a training-input pipeline actually
    * evaluates). Zero-token docs land in the size-1 bucket by
    * definition.
    *
    * Exactness: the bucket ceiling is selected from an explicit
    * power-of-two list (integer compare — deliberately not
    * ceil(log2(n)), whose float round-trip can mis-bucket exact
    * powers of two); counts/sums are exact longs; the waste ratio
    * divides once at the edge.
    *
    * 100 TB shape: one tokenize pass row-local on the scan, then a
    * ≤14-row partial agg — count(*) cost. */
  def lengthBuckets(docsIn: DataFrame): DataFrame = {
    val pows = typedLit((0 to 13).map(k => 1L << k)) // 1 .. 8192
    val nTok = size(TextFunctions.tokens(col("text"))).cast("long")
    docsIn
      .select(greatest(nTok, lit(1L)).as("n_tokens"))
      .withColumn("bucket_max",
        array_min(filter(pows, p => p >= col("n_tokens"))))
      .groupBy(col("bucket_max"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("bucket_max"), col("n_docs"), col("total_tokens"),
        (col("bucket_max") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("total_tokens").cast("double") /
          (col("bucket_max") * col("n_docs")).cast("double"), 6)
          .as("waste_rate"))
  }

  def x50LengthBuckets(spark: SparkSession, dir: String): DataFrame =
    lengthBuckets(Tables.spread(Tables.documents(spark, dir)))

  val x50Sql: String = {
    val pows = (0 to 13).map(k => 1L << k).mkString("[", ", ", "]")
    s"""WITH t AS (SELECT greatest(CAST(len($tsSql) AS BIGINT), 1)
       |    AS n_tokens FROM documents),
       |b AS (SELECT n_tokens,
       |    CAST(list_min(list_filter($pows, p -> p >= n_tokens)) AS BIGINT)
       |      AS bucket_max
       |  FROM t)
       |SELECT bucket_max, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(bucket_max * count(*) AS BIGINT) AS padded_tokens,
       |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE) /
       |    CAST(bucket_max * count(*) AS DOUBLE), 6) AS waste_rate
       |FROM b GROUP BY 1""".stripMargin
  }

  // ---- x51: language-consistency (code-switch) profile ------------

  /** x51: LANGUAGE CONSISTENCY — x2's marker lang-ID applied per
    * 20-token SEGMENT instead of per document, counting the
    * transitions between consecutive segments' predictions: a doc
    * whose segments disagree is a concatenation artifact (crawler
    * glued pages, template + content in different languages, code
    * switched into prose) — the corpus defect a DOC-level lang-ID
    * (x2) structurally averages away. Reported per source: mixed-doc
    * count, total switches, worst doc.
    *
    * Exactness: marker scores are integer substring counts, segment
    * prediction is the same ≥-fold over integer scores both engines
    * replay, and switch counting is an integer fold over the
    * segment-prediction array in index order.
    *
    * 100 TB shape: entirely ROW-LOCAL — segmentation, per-segment
    * scoring and the switch fold are one narrow projection over the
    * scan (O(segments·markers) per doc), then the |sources|-row
    * partial agg. Nothing about the corpus shuffles. */
  def languageConsistency(docsIn: DataFrame, segTokens: Int): DataFrame = {
    import TextFunctions.bind
    val n = segTokens
    val segs = bind(TextFunctions.tokens(col("text")), ts =>
      when(size(ts) > 0,
        transform(
          sequence(lit(0), ((size(ts) + lit(n - 1)) / lit(n)).cast("int") - 1),
          i => concat_ws(" ", slice(ts, i * n + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
    def predFor(seg: Column): Column = {
      val t = concat(lit(" "), seg, lit(" "))
      val scores = LlmQueries.langMarkers.map { case (lang, ms) =>
        lang -> ms.map(m => length(t) - length(replace(t, lit(m), lit(""))))
          .reduce(_ + _)
      }
      scores.foldRight(lit(scores.last._1)) { case ((lang, s), els) =>
        when(scores.filter(_._1 != lang).map(_._2)
          .foldLeft(lit(true))((acc, o) => acc && s >= o), lang)
          .otherwise(els)
      }
    }
    val doc = docsIn.select(col("source"),
      bind(transform(segs, predFor(_)), preds =>
        when(size(preds) <= 1, 0L).otherwise(
          aggregate(sequence(lit(1), size(preds) - 1), lit(0L), (acc, i) =>
            acc + when(element_at(preds, i) =!= element_at(preds, i + 1), 1L)
              .otherwise(0L)))).as("n_switches"))
    doc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_switches") > 0, 1L).otherwise(0L)).as("n_mixed"),
        sum(col("n_switches")).as("switches_sum"),
        max(col("n_switches")).as("max_switches"))
      .select(col("source"), col("n_docs"), col("n_mixed"),
        col("switches_sum"), col("max_switches"),
        round(col("n_mixed").cast("double") / col("n_docs").cast("double"),
          6).as("mixed_rate"))
  }

  def x51LanguageConsistency(spark: SparkSession, dir: String): DataFrame =
    languageConsistency(Tables.spread(Tables.documents(spark, dir)), 20)

  val x51Sql: String = {
    val langs = LlmQueries.langMarkers.map(_._1)
    val scoreSql = LlmQueries.langMarkers.map { case (lang, ms) =>
      val terms = ms.map(m =>
        s"(length(t) - length(replace(t, '$m', '')))").mkString(" + ")
      s"($terms) AS s_$lang"
    }.mkString(",\n    ")
    val caseSql = langs.map { lang =>
      val conds = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o")
        .mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.dropRight(1).mkString("\n      ")
    s"""WITH tk AS (SELECT source, doc_id, $tsSql AS ts FROM documents),
       |sg AS (SELECT source, doc_id, CAST(i AS INT) AS idx,
       |    ' ' || array_to_string(ts[i*20+1 : i*20+20], ' ') || ' ' AS t
       |  FROM tk, LATERAL (SELECT
       |    unnest(range(CAST(ceil(len(ts)/20.0) AS INT))) AS i) u
       |  WHERE len(ts) > 0),
       |sc AS (SELECT source, doc_id, idx, $scoreSql FROM sg),
       |pr AS (SELECT source, doc_id, idx,
       |    CASE $caseSql ELSE '${langs.last}' END AS pred
       |  FROM sc),
       |sw AS (SELECT p.source, p.doc_id,
       |    CAST(count(*) FILTER (p.pred <> q.pred) AS BIGINT) AS n_sw
       |  FROM pr p JOIN pr q
       |    ON p.doc_id = q.doc_id AND q.idx = p.idx + 1
       |  GROUP BY 1, 2),
       |dc AS (SELECT d.source, d.doc_id,
       |    coalesce(sw.n_sw, 0) AS n_switches
       |  FROM documents d LEFT JOIN sw ON d.doc_id = sw.doc_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN n_switches > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_mixed,
       |  CAST(sum(n_switches) AS BIGINT) AS switches_sum,
       |  CAST(max(n_switches) AS BIGINT) AS max_switches,
       |  round(CAST(sum(CASE WHEN n_switches > 0 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 6) AS mixed_rate
       |FROM dc GROUP BY 1""".stripMargin
  }

  // ---- x52: repeated document-prefix detection --------------------

  /** x52: REPEATED PREFIX detection — the top document PREFIXES
    * (first 8 tokens) shared across the corpus, with doc and source
    * counts: boilerplate site headers, license preambles and
    * scraper banners cluster here, and stripping them is a standard
    * curation pass d8's in-document n-grams and d14's chunk dedup
    * don't isolate (they find repetition anywhere; x52 pins the
    * document BOUNDARY artifact). Only prefixes shared by ≥ 3 docs
    * surface.
    *
    * 100 TB shape: the prefix is row-local (one tokenize pass,
    * first 8 tokens); the agg shuffles one row per DOC (its single
    * prefix), partial-aggregated — count(*) cost; the top-20 is
    * TakeOrderedAndProject. */
  def prefixBoilerplate(docsIn: DataFrame, nTokens: Int,
      minDocs: Long, topK: Int): DataFrame = {
    val prefix = TextFunctions.bind(TextFunctions.tokens(col("text")), ts =>
      when(size(ts) >= nTokens,
        concat_ws(" ", slice(ts, 1, nTokens))).otherwise(lit(null)))
    docsIn
      .select(col("source"), prefix.as("prefix"))
      .filter(col("prefix").isNotNull)
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("prefix"))
      .limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_docs").desc, col("prefix"))).cast("int"))
  }

  def x52PrefixBoilerplate(spark: SparkSession, dir: String): DataFrame =
    prefixBoilerplate(Tables.spread(Tables.documents(spark, dir)),
      nTokens = 8, minDocs = 3L, topK = 20)

  val x52Sql: String =
    s"""WITH t AS (SELECT source, $tsSql AS ts FROM documents),
       |p AS (SELECT source, array_to_string(ts[1:8], ' ') AS prefix
       |  FROM t WHERE len(ts) >= 8),
       |a AS (SELECT prefix, count(*) AS n_docs,
       |    count(DISTINCT source) AS n_sources
       |  FROM p GROUP BY 1 HAVING count(*) >= 3),
       |r AS (SELECT prefix, n_docs, n_sources, CAST(row_number() OVER
       |    (ORDER BY n_docs DESC, prefix) AS INT) AS rnk FROM a)
       |SELECT prefix, n_docs, n_sources, rnk FROM r WHERE rnk <= 20""".stripMargin

  // ---- x42: curation capstone v3 (per-source health report) -------

  /** x42: curation capstone v3 — the round's new primitives composed
    * into ONE per-source corpus-health report: sub-document
    * duplicate mass from the d14 chunk-dedup core (how much of each
    * source is boilerplate already seen elsewhere) next to the x37
    * cross-corpus perplexity gate (how much a reference-LM quality
    * filter would drop), closed with a combined clean_rate =
    * (kept_chunks/chunks)·(unflagged/docs) — the number a data lead
    * reads to decide which feed to renegotiate. x10/x20 compose the
    * d9+x14 families; x42 is the same "it composes in one Catalyst
    * plan" statement for the round-7 additions.
    *
    * Exactness: both inputs are already hash-gate-exact (d14 counts
    * are integers; x37 flags come from micro-unit integer compares);
    * clean_rate multiplies the two exact-integer ratios in the same
    * written order on both engines and rounds once at the edge. */
  def x42CurationV3(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    val chunkStats = chunkDedup(docs, 12)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_chunks")).as("n_chunks"),
        sum(col("n_kept")).as("n_kept_chunks"))
    x37PerplexityFilter(spark, dir)
      .select(col("source"), col("n_docs"), col("n_flagged"))
      .join(chunkStats, "source")
      .select(col("source"), col("n_docs"), col("n_chunks"),
        col("n_kept_chunks"), col("n_flagged"),
        when(col("n_chunks") > 0 && col("n_docs") > 0,
          round((col("n_kept_chunks").cast("double") / col("n_chunks"))
            * ((col("n_docs") - col("n_flagged")).cast("double")
              / col("n_docs")), 6))
          .otherwise(lit(0.0)).as("clean_rate"))
  }

  val x42Sql: String =
    s"""WITH toks AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |ch AS (SELECT doc_id, CAST(i AS INT) AS idx,
       |    array_to_string(ts[i*12+1 : i*12+12], ' ') AS chunk
       |  FROM toks, LATERAL (SELECT
       |    unnest(range(CAST(ceil(len(ts)/12.0) AS INT))) AS i) t
       |  WHERE len(ts) > 0),
       |occ AS (SELECT doc_id, md5(chunk) AS ck,
       |    doc_id*100000 + idx AS ord FROM ch),
       |keep AS (SELECT ck, min(ord) AS keep_ord FROM occ GROUP BY 1),
       |cs AS (SELECT d.source,
       |    CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(count(*) FILTER (o.ord = k.keep_ord) AS BIGINT)
       |      AS n_kept_chunks
       |  FROM occ o JOIN keep k USING (ck)
       |  JOIN documents d USING (doc_id)
       |  GROUP BY 1),
       |ppl AS (SELECT source, n_docs, n_flagged FROM (
       |${x37Sql}
       |))
       |SELECT source, n_docs, n_chunks, n_kept_chunks, n_flagged,
       |  CASE WHEN n_chunks > 0 AND n_docs > 0 THEN
       |    round((CAST(n_kept_chunks AS DOUBLE) / n_chunks)
       |      * (CAST(n_docs - n_flagged AS DOUBLE) / n_docs), 6)
       |  ELSE 0.0 END AS clean_rate
       |FROM ppl JOIN cs USING (source)""".stripMargin

  // ---- x53: hashed importance weighting (DSIR-style selection) -----

  /** x53: IMPORTANCE WEIGHTING for targeted data selection — the
    * hashed-feature importance-resampling recipe (DSIR, Xie et al.
    * 2023): score every raw document by how much its token
    * distribution looks like a TARGET domain (here the `targetSource`
    * docs stand in for the high-quality target), using hashed unigram
    * buckets so the feature space is fixed-width regardless of
    * vocabulary. Bucket weights are the target/raw frequency RATIO in
    * integer micro-units (w_b = t_b·1e6 div r_b — the ratio form of
    * DSIR's log-ratio, chosen because floor division is cross-engine
    * exact where a float log sum is summation-order-poisoned); a
    * doc's importance is its count-weighted bucket sum per token, and
    * the report is the top-`topK` selection (ties broken by doc_id).
    * Zero-token docs carry no evidence and drop out of scoring.
    *
    * 100 TB shape: ONE token scan feeds both distributions (the
    * target mass is a conditional sum inside the same per-bucket
    * partial agg — no second pass); bucket weights fold to a
    * `buckets`-row broadcast; per-doc scoring is a (doc, bucket)
    * partial agg + broadcast join; selection is
    * TakeOrderedAndProject (per-partition heap + driver merge of
    * topK rows), never a global sort. */
  def importanceWeights(docs: DataFrame, targetSource: String,
      buckets: Int = 512, topK: Int = 100): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .withColumn("bucket", TextFunctions.polyHash(col("t")) % buckets)
    val bstats = tok.groupBy(col("bucket"))
      .agg(count(lit(1)).as("r_b"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L))
          .as("t_b"))
      .withColumn("w_micro", expr("t_b * 1000000 div r_b"))
    val perDocBucket = tok
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("c_b"))
    perDocBucket
      .join(broadcast(bstats.select(col("bucket"), col("w_micro"))),
        Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c_b") * col("w_micro")).as("score_micro"),
        sum(col("c_b")).as("n_tok"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr("score_micro div n_tok").as("imp_micro"))
      .orderBy(col("imp_micro").desc, col("doc_id"))
      .limit(topK)
  }

  def x53ImportanceWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeights(Tables.spread(Tables.documents(spark, dir)), "src0")

  val x53Sql: String =
    s"""WITH tk AS (SELECT doc_id, source, unnest($tsSql) AS t
       |  FROM documents),
       |tb AS (SELECT doc_id, source, ${polySql("t")} % 512 AS bucket
       |  FROM tk),
       |bs AS (SELECT bucket, count(*) AS r_b,
       |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS t_b
       |  FROM tb GROUP BY 1),
       |w AS (SELECT bucket, CAST(t_b * 1000000 // r_b AS BIGINT)
       |    AS w_micro FROM bs),
       |db AS (SELECT doc_id, source, bucket, count(*) AS c_b
       |  FROM tb GROUP BY 1, 2, 3),
       |sc AS (SELECT doc_id, source,
       |    CAST(sum(c_b * w_micro) AS BIGINT) AS score_micro,
       |    CAST(sum(c_b) AS BIGINT) AS n_tok
       |  FROM db JOIN w USING (bucket) GROUP BY 1, 2)
       |SELECT doc_id, source, n_tok, score_micro // n_tok AS imp_micro
       |FROM sc ORDER BY imp_micro DESC, doc_id LIMIT 100""".stripMargin

  // ---- x54: vocabulary coverage / OOV audit ------------------------

  /** x54: VOCABULARY COVERAGE — the out-of-vocabulary audit every
    * tokenizer/corpus pairing needs: fix the reference vocabulary as
    * the TOP-V tokens of the target source (count desc, token asc —
    * fully deterministic), then report per source how much of its
    * token mass and how many of its distinct types fall outside it.
    * High OOV = domain shift the tokenizer will shatter into bytes;
    * the per-source rate is the routing signal (x18's corpus mixing
    * consumes exactly this kind of column). Rates are integer
    * micro-units (n_oov·1e6 div n), exact on any engine.
    *
    * 100 TB shape: one token explode feeds the vocab build (top-V =
    * TakeOrderedAndProject over the target's token partial agg —
    * never a global sort) and the audit (broadcast the V-row vocab,
    * conditional partial aggs per source). Nothing shuffles except
    * one (source) and two (token) partial aggs. */
  def vocabCoverage(docs: DataFrame, targetSource: String,
      vocabSize: Int = 200): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      explode(TextFunctions.tokens(col("text"))).as("t"))
    val vocab = tok.filter(col("source") === targetSource)
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1).as("in_vocab"))
    val marked = tok.join(broadcast(vocab), Seq("t"), "left")
    val inst = marked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    val types = marked.select(col("source"), col("t"), col("in_vocab"))
      .distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("n_oov_types"))
    inst.join(types, Seq("source"))
      .select(col("source"), col("n_tok"), col("n_oov"),
        expr("n_oov * 1000000 div n_tok").as("oov_micro"),
        col("n_types"), col("n_oov_types"),
        expr("n_oov_types * 1000000 div n_types").as("oov_type_micro"))
  }

  def x54VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.spread(Tables.documents(spark, dir)), "src0")

  val x54Sql: String =
    s"""WITH tk AS (SELECT doc_id, source, unnest($tsSql) AS t
       |  FROM documents),
       |vc AS (SELECT t FROM (SELECT t, count(*) AS cnt FROM tk
       |    WHERE source = 'src0' GROUP BY 1
       |    ORDER BY cnt DESC, t LIMIT 200)),
       |mk AS (SELECT tk.source, tk.t,
       |    CASE WHEN vc.t IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tk LEFT JOIN vc ON vc.t = tk.t),
       |inst AS (SELECT source, count(*) AS n_tok,
       |    CAST(sum(oov) AS BIGINT) AS n_oov FROM mk GROUP BY 1),
       |ty AS (SELECT source, count(*) AS n_types,
       |    CAST(sum(oov) AS BIGINT) AS n_oov_types
       |  FROM (SELECT DISTINCT source, t, oov FROM mk) GROUP BY 1)
       |SELECT source, n_tok, n_oov,
       |  n_oov * 1000000 // n_tok AS oov_micro,
       |  n_types, n_oov_types,
       |  n_oov_types * 1000000 // n_types AS oov_type_micro
       |FROM inst JOIN ty USING (source)""".stripMargin

  // ---- x55: largest-remainder budget apportionment -----------------

  /** x55: EXACT BUDGET APPORTIONMENT — split an integer sampling
    * budget (N=1000 slots) across languages proportional to token
    * mass with the largest-remainder (Hamilton) method: floor quotas
    * first, then the leftover slots go to the largest remainders
    * ((N·c) mod total, ties to the lang string). The allocation the
    * float-rate mixers (x19/x27) cannot make: Σ final = N EXACTLY,
    * no rounding drift, every step integer — the apportionment
    * problem every fixed-token-budget training mix solves.
    *
    * 100 TB shape: the corpus collapses to one |langs|-row partial
    * agg; the total folds to a broadcast row; the remainder ranking
    * is a window over |langs| rows. Corpus-size-independent after
    * the first agg. */
  def apportion(docs: DataFrame, budget: Long = 1000L): DataFrame = {
    val counts = docs.select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_tokens"))
    val total = counts.agg(sum(col("n_tokens")).as("total"))
    val based = counts.crossJoin(broadcast(total))
      .withColumn("floor_quota",
        expr(s"$budget * n_tokens div total"))
      .withColumn("rem", expr(s"($budget * n_tokens) % total"))
    val leftover = based
      .agg((lit(budget) - sum(col("floor_quota"))).as("leftover"))
    val w = Window.orderBy(col("rem").desc, col("lang"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(w))
      .select(col("lang"), col("n_tokens"), col("floor_quota"),
        when(col("rk") <= col("leftover"), 1L).otherwise(0L).as("extra"))
      .withColumn("final_quota", col("floor_quota") + col("extra"))
  }

  def x55Apportion(spark: SparkSession, dir: String): DataFrame =
    apportion(Tables.spread(Tables.documents(spark, dir)))

  val x55Sql: String =
    s"""WITH tk AS (SELECT lang, unnest($tsSql) AS t FROM documents),
       |c AS (SELECT lang, count(*) AS n_tokens FROM tk GROUP BY 1),
       |t AS (SELECT sum(n_tokens) AS total FROM c),
       |b AS (SELECT lang, n_tokens,
       |    1000 * n_tokens // total AS floor_quota,
       |    (1000 * n_tokens) % total AS rem
       |  FROM c CROSS JOIN t),
       |lo AS (SELECT 1000 - sum(floor_quota) AS leftover FROM b),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang)
       |    AS rk FROM b)
       |SELECT lang, n_tokens, CAST(floor_quota AS BIGINT) AS floor_quota,
       |  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |    AS extra,
       |  CAST(floor_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
       |    AS BIGINT) AS final_quota
       |FROM r CROSS JOIN lo""".stripMargin
  // ---- x57: weighted priority sampling -----------------------------

  /** x57: WEIGHTED PRIORITY SAMPLING (Duffield/Lund/Thorup's
    * priority-sample shape, with the uniform draw replaced by the
    * deterministic poly_hash so both engines agree bit-for-bit):
    * each doc gets priority = hash div weight (weight = n_chars, so
    * longer docs are proportionally more likely to win) and the
    * k = 60 smallest priorities form the sample. This is the
    * weight-proportional selection x12's per-language Bernoulli
    * gates cannot make — one knob (k) yields an exact-size,
    * weight-biased, seed-reproducible sample.
    *
    * 100 TB shape: priority is a row-local codegen'd expression and
    * the global smallest-k cut plans as TakeOrderedAndProject
    * (per-partition top-k, then a k-row driver merge — never a
    * global sort); the rank is a window over the 60 surviving rows
    * only. */
  def x57PrioritySample(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("poly_hash(text) div n_chars").as("priority"))
    val top = base.orderBy(col("priority"), col("doc_id")).limit(60)
    top.withColumn("rk", row_number().over(
      Window.orderBy(col("priority"), col("doc_id"))).cast("int"))
  }

  val x57Sql: String =
    s"""WITH b AS (SELECT doc_id, lang, n_chars,
       |    ${polySql("text")} // n_chars AS priority
       |  FROM documents WHERE n_chars > 0),
       |t AS (SELECT * FROM b ORDER BY priority, doc_id LIMIT 60)
       |SELECT doc_id, lang, n_chars, CAST(priority AS BIGINT) AS priority,
       |  CAST(row_number() OVER (ORDER BY priority, doc_id) AS INT) AS rk
       |FROM t""".stripMargin

  // ---- x58: n-gram novelty score -----------------------------------

  /** x58: N-GRAM NOVELTY — per document, what fraction of its
    * distinct word-5-grams appear for the FIRST time in the corpus'
    * doc_id order (gram's min doc_id = this doc): the marginal-
    * contribution metric behind dedup-aware data valuation (a doc
    * whose grams all appeared earlier adds nothing d8's boilerplate
    * profile or the d-family's near-dup nets would keep) — the
    * per-doc complement of d8's per-gram view. Integer end-to-end:
    * counts are exact longs, novelty is one micro-unit floor
    * division per doc.
    *
    * 100 TB shape: one tokens() pass → row-local gram explode →
    * distinct (gram, doc) partial agg; first-occurrence is a
    * gram-keyed partial-agg min; attribution is ONE gram-keyed
    * equi-join + a doc-keyed partial agg. The gram key would be
    * poly-hashed to 8 bytes before the exchange at scale (the d8
    * note); docs under 5 tokens have no grams and are absent by
    * contract on both engines. */
  def x58Novelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = wordGrams(Tables.spread(Tables.documents(spark, dir)), 5)
      .distinct()
    val first = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro", expr("n_novel * 1000000 div n_grams"))
  }

  val x58Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |g AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i + 4], ' ')
       |    AS gram
       |  FROM t, unnest(range(1, len(ts) - 3)) r(i)
       |  WHERE len(ts) >= 5),
       |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
       |SELECT g.doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    * 1000000 // count(*) AS BIGINT) AS novelty_micro
       |FROM g JOIN f USING (gram) GROUP BY 1""".stripMargin
  // ---- x60: decontamination gram-length sweep ----------------------

  /** x60: DECONTAMINATION GRAM-LENGTH SWEEP — the x22 check run at
    * the published card sweep widths (8/10/13-token grams, the
    * GPT-3→PaLM range), summarized per (width, split): contaminated
    * eval docs and total shared grams. The d15/s28 tuning-curve
    * pattern applied to the third tunable family: width 8 is the
    * strict net (most flags), 13 the near-verbatim one — the sweep
    * is the evidence for choosing a width instead of inheriting one.
    *
    * 100 TB shape: each arm is x22's plan (row-local gram hashing,
    * one gram-keyed equi-join against the train side, doc-keyed
    * partial agg) collapsing to ≤|splits| rows before the union;
    * arms share nothing but the scan, so the sweep parallelizes
    * trivially and costs ~3× one check. */
  def x60DecontamSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
    Seq(8, 10, 13).map { n =>
      ngramDecontaminate(docs, n)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_contaminated_docs"),
          sum(col("n_shared_grams")).as("total_shared_grams"))
        .select(lit(n).as("n_gram"), col("split"),
          col("n_contaminated_docs"), col("total_shared_grams"))
    }.reduce(_ unionByName _)
  }

  val x60Sql: String = {
    val splitSql =
      s"""CASE WHEN ${polySql("CAST(doc_id AS VARCHAR)")} % 10 < 8 THEN 'train'
         |    WHEN ${polySql("CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
         |    ELSE 'test' END""".stripMargin
    val arms = Seq(8, 10, 13)
    val perN = arms.map { n =>
      s"""g$n AS (SELECT DISTINCT doc_id, split,
         |    ${polySql(s"array_to_string(ts[i:i + ${n - 1}], ' ')")} AS gram
         |  FROM tk, unnest(range(1, len(ts) - ${n - 2})) r(i)
         |  WHERE len(ts) >= $n),
         |tg$n AS (SELECT gram FROM g$n WHERE split = 'train' GROUP BY 1),
         |c$n AS (SELECT CAST($n AS INT) AS n_gram, split,
         |    count(*) AS n_contaminated_docs,
         |    CAST(sum(nsg) AS BIGINT) AS total_shared_grams
         |  FROM (SELECT doc_id, split, count(*) AS nsg
         |        FROM g$n JOIN tg$n USING (gram)
         |        WHERE split <> 'train' GROUP BY 1, 2)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH tk AS (SELECT doc_id, $splitSql AS split, $tsSql AS ts
       |  FROM documents),
       |$perN
       |${arms.map(n => s"SELECT * FROM c$n").mkString("\nUNION ALL\n")}""".stripMargin
  }
  // ---- x61: count-min sketch error report --------------------------

  /** x61: COUNT-MIN SKETCH vs exact counts — build the classic d=3 ×
    * w=1024 CMS over the token stream (bucket = row-salted poly_hash
    * mod w; COUNTS, not items, so the aggregation state is d·w longs
    * no matter the vocabulary) and report, for each ≥1/64-share
    * heavy hitter (x36's selection), the exact count, the CMS
    * estimate (min over rows of the term's bucket count), and the
    * overestimate. CMS is deterministic given its hash family, so
    * unlike x6's HLL the WHOLE sketch restates in SQL and the driver
    * hash gate applies — and the report demonstrates the guarantee
    * users rely on (est ≥ true always; overestimate bounded by
    * collisions). x36 answers "who is heavy" with a per-key state
    * sketch; x61 answers "how accurate is the fixed-memory count"
    * — the two sketch families a streaming counter chooses between.
    *
    * 100 TB shape: the sketch is ONE partial-agg shuffle collapsing
    * to ≤ d·w = 3072 rows regardless of corpus or vocabulary size
    * (the entire point vs the exact per-term agg whose key domain is
    * the vocabulary); the heavy side reuses the exact agg and the
    * probe is a 3072-row broadcast join. */
  def x61CountMin(spark: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L
    val d = 3
    val w = 1024
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
    def bucket(r: Int): Column =
      (TextFunctions.polyHash(col("term")) * (2 * r + 1) + lit(7919L * r)) %
        P % w
    val rows = toks.select(col("term"), explode(array((0 until d).map(r =>
      struct(lit(r).as("r"), bucket(r).as("bucket"))): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val sketch = rows.groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("n"))
    val heavy = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * 64 >= col("n"))
      .select(col("term"), col("cnt"))
    val probes = heavy.select(col("term"), col("cnt"),
      explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucket(r).as("bucket"))): _*)).as("rb"))
      .select(col("term"), col("cnt"), col("rb.r").as("r"),
        col("rb.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("term"), col("cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("term"), col("cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("overestimate"))
  }

  val x61Sql: String =
    s"""WITH tk AS (SELECT unnest($tsSql) AS term FROM documents),
       |tot AS (SELECT count(*) AS n FROM tk),
       |rws AS (SELECT (${polySql("term")} * (2*r + 1) + 7919*r)
       |      % 2147483647 % 1024 AS bucket, r
       |  FROM tk CROSS JOIN range(3) t(r)),
       |sk AS (SELECT r, bucket, count(*) AS c FROM rws GROUP BY 1, 2),
       |hv AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1),
       |hh AS (SELECT term, cnt FROM hv CROSS JOIN tot
       |  WHERE cnt * 64 >= n),
       |pb AS (SELECT term, cnt, r,
       |    (${polySql("term")} * (2*r + 1) + 7919*r) % 2147483647 % 1024
       |      AS bucket
       |  FROM hh CROSS JOIN range(3) t(r)),
       |est AS (SELECT term, cnt, CAST(min(c) AS BIGINT) AS cms_est
       |  FROM pb JOIN sk USING (r, bucket) GROUP BY 1, 2)
       |SELECT term, cnt, cms_est, cms_est - cnt AS overestimate
       |FROM est""".stripMargin

  // ---- x62: bottom-k (KMV) sketch Jaccard across languages ---------

  /** x62: KMV/BOTTOM-K SKETCH JACCARD — per language pair, the
    * vocabulary Jaccard estimated from each side's k = 128 smallest
    * distinct term hashes (Bar-Yossef et al.'s K-Minimum-Values
    * sketch: J ≈ |A_sk ∩ B_sk ∩ bottom-k(A ∪ B)| / k), reported
    * next to the exact Jaccard and the signed error. This is the
    * third sketch-accuracy report after x36/x61 (heavy hitters,
    * count-min): set RESEMBLANCE from fixed memory — how a pipeline
    * compares two corpora's vocabularies without ever joining them.
    * The hash family is deterministic (poly_hash), so unlike HLL
    * (x6) the whole sketch restates in SQL and the hash gate
    * applies.
    *
    * 100 TB shape: one (lang, term) dedup shuffle feeds BOTH the
    * sketches and the exact side; each sketch collapses to k rows
    * per language via a lang-keyed rank (partial top-k under
    * WindowGroupLimit), so every pairwise comparison runs on
    * k·L broadcast-size rows — the exact intersection (one
    * term-keyed join) is only there to certify the estimate and
    * would be dropped at scale. */
  def x62KmvJaccard(spark: SparkSession, dir: String): DataFrame =
    kmvJaccard(Tables.spread(Tables.documents(spark, dir))
      .select(col("lang"), explode(TextFunctions.tokens(col("text")))
        .as("term")), k = 128)

  /** DataFrame-taking core of x62 ((lang, term) rows, pre-distinct
    * not required) — specs assert the estimate against exact Jaccard
    * on constructed vocabularies. */
  def kmvJaccard(lt0: DataFrame, k: Int): DataFrame = {
    val lt = lt0.select(col("lang"), col("term")).distinct()
      .localCheckpoint(true)
    val lh = lt.select(col("lang"), TextFunctions.polyHash(col("term"))
      .as("h")).distinct()
    val wk = Window.partitionBy(col("lang")).orderBy(col("h"))
    val sk = lh.withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= k).select(col("lang"), col("h"))
      .localCheckpoint(true)
    val pairs = sk.select(col("lang").as("lang_a")).distinct()
      .join(sk.select(col("lang").as("lang_b")).distinct(),
        col("lang_a") < col("lang_b"))
    // membership-flagged union of the two sketches per pair (sketches
    // are k·L rows — all joins below are broadcast-size)
    val aVals = pairs.join(sk.select(col("lang").as("lang_a"), col("h")),
      Seq("lang_a"))
    val bVals = pairs.join(sk.select(col("lang").as("lang_b"), col("h")),
      Seq("lang_b"))
    val merged = aVals.select(col("lang_a"), col("lang_b"), col("h"))
      .unionByName(bVals.select(col("lang_a"), col("lang_b"), col("h")))
      .distinct()
      .join(broadcast(sk.select(col("lang").as("lang_a"), col("h"),
        lit(1L).as("in_a"))), Seq("lang_a", "h"), "left")
      .join(broadcast(sk.select(col("lang").as("lang_b"), col("h"),
        lit(1L).as("in_b"))), Seq("lang_b", "h"), "left")
    val wp = Window.partitionBy(col("lang_a"), col("lang_b"))
      .orderBy(col("h"))
    val est = merged.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= k)
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("k_used"),
        sum(coalesce(col("in_a"), lit(0L)) * coalesce(col("in_b"), lit(0L)))
          .as("n_shared"))
    // exact side: one term-keyed intersection + per-lang sizes
    val sizes = lt.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val inter = lt.select(col("lang").as("lang_a"), col("term"))
      .join(lt.select(col("lang").as("lang_b"), col("term")), Seq("term"))
      .filter(col("lang_a") < col("lang_b"))
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("n_inter"))
    // left join + coalesce: a DISJOINT pair (no shared terms) must
    // still report, with exact_ppm = 0 — dropping it would silently
    // hide exactly the "these corpora share nothing" answer
    est.join(inter, Seq("lang_a", "lang_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .join(broadcast(sizes.select(col("lang").as("lang_a"),
        col("n").as("n_a"))), Seq("lang_a"))
      .join(broadcast(sizes.select(col("lang").as("lang_b"),
        col("n").as("n_b"))), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("k_used"),
        floor(col("n_shared") * 1000000L / col("k_used")).cast("long")
          .as("est_ppm"),
        floor(col("n_inter") * 1000000L /
          (col("n_a") + col("n_b") - col("n_inter"))).cast("long")
          .as("exact_ppm"))
      .withColumn("err_ppm", col("est_ppm") - col("exact_ppm"))
  }

  val x62Sql: String =
    s"""WITH lt AS (SELECT DISTINCT lang, unnest($tsSql) AS term
       |  FROM documents),
       |lh AS (SELECT DISTINCT lang, ${polySql("term")} AS h FROM lt),
       |sk AS (SELECT lang, h FROM (SELECT lang, h,
       |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
       |  FROM lh) WHERE rn <= 128),
       |pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b
       |  FROM (SELECT DISTINCT lang FROM sk) a
       |  JOIN (SELECT DISTINCT lang FROM sk) b ON a.lang < b.lang),
       |mg AS (SELECT DISTINCT lang_a, lang_b, h FROM (
       |  SELECT pr.lang_a, pr.lang_b, s.h FROM pr
       |    JOIN sk s ON s.lang = pr.lang_a
       |  UNION ALL
       |  SELECT pr.lang_a, pr.lang_b, s.h FROM pr
       |    JOIN sk s ON s.lang = pr.lang_b)),
       |fl AS (SELECT m.lang_a, m.lang_b, m.h,
       |    CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
       |    CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
       |  FROM mg m
       |  LEFT JOIN sk sa ON sa.lang = m.lang_a AND sa.h = m.h
       |  LEFT JOIN sk sb ON sb.lang = m.lang_b AND sb.h = m.h),
       |es AS (SELECT lang_a, lang_b, count(*) AS k_used,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS n_shared
       |  FROM (SELECT lang_a, lang_b, h, in_a, in_b,
       |      row_number() OVER (PARTITION BY lang_a, lang_b ORDER BY h)
       |        AS rn FROM fl)
       |  WHERE rn <= 128 GROUP BY 1, 2),
       |sz AS (SELECT lang, count(*) AS n FROM lt GROUP BY 1),
       |iv AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
       |    count(*) AS n_inter
       |  FROM lt a JOIN lt b ON a.term = b.term AND a.lang < b.lang
       |  GROUP BY 1, 2)
       |SELECT es.lang_a, es.lang_b, CAST(k_used AS BIGINT) AS k_used,
       |  CAST(floor(n_shared * 1000000 / k_used) AS BIGINT) AS est_ppm,
       |  CAST(floor(coalesce(n_inter, 0) * 1000000
       |    / (sa.n + sb.n - coalesce(n_inter, 0))) AS BIGINT)
       |    AS exact_ppm,
       |  CAST(floor(n_shared * 1000000 / k_used)
       |    - floor(coalesce(n_inter, 0) * 1000000
       |      / (sa.n + sb.n - coalesce(n_inter, 0))) AS BIGINT)
       |    AS err_ppm
       |FROM es LEFT JOIN iv
       |  ON es.lang_a = iv.lang_a AND es.lang_b = iv.lang_b
       |JOIN sz sa ON sa.lang = es.lang_a
       |JOIN sz sb ON sb.lang = es.lang_b""".stripMargin

  // ---- x63: PMI collocation mining ---------------------------------

  /** x63: COLLOCATION MINING — the top-50 adjacent-token bigrams by
    * pointwise-mutual-information LIFT (p(ab) / (p(a)·p(b)), the
    * exponential of PMI and therefore the same ranking), with a
    * min-support gate of 5 — the classic phrase detector (Mikolov et
    * al.'s word2vec phrases, Manning & Schütze ch. 5) a tokenizer
    * pipeline runs to promote "new york"-style units before BPE.
    * Lift is kept hash-stable WITHOUT logs: both engines evaluate
    * the identical left-associated double expression
    * 1e6·c_ab·N·N / (B·c_a·c_b), and IEEE multiply/divide are
    * correctly rounded, so the floored ppm matches bit-for-bit
    * (ln is not IEEE-exact and never enters the plan).
    *
    * 100 TB shape: bigram and unigram counts are two partial-agg
    * shuffles whose key domains are the vocabulary (≪ corpus);
    * attaching c_a/c_b is two vocabulary-keyed equi-joins; totals
    * are one-row broadcast folds; the final top-50 is
    * TakeOrderedAndProject (per-partition heads, never a global
    * sort of the bigram table). */
  def x63Collocations(spark: SparkSession, dir: String): DataFrame =
    collocations(Tables.spread(Tables.documents(spark, dir)),
      minSupport = 5, topK = 50)

  /** DataFrame-taking core of x63 (docs with `text`) — specs assert
    * lift arithmetic and support gating on constructed corpora. */
  def collocations(docs: DataFrame, minSupport: Int, topK: Int): DataFrame = {
    val tk = docs
      .select(TextFunctions.tokens(col("text")).as("ts"))
      .localCheckpoint(true)
    val uni = tk.select(explode(col("ts")).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTot = uni.agg(count(lit(1)).as("n"))
    val bg = tk.filter(size(col("ts")) >= 2)
      .select(explode(TextFunctions.bind(col("ts"), ts =>
        transform(sequence(lit(1), size(ts) - 1), i =>
          struct(element_at(ts, i).as("w1"),
            element_at(ts, i + 1).as("w2"))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val bTot = bg.agg(count(lit(1)).as("b"))
    bc.filter(col("n_ab") >= minSupport)
      .join(uc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nTot))
      .crossJoin(broadcast(bTot))
      .select(col("w1"), col("w2"), col("n_ab"),
        floor(lit(1000000.0) * col("n_ab") * col("n") * col("n") /
          (col("b").cast("double") * col("c_a") * col("c_b")))
          .cast("long").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  val x63Sql: String =
    s"""WITH tk AS (SELECT $tsSql AS ts FROM documents),
       |u AS (SELECT unnest(ts) AS w FROM tk),
       |uc AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
       |nt AS (SELECT count(*) AS n FROM u),
       |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
       |  FROM tk, unnest(range(1, len(ts))) r(i)
       |  WHERE len(ts) >= 2),
       |bc AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
       |bt AS (SELECT count(*) AS b FROM bg)
       |SELECT w1, w2, n_ab,
       |  CAST(floor(1000000.0 * n_ab * nt.n * nt.n /
       |    (CAST(bt.b AS DOUBLE) * a.c * b2.c)) AS BIGINT) AS lift_ppm
       |FROM bc JOIN uc a ON a.w = bc.w1
       |JOIN uc b2 ON b2.w = bc.w2
       |CROSS JOIN nt CROSS JOIN bt
       |WHERE n_ab >= 5
       |ORDER BY lift_ppm DESC, w1, w2 LIMIT 50""".stripMargin

  // ---- x65: RAG chunk map (overlapping token windows) -------------

  /** x65: the RETRIEVAL-chunking counterpart of x16/x21's training
    * packer — every document split into overlapping fixed-width
    * token windows (window 64, stride 48 → 16-token overlap), each
    * chunk addressed by (doc_id, chunk_id, token span) and
    * content-fingerprinted with the corpus' poly-hash so a vector
    * store can key embeddings to exact source spans. x21 bin-packs
    * WHOLE docs into disjoint shards for a trainer; this emits the
    * overlapping intra-doc map an indexer feeds to the s-family.
    *
    * Chunk i covers tokens [i·S, i·S+W); the count is
    * ⌈max(n−W,0)/S⌉+1 so the final window always reaches the last
    * token and short docs yield exactly one chunk. The fingerprint
    * is the left fold (a·31 + poly_hash(tok)) mod 1e9+7 over the
    * chunk's tokens — associativity-free by construction, so both
    * engines hash identically.
    *
    * 100 TB shape: ZERO shuffles — tokenize, count, sequence-explode
    * and fold are all row-local projections inside one scan; output
    * fan-out is bounded by n_tok/S per doc. The chunk map streams
    * straight to a partitioned writer; nothing wide ever forms. */
  def ragChunks(docsIn: DataFrame, window: Int, stride: Int): DataFrame = {
    val w = lit(window.toLong)
    val s = lit(stride.toLong)
    docsIn
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      .withColumn("n_tok", size(col("ts")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L),
        (greatest(col("n_tok") - w, lit(0L)) + (s - lit(1L)))
          .divide(s).cast("long"))))
      .withColumn("tok_start", col("chunk_id") * s)
      .withColumn("tok_end", least(col("tok_start") + w, col("n_tok")))
      .select(col("doc_id"), col("chunk_id"), col("tok_start"),
        col("tok_end"),
        (col("tok_end") - col("tok_start")).as("n_chunk_tok"),
        aggregate(
          transform(
            slice(col("ts"), (col("tok_start") + 1).cast("int"),
              (col("tok_end") - col("tok_start")).cast("int")),
            t => TextFunctions.polyHash(t)),
          lit(0L),
          (acc, hv) => (acc * 31 + hv) % 1000000007L).as("chunk_hash"))
  }

  def x65RagChunks(spark: SparkSession, dir: String): DataFrame =
    ragChunks(Tables.documents(spark, dir), window = 64, stride = 48)

  val x65Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |n AS (SELECT doc_id, ts, len(ts) AS n_tok FROM t
       |  WHERE len(ts) > 0),
       |c AS (SELECT doc_id, ts, n_tok,
       |    unnest(range(((greatest(n_tok - 64, 0) + 47) // 48) + 1))
       |      AS chunk_id
       |  FROM n)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * 48 AS BIGINT) AS tok_start,
       |  CAST(least(chunk_id * 48 + 64, n_tok) AS BIGINT) AS tok_end,
       |  CAST(least(chunk_id * 48 + 64, n_tok) - chunk_id * 48 AS BIGINT)
       |    AS n_chunk_tok,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(
       |        list_slice(ts, chunk_id * 48 + 1,
       |          least(chunk_id * 48 + 64, n_tok)),
       |        tkn -> ${polySql("tkn")})),
       |    (acc, hv) -> (acc * 31 + hv) % 1000000007) AS chunk_hash
       |FROM c""".stripMargin

  // ---- x66: RAG corpus build (capstone) ---------------------------

  /** x66: the RAG-INGESTION capstone — the end-to-end chunk-store
    * build a retrieval system runs nightly, chained from four
    * already-audited operators in ONE Catalyst plan: exact dedup
    * survivorship (d1's min-id-per-md5), the x1 quality gate
    * (score ≥ 0.5 — drops empty/short/punct-heavy junk), x65's overlapping 64/48 chunk map over the kept docs,
    * and cross-document CHUNK dedup (first (doc_id, chunk_id) owner
    * per chunk fingerprint — boilerplate chunks shared across
    * barely-different docs collapse at chunk granularity even when
    * whole-doc dedup kept both). Output: the per-source yield
    * report (docs in → docs kept → chunks → unique chunks → unique
    * tokens) a corpus owner reads before pointing the embedder at
    * the store.
    *
    * 100 TB shape: every stage is an audited plan — one md5
    * partial-agg + self-join for survivorship, row-local stats +
    * z-gate on the scan, zero-shuffle chunk explode, ONE
    * chunk-hash-keyed window for first-owner, per-source partial
    * agg; sources with zero surviving docs still report via the
    * LEFT join from the source dimension. */
  def x66RagCorpus(spark: SparkSession, dir: String): DataFrame =
    ragCorpus(Tables.spread(Tables.documents(spark, dir)))

  /** DataFrame-taking core of x66 (docs: doc_id, text, source,
    * n_chars) — the unit spec asserts on THIS. */
  def ragCorpus(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    // barrier after the quality scoring: left lazy, the q-gate
    // pushes below spread()'s fan-out into the single-split scan
    // (measured: one task, 2.3 s wall) — materialize the scored
    // narrow frame fanned out, then gate on the column
    val kept = graft.Engine.ensureParallelism(graft.Engine.snapshot(
        docs.select(col("doc_id"), col("source"),
            col("n_chars"), LlmQueries.textStatsCol.as("s"))
          .withColumn("q", LlmQueries.qualityFrom(col("s")))
          .select(col("doc_id"), col("source"), col("q"))))
      .filter(col("q") >= 0.5)
      .join(keep, Seq("doc_id"))
      .select(col("doc_id"), col("source"))
    val chunks = ragChunks(
        docs.join(kept.select(col("doc_id")), Seq("doc_id"))
          .select(col("doc_id"), col("text")),
        window = 64, stride = 48)
      .join(kept, Seq("doc_id"))
    val w = Window.partitionBy(col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
    val owned = chunks.withColumn("rn", row_number().over(w))
    val perSource = owned.groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L))
          .as("n_unique_chunks"),
        sum(when(col("rn") === 1, col("n_chunk_tok")).otherwise(0L))
          .as("unique_tokens"))
    val keptPer = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(keptPer, Seq("source"), "left")
      .join(perSource, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_unique_chunks"), lit(0L)).as("n_unique_chunks"),
        coalesce(col("unique_tokens"), lit(0L)).as("unique_tokens"))
  }

  val x66Sql: String =
    s"""WITH ${LlmQueries.statsCtesSql("source")},
       |dd AS (SELECT min(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(text)),
       |fz AS (SELECT doc_id, source,
       |    ${LlmQueries.qualitySql} AS q
       |  FROM m),
       |kept AS (SELECT f.doc_id, f.source FROM fz f
       |  JOIN dd ON dd.doc_id = f.doc_id WHERE f.q >= 0.5),
       |n2 AS (SELECT k.source, t.doc_id, t.ts, len(t.ts) AS n_tok
       |  FROM t JOIN kept k ON k.doc_id = t.doc_id
       |  WHERE len(t.ts) > 0),
       |c2 AS (SELECT source, doc_id, ts, n_tok,
       |    unnest(range(((greatest(n_tok - 64, 0) + 47) // 48) + 1))
       |      AS chunk_id
       |  FROM n2),
       |ch AS (SELECT source, doc_id, chunk_id,
       |    CAST(least(chunk_id * 48 + 64, n_tok) - chunk_id * 48
       |      AS BIGINT) AS n_chunk_tok,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(
       |          list_slice(ts, chunk_id * 48 + 1,
       |            least(chunk_id * 48 + 64, n_tok)),
       |          tkn -> ${LlmQueries.polySql("tkn")})),
       |      (acc, hv) -> (acc * 31 + hv) % 1000000007) AS chunk_hash
       |  FROM c2),
       |rk2 AS (SELECT source, n_chunk_tok,
       |    row_number() OVER (PARTITION BY chunk_hash
       |      ORDER BY doc_id, chunk_id) AS rn
       |  FROM ch),
       |ps AS (SELECT source, count(*) AS n_chunks,
       |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_unique_chunks,
       |    CAST(sum(CASE WHEN rn = 1 THEN n_chunk_tok ELSE 0 END)
       |      AS BIGINT) AS unique_tokens
       |  FROM rk2 GROUP BY 1),
       |kp AS (SELECT source, count(*) AS n_docs_kept
       |  FROM kept GROUP BY 1),
       |base AS (SELECT source, count(*) AS n_docs FROM documents
       |  GROUP BY 1)
       |SELECT b.source, b.n_docs,
       |  coalesce(kp.n_docs_kept, 0) AS n_docs_kept,
       |  coalesce(ps.n_chunks, 0) AS n_chunks,
       |  coalesce(ps.n_unique_chunks, 0) AS n_unique_chunks,
       |  coalesce(ps.unique_tokens, 0) AS unique_tokens
       |FROM base b
       |LEFT JOIN kp ON kp.source = b.source
       |LEFT JOIN ps ON ps.source = b.source""".stripMargin

  // ---- x70: tokenizer fertility by language ------------------------

  /** x70: TOKENIZER FERTILITY BY LANGUAGE — tokens-per-word on the
    * held-out split, reported per language: the standard multilingual
    * tokenizer-quality metric (a merge table trained on an
    * English-heavy mix over-segments the other languages; fertility
    * is the number that says by how much, and drives vocab-size and
    * mixing decisions). Consumes x68's per-document accounting (the
    * same train→apply lifecycle, so the three artifacts — x67's
    * table, x68's counts, this report — cannot drift apart) with
    * `lang` threaded through from the held-out scan itself — no
    * second documents scan, no doc-keyed join — and closes with one
    * ≤|langs|-row rollup; fertility ships in ppm
    * via integer division of exact token/word sums (carried through
    * decimal(38,0) — 10⁶·Σtokens outgrows a long at ~10¹³ tokens per
    * language, i.e. exactly the corpus size this report exists for).
    *
    * 100 TB shape: everything corpus-sized is inside x68 (one
    * explode + one partial-agg groupBy; BPE work is vocab-bounded);
    * this adds only a ≤|langs|-row closing agg over x68's per-doc
    * frame — lang rides the held-out rows, so there is no second
    * documents scan to re-shuffle at corpus scale. */
  def x70TokenFertility(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = bpeHeldoutPerDoc(spark, dir)
    perDoc
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        expr("cast((cast(n_tokens as decimal(38,0)) * 1000000) " +
          "div n_words as bigint)").as("fertility_ppm"))
  }

  // ---- x72: tokenizer compression ratio by source ------------------

  /** x72: TOKENIZER COMPRESSION BY SOURCE — bytes per token on the
    * held-out split, per source: fertility's (x70) sibling and the
    * other tokenizer-quality number (a tokenizer that compresses one
    * feed at 3 bytes/token and another at 1.5 doubles the effective
    * context window of the first), driving source mixing and vocab
    * sizing the same way fertility drives language decisions. Rides
    * the SAME per-doc frame as x68/x70 — `source` and the document
    * byte length are threaded through from the held-out scan, so the
    * report is x68 + one ≤|sources|-row rollup, no second documents
    * scan. Ratio ships in ppm via integer division over
    * decimal(38,0) (the x70 overflow discipline).
    *
    * 100 TB shape: identical to x70 — everything corpus-sized is
    * inside x68; this adds one tiny closing agg. */
  def x72TokenCompression(spark: SparkSession, dir: String): DataFrame = {
    bpeHeldoutPerDoc(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_bytes"),
        col("n_tokens"),
        expr("cast((cast(n_bytes as decimal(38,0)) * 1000000) " +
          "div n_tokens as bigint)").as("bytes_per_token_ppm"))
  }

  val x72Sql: String =
    bpeHeldoutSqlCtes +
      s"""
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(n_bytes) AS HUGEINT) * 1000000 //
         |    sum(n_tokens) AS BIGINT) AS bytes_per_token_ppm
         |FROM pd GROUP BY 1""".stripMargin

  val x70Sql: String =
    bpeHeldoutSqlCtes +
      s"""
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(CAST(sum(n_tokens) AS HUGEINT) * 1000000 //
         |    sum(n_words) AS BIGINT) AS fertility_ppm
         |FROM pd GROUP BY 1""".stripMargin
}
