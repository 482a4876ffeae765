package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Lexical retrieval + filtered vector search — the query-time half
  * of the corpus the d/x families curate. BM25 keyword search (x28)
  * and TF-IDF keyword extraction (x29) are the classical lexical
  * complement to the s-family's vector search; s16 is vector search
  * under a metadata predicate (the "filtered ANN" every production
  * vector store serves). Oracle parity follows LlmQueries' rules:
  * integer arithmetic until the score edge, fixed-order double
  * folds, round(...,6) at the output only, and ranking on the
  * ROUNDED score so a last-ulp ln() divergence can never flip a
  * rank boundary across engines.
  */
object RetrievalQueries {
  import LlmQueries.{tsSql, cosSql}

  // ---- x28: BM25 keyword search ------------------------------------

  /** The fixed query-term set (sorted — score terms always add in
    * this order on both engines). */
  private[queries] val bm25Terms = Seq("hash", "merge", "spark", "window")

  /** x28: BM25 ranked keyword search (k1=1.2, b=0.75, Lucene's
    * +1-smoothed idf) for a small fixed term set — the lexical
    * retrieval primitive next to the s-family's vector search.
    *
    * 100 TB shape: because the query-term set is small (search
    * queries always are), NOTHING explodes — each doc computes
    * (dl, tf per term) row-locally in ONE tokenize pass (the bind
    * trick), the corpus statistics (N, total_dl, df per term) are
    * ONE tiny global agg broadcast back, scoring is a narrow
    * projection, and the top-20 is TakeOrderedAndProject (per-
    * partition heaps + driver merge of 20-row heads, never a global
    * sort). One scan + one scalar-row exchange end-to-end.
    *
    * Rank is computed on round(score, 6) with doc_id tiebreak so the
    * cut at rank 20 is engine-stable even if ln() differs in the
    * last ulp. */
  def bm25(docs: DataFrame, terms: Seq[String], topK: Int): DataFrame = {
    val ts = terms.sorted
    val feat = docs.select(col("doc_id"),
      TextFunctions.bind(TextFunctions.tokens(col("text")), t =>
        struct(
          (size(t).cast("long").as("dl") +:
            ts.map(w => size(filter(t, x => x === lit(w)))
              .cast("long").as(s"tf_$w"))): _*)).as("s"))
      .select(col("doc_id") +: (col("s.dl").as("dl") +:
        ts.map(w => col(s"s.tf_$w").as(s"tf_$w"))): _*)
    val stats = feat.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("total_dl") +:
        ts.map(w => count(when(col(s"tf_$w") > 0, 1)).as(s"df_$w"))): _*)
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    def contrib(w: String): Column = {
      val tf = col(s"tf_$w"); val df = col(s"df_$w")
      when(tf > 0,
        log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0)) *
          (tf.cast("double") * lit(2.2)) /
          (tf.cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))))
        .otherwise(lit(0.0))
    }
    val scored = feat.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        ts.map(w => when(col(s"tf_$w") > 0, 1L).otherwise(0L))
          .reduce(_ + _).as("n_matched"),
        round(ts.map(contrib).reduce(_ + _), 6).as("score"))
      .filter(col("n_matched") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
    scored.withColumn("rnk",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("int"))
  }

  def x28Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), bm25Terms, topK = 20)

  val x28Sql: String = {
    val ts = bm25Terms.sorted
    val tfCols = ts.map(w =>
      s"CAST(len(list_filter(ts, x -> x = '$w')) AS BIGINT) AS tf_$w")
      .mkString(",\n    ")
    val dfCols = ts.map(w => s"count(*) FILTER (tf_$w > 0) AS df_$w")
      .mkString(",\n    ")
    val avgdl = "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val contribs = ts.map { w =>
      s"""CASE WHEN tf_$w > 0 THEN
         |      ln((n_docs - df_$w + 0.5) / (df_$w + 0.5) + 1.0) *
         |        (CAST(tf_$w AS DOUBLE) * 2.2) /
         |        (CAST(tf_$w AS DOUBLE) +
         |          1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / $avgdl)))
         |    ELSE 0.0 END""".stripMargin
    }.mkString(" +\n    ")
    val matched = ts.map(w => s"CASE WHEN tf_$w > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |f AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM t),
       |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl,
       |    $dfCols
       |  FROM f),
       |sc AS (SELECT doc_id, dl,
       |    CAST($matched AS BIGINT) AS n_matched,
       |    round($contribs, 6) AS score
       |  FROM f CROSS JOIN st),
       |r AS (SELECT doc_id, dl, n_matched, score,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM sc WHERE n_matched > 0)
       |SELECT doc_id, dl, n_matched, score, rnk FROM r WHERE rnk <= 20""".stripMargin
  }

  // ---- x29: TF-IDF keyword extraction ------------------------------

  /** x29: per-document keyword extraction — the top-3 terms of each
    * doc by tf·idf (idf = ln(N/df), df over the whole corpus). The
    * auto-tagging step of a corpus pipeline (and the document-side
    * dual of x28: x28 scores docs for a query, x29 names each doc's
    * most query-worthy terms).
    *
    * 100 TB shape: tokens explode row-locally and immediately
    * partial-aggregate, so the shuffle carries one row per distinct
    * (doc, term) — the d8 discipline; df is a second partial agg over
    * those rows keyed by term (bounded by vocabulary); the df join is
    * a keyed equi-join both sides of which are already term-clustered
    * (ReuseExchange collapses the scan). Per-doc top-3 is a
    * WindowGroupLimit, ranked on the ROUNDED score (term tiebreak) so
    * the cut is engine-stable. */
  def tfidfKeywords(docs: DataFrame, topK: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
  }

  def x29TfidfKeywords(spark: SparkSession, dir: String): DataFrame =
    tfidfKeywords(Tables.spread(Tables.documents(spark, dir)), topK = 3)

  val x29Sql: String =
    s"""WITH t AS (SELECT doc_id, $tsSql AS ts FROM documents),
       |tk AS (SELECT doc_id, unnest(ts) AS term FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |sc AS (SELECT doc_id, term, tf,
       |    round(CAST(tf AS DOUBLE) *
       |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT doc_id, term, tf, tfidf,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tfidf DESC, term) AS INT) AS rnk
       |  FROM sc)
       |SELECT doc_id, term, tf, tfidf, rnk FROM r WHERE rnk <= 3""".stripMargin

  // ---- s16: filtered ANN (metadata predicate + IVF) -----------------

  /** s16: FILTERED vector search — s6's IVF nprobe=2 plan with a
    * metadata predicate (label = 2) on the corpus side: the
    * "filtered ANN" shape every production vector store serves
    * (search only among vectors passing a structured filter).
    *
    * The predicate composes with the index instead of fighting it:
    * cell assignment is per-row (a narrow argmax over one broadcast
    * centroid row), so filtering the corpus BEFORE assignment is
    * semantically identical to filtering the posting lists at serve
    * time — and Catalyst pushes `label = 2` into the parquet scan
    * (PushedFilters), so non-matching vectors are never even read.
    * Queries stay unfiltered (vec_id < 5) and probe their 2 nearest
    * cells as in s6. At 100 TB this is the high-selectivity regime
    * where pre-filter beats post-filter: the filtered corpus is the
    * thing the equi-join sees, so top-k can never come back short of
    * matching candidates that exist. */
  def s16FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.knnIvfProbe(
      emb.filter(col("label") === 2),
      emb.filter(col("vec_id") < 5),
      emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
  }

  val s16Sql: String = {
    def assign(src: String, maxCrn: Int) =
      s"""SELECT vec_id, embedding, cell FROM (
         |  SELECT v.vec_id, v.embedding,
         |    CAST(row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      ${cosSql("v.embedding", "c.embedding")} DESC, c.vec_id)
         |      AS INT) AS crn,
         |    c.vec_id AS cell
         |  FROM ($src) v CROSS JOIN cent c
         |) WHERE crn <= $maxCrn""".stripMargin
    s"""WITH cent AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
       |corpus_cells AS (${assign(
      "SELECT vec_id, embedding FROM embeddings WHERE label = 2", 1)}),
       |query_cells AS (${assign(
      "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5", 2)}),
       |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "c.embedding")} AS cos
       |  FROM corpus_cells c JOIN query_cells q
       |    ON q.cell = c.cell AND q.vec_id <> c.vec_id),
       |r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER
       |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT)
       |    AS rnk, cos FROM p)
       |SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
       |FROM r WHERE rnk <= 3""".stripMargin
  }

  // ---- x40: persisted inverted index + BM25 serve ------------------

  /** x40: the PERSISTED lexical index — the s10 build-once/serve-many
    * lifecycle for BM25: postings (term, doc_id, tf) are materialized
    * partitioned BY TERM alongside a doc-length table and a one-row
    * corpus-stats table, and the x28 query is served FROM the saved
    * index — the serve-path scan prunes to the query terms'
    * partition directories and never touches the documents table.
    * The oracle is x28's from-scratch SQL: a drifted index (stale
    * stats, lost postings, wrong pruning) breaks the hash.
    *
    * Float discipline: per-term contributions are re-assembled into
    * SORTED term order via conditional sums before the final add
    * (each posting appears once per (doc, term), and adding the
    * 0.0-valued absent terms is IEEE-exact), so the serve-path score
    * is bit-identical to x28's fixed-order fold — summing posting
    * rows in aggregation order would flip last-ulp ranks.
    *
    * 100 TB shape: the build is the d8-discipline two-level agg; the
    * postings are laid out by TERM-HASH BUCKET (not by raw term — one
    * directory per vocabulary term is the classic small-files/
    * metadata explosion at a real 10⁶–10⁷-term vocabulary), and the
    * served scan prunes to the query terms' buckets via FOLDABLE
    * `pmod(hash(lit(term)), B)` predicates — Catalyst constant-folds
    * them to literals, so directory pruning happens at plan time
    * with no driver-side hashing. Bucket-count rule: B ≈ vocabulary
    * terms / 10⁵ (bounded below by the writer parallelism you want),
    * so each bucket holds ~10⁵ terms' postings in a handful of
    * row-group-sized files; df re-derives from the pruned+filtered
    * postings so serving needs no per-term stats row. The doclen
    * join is keyed by doc_id (broadcastable while postings for a
    * query are small — the high-selectivity regime an inverted index
    * exists for). */
  val lexBuckets: Int =
    sys.env.get("SPARK_GRAFT_LEX_BUCKETS").map(_.toInt).getOrElse(64)

  /** Run independent Spark ACTIONS (sink writes of already-pinned
    * inputs) as concurrent jobs and wait for ALL OF THEM TO SETTLE:
    * each action still sees the full session, the scheduler
    * interleaves their stages across the executor pool. A failure
    * rethrows on the caller only after every sibling has finished —
    * a fail-fast rethrow would let a foreachBatch replay's overwrite
    * of the same ingest_id directory race a still-running zombie
    * writer from the failed attempt, and the marker would then
    * certify a mixed partition. */
  private[graft] def awaitAll(actions: (() => Unit)*): Unit = {
    awaitAllWith(() => ())(actions: _*)
    ()
  }

  /** awaitAll where one action also PRODUCES a value (e.g. an eager
    * localCheckpoint pin riding the same concurrent wave as sink
    * writes). All actions settle before the first failure rethrows. */
  private[graft] def awaitAllWith[T](value: () => T)(
      actions: (() => Unit)*): T = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.util.{Failure, Success, Try}
    val futures: Seq[scala.concurrent.Future[Try[Any]]] =
      (value +: actions.map(a => () => a(): Any))
        .map(a => Future(a()).transform(Success(_)))
    val settled = Await.result(Future.sequence(futures), Duration.Inf)
    settled.collectFirst { case Failure(t) => t }.foreach(throw _)
    settled.head.get.asInstanceOf[T]
  }

  /** Foldable bucket-pruning predicate: the same murmur3 the writer
    * used, applied to the query-term LITERALS, so the optimizer
    * folds each to an int and the scan prunes to ≤|terms| bucket
    * directories. (Shared with the streaming IndexedLex serve.) */
  private[graft] def bucketPredFor(ts: Seq[String]) =
    ts.map(t => col("tbkt") === pmod(hash(lit(t)), lit(lexBuckets)))
      .reduce(_ || _)
  private def bucketPred(ts: Seq[String]) = bucketPredFor(ts)

  def x40LexIndexServe(spark: SparkSession, dir: String): DataFrame = {
    val ts = bm25Terms.sorted
    val docs = Tables.documents(spark, dir)
    val base = graft.TmpPaths.workDir(spark, "lexindex", dir)
    // tokenize ONCE (pinned) — postings, doclen and stats all read
    // the token arrays; without the pin the corpus tokenizes three
    // times, once inside each writer's plan
    val tok = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("toks")).localCheckpoint(true)
    val dl = tok.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    // the three sinks are independent reads of the SAME pinned token
    // frame — submit them as concurrent jobs (the scheduler overlaps
    // them across the executor pool; on a cluster this is the normal
    // multi-sink build shape, and at toy scale it folds three
    // job-submission floors into one wall-clock wait)
    awaitAll(
      () => tok.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .withColumn("tbkt", pmod(hash(col("term")), lit(lexBuckets)))
        // co-locate each bucket before the write: one task owns a
        // bucket's postings, so the layout is B directories × a few
        // row-group-sized files instead of tasks × B stripes
        .repartition(lexBuckets, col("tbkt"))
        .write.mode("overwrite").partitionBy("tbkt")
        .parquet(s"$base/postings"),
      () => dl.write.mode("overwrite").parquet(s"$base/doclen"),
      () => dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .write.mode("overwrite").parquet(s"$base/stats"))
    // serve: bucket-pruned postings scan (tbkt prunes directories,
    // term filters inside them) + df re-derivation + keyed doclen join
    val post = spark.read.parquet(s"$base/postings")
      .where(bucketPred(ts) && col("term").isin(ts: _*))
    bm25ServeFrom(post, spark.read.parquet(s"$base/doclen"),
      spark.read.parquet(s"$base/stats"), ts)
  }

  /** The BM25 serve plan shared by every persisted-lexical-index
    * consumer (x40, x41, streaming IndexedLex): pruned postings +
    * df re-derivation + keyed doclen join + the sorted-term-order
    * float reassembly that keeps the score bit-identical to x28's
    * fixed-order fold. `stats` must be ONE row (n_docs, total_dl). */
  private[graft] def bm25ServeFrom(post: DataFrame, doclen: DataFrame,
      stats: DataFrame, ts: Seq[String]): DataFrame = {
    val dfs = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val joined = post.join(broadcast(dfs), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    val contrib =
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0)) *
      (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val scored = joined
      .select(col("doc_id"), col("dl"), col("term"), contrib.as("c"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_matched"),
        ts.map(w => sum(when(col("term") === w, col("c")).otherwise(lit(0.0)))
          .as(s"c_$w")): _*)
      .select(col("doc_id"), col("dl"), col("n_matched"),
        round(ts.map(w => coalesce(col(s"c_$w"), lit(0.0))).reduce(_ + _), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
    scored.withColumn("rnk",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("int"))
  }

  /** Same answer as x28, by construction. */
  val x40Sql: String = x28Sql

  // ---- x41: incremental lexical-index update -----------------------

  /** x41: the daily-ingest half of the x40 lifecycle (s17's shape
    * for the lexical index): the standing index is built from the
    * corpus minus today's batch (doc_id % 10 == 3 stands in for the
    * new docs), the batch alone is tokenized and its postings
    * APPENDED under the same term-hash-bucket directories, and the one-row stats
    * table is REPLACED by the exact merge of old stats + batch
    * partials (counts and sums add — the x39 property). df is
    * re-derived from the pruned postings at serve time, so no
    * per-term stats need maintenance. Because appended postings use
    * the identical tokenize + count arithmetic, the updated index is
    * bit-identical to a full rebuild — the oracle is x28's
    * full-corpus SQL, and a drifted append (stale stats, lost
    * postings, double-counted docs) breaks the hash. The standing
    * corpus is never re-tokenized: the update cost is one narrow
    * pass over the BATCH plus a one-row stats merge. */
  def x41LexIndexUpdate(spark: SparkSession, dir: String): DataFrame = {
    val ts = bm25Terms.sorted
    val docs = Tables.documents(spark, dir)
    val standing = docs.filter(col("doc_id") % 10 =!= 3)
    val batch = docs.filter(col("doc_id") % 10 === 3)
    val base = graft.TmpPaths.workDir(spark, "lexindex_inc", dir)
    // tokenize each corpus slice ONCE (pinned) — same discipline as
    // x40: postings, doclen and stats all read the token arrays
    def tok(d: DataFrame) = d.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("toks")).localCheckpoint(true)
    def postings(t: DataFrame) = t
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("tbkt", pmod(hash(col("term")), lit(lexBuckets)))
      .repartition(lexBuckets, col("tbkt"))
    def doclen(t: DataFrame) = t.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    def stats(t: DataFrame) = doclen(t)
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    // build (standing corpus only) — term-hash-bucketed like x40,
    // three independent sinks off one pinned frame → concurrent
    // jobs; the BATCH tokenize has no dependency on any of them, so
    // it rides the same wave (the appends below, which DO share
    // directories with the overwrites, start only after the await)
    val tokStanding = tok(standing)
    val tokBatch = awaitAllWith(() => tok(batch))(
      () => postings(tokStanding).write.mode("overwrite")
        .partitionBy("tbkt").parquet(s"$base/postings"),
      () => doclen(tokStanding).write.mode("overwrite")
        .parquet(s"$base/doclen"),
      () => stats(tokStanding).write.mode("overwrite")
        .parquet(s"$base/stats"))
    // incremental update: batch-only passes, append + exact stats
    // merge; the two appends land in DIFFERENT directories →
    // concurrent too
    awaitAll(
      () => postings(tokBatch).write.mode("append")
        .partitionBy("tbkt").parquet(s"$base/postings"),
      () => doclen(tokBatch).write.mode("append")
        .parquet(s"$base/doclen"))
    val merged = spark.read.parquet(s"$base/stats")
      .unionByName(stats(tokBatch))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
      .collect()(0)
    import spark.implicits._
    val mergedStats = Seq((merged.getLong(0), merged.getLong(1)))
      .toDF("n_docs", "total_dl")
    // persist the merged stats row (the lifecycle artifact the next
    // ingest reads) but SERVE from the in-memory frame — the serve
    // plan needs no read-back of a row we just computed
    mergedStats.write.mode("overwrite").parquet(s"$base/stats_merged")
    // serve from the updated index (same bucket-pruned path as x40)
    val post = spark.read.parquet(s"$base/postings")
      .where(bucketPred(ts) && col("term").isin(ts: _*))
    bm25ServeFrom(post, spark.read.parquet(s"$base/doclen"),
      mergedStats, ts)
  }

  /** Full-corpus x28 — the updated index must be indistinguishable
    * from a fresh build. */
  val x41Sql: String = x28Sql

  // ---- x69: multi-batch lexical-index ingest ----------------------

  /** x69: the INGEST-PARTITIONED lexical index — the corpus arrives
    * in three batches through `IndexedLex.ingestBatch` (the batch
    * API of the streaming ingest operator — the same code path a
    * foreachBatch micro-batch runs), each landing postings/doclen/
    * one-row stats partials under its own `ingest_id` partition;
    * serving sums the stats partials and runs the x40 bucket-pruned
    * BM25 over all partitions. Oracle: x28's from-scratch SQL over
    * the whole corpus — a lost batch, double-ingested partition or
    * drifted stats merge breaks the hash. (The streaming wrapper +
    * replay idempotence are spec-gated in Round11Spec.) */
  def x69LexIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = graft.TmpPaths.workDir(spark, "lexindex_ing", dir)
    // wipe so every run re-ingests (markers would otherwise skip the
    // work and the timing would lie)
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
    // pipelined backfill: batch i+1's tokenize overlaps batch i's
    // sink writes (one barrier per batch instead of two)
    graft.streaming.IndexedLex.backfill(spark, base,
      (0L until 3L).map(b => (docs.filter(col("doc_id") % 3 === b), b)))
    graft.streaming.IndexedLex.serve(spark, base, bm25Terms)
  }

  /** Indistinguishable from a fresh full build, like x40/x41. */
  val x69Sql: String = x28Sql

  // ---- x71: ingest → COMPACT → serve ------------------------------

  /** x71: the COMPACTED lexical index under the hash gate — x69's
    * three-batch ingest followed by `IndexedLex.compact` (the s21-
    * cadence rebuild: per-batch postings/doclen/stats partials
    * collapse into single layouts, stats to ONE row, swapped in via
    * the staged marker-certified rename) and the same bucket-pruned
    * BM25 serve. Oracle: x28's from-scratch SQL — compaction that
    * loses a posting row, double-counts a stats partial, or breaks
    * the bucket layout breaks the hash. (Crash-recovery and
    * idempotence are spec-gated in Round12Spec.)
    *
    * 100 TB shape: the ingest is x69's; compaction adds one
    * repartition-by-bucket write over stored postings (no
    * re-tokenize), a ≤|batches|-row stats fold, and O(1) renames. */
  def x71LexCompactServe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = graft.TmpPaths.workDir(spark, "lexindex_cmp", dir)
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
    graft.streaming.IndexedLex.backfill(spark, base,
      (0L until 3L).map(b => (docs.filter(col("doc_id") % 3 === b), b)))
    graft.streaming.IndexedLex.compact(spark, base)
    graft.streaming.IndexedLex.serve(spark, base, bm25Terms)
  }

  /** The compacted index must serve exactly what a fresh build
    * serves. */
  val x71Sql: String = x28Sql

  // ---- s22: hybrid search via reciprocal-rank fusion ---------------

  /** s22: HYBRID retrieval — the lexical leg (x28's BM25 top-20) and
    * the vector leg (brute-force cosine top-20 against one query
    * embedding) fused with reciprocal-rank fusion,
    * score = Σ_legs 1/(60 + rank)  (Cormack & Clarke's k=60), the
    * standard way production search serves "keyword AND semantic"
    * without calibrating the two incomparable score scales. A doc
    * absent from a leg contributes 0 from that leg (rank sentinel 0
    * in the output). The fixed bm25Terms set is the lexical query;
    * vec_id 0's embedding stands in for its encoder output — the
    * corpus row itself is excluded from the vector leg (it IS the
    * query), while the lexical leg keeps all docs.
    *
    * Exactness: both legs rank before any float mixing (BM25 on its
    * rounded score, cosine on the exact fixed-order fold both engines
    * restate), so the fused input is two INTEGER rank columns; the
    * RRF score is the same two-term double sum from integers on both
    * engines, rounded once at the edge, and the final rank breaks
    * ties by doc_id.
    *
    * 100 TB shape: each leg ends in TakeOrderedAndProject (per-
    * partition heaps, never a global sort), so the fusion input is
    * ≤ 2·k rows — the full-outer join and re-rank are driver-scale
    * no matter the corpus size. The query embedding broadcasts; the
    * vector leg is one narrow projection over the embeddings scan. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      kLeg: Int, kOut: Int): DataFrame = {
    val lex = bm25(docs, terms, kLeg)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val vecTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        TextFunctions.cosineSim(col("embedding"), col("qe")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(kLeg)
      .withColumn("vec_rnk", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("vec_rnk"))
    lex.join(vecTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rnk"), lit(0)).as("lex_rnk"),
        coalesce(col("vec_rnk"), lit(0)).as("vec_rnk"))
      .withColumn("rrf", round(
        when(col("lex_rnk") > 0,
          lit(1.0) / (lit(60.0) + col("lex_rnk").cast("double")))
          .otherwise(lit(0.0)) +
        when(col("vec_rnk") > 0,
          lit(1.0) / (lit(60.0) + col("vec_rnk").cast("double")))
          .otherwise(lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id")).limit(kOut)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
  }

  def s22HybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(spark, dir), Tables.embeddings(spark, dir),
      bm25Terms, kLeg = 20, kOut = 10)

  val s22Sql: String =
    s"""WITH lex AS (SELECT doc_id, rnk AS lex_rnk FROM ($x28Sql)),
       |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (SELECT vec_id AS doc_id,
       |    ${cosSql("embedding", "qe")} AS cos
       |  FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
       |vtop AS (SELECT doc_id, cos FROM cand
       |  ORDER BY cos DESC, doc_id LIMIT 20),
       |vec AS (SELECT doc_id, CAST(row_number() OVER
       |    (ORDER BY cos DESC, doc_id) AS INT) AS vec_rnk FROM vtop),
       |f AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    coalesce(lex_rnk, 0) AS lex_rnk,
       |    coalesce(vec_rnk, 0) AS vec_rnk
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
       |sc AS (SELECT doc_id, lex_rnk, vec_rnk,
       |    round((CASE WHEN lex_rnk > 0
       |        THEN 1.0 / (60.0 + CAST(lex_rnk AS DOUBLE)) ELSE 0.0 END)
       |      + (CASE WHEN vec_rnk > 0
       |        THEN 1.0 / (60.0 + CAST(vec_rnk AS DOUBLE)) ELSE 0.0 END),
       |      6) AS rrf
       |  FROM f),
       |r AS (SELECT doc_id, lex_rnk, vec_rnk, rrf, CAST(row_number()
       |    OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rnk FROM sc)
       |SELECT doc_id, lex_rnk, vec_rnk, rrf, rnk FROM r
       |WHERE rnk <= 10""".stripMargin
}
