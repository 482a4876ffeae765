package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions
import graft.queries.RetrievalQueries

/** Streaming ingest for the PERSISTED LEXICAL INDEX — x40/x41's
  * production arrival path, completing the index-lifecycle symmetry
  * the engine already ships for vectors (s17 append) and near-dup
  * bands (IndexedDedup): documents arrive as micro-batches, every
  * batch is tokenized ONCE and lands its postings (term-hash-bucket
  * layout), doclen rows and corpus-stats PARTIAL under its own
  * `ingest_id=<batch>` partition; the standing index is never read,
  * rewritten or re-tokenized. Serving aggregates the one-row stats
  * partials (counts and sums add — the x39 mergeable-profile
  * property) and runs the exact x40 bucket-pruned BM25 plan, so a
  * streamed index is bit-identical to a fresh batch build — the
  * x69 hash gate and the streaming parity spec both certify it.
  *
  * Idempotence: the IndexedDedup discipline verbatim — every write
  * is scoped to the batch's `ingest_id` partition with overwrite
  * semantics (an at-least-once replay REPLACES its own partial
  * output), and a `_ingested_<id>` marker written last through the
  * Hadoop FileSystem API short-circuits completed batches.
  *
  * 100 TB shape: each micro-batch costs one narrow tokenize pass
  * over the BATCH plus three batch-sized writes; stats stay one row
  * per batch (compact on the s21 cadence if batch count ever
  * matters); serving prunes to the query terms' hash buckets across
  * all ingest partitions — the same foldable-predicate pruning as
  * x40, independent of how many batches built the index.
  */
object IndexedLex {

  /** One ingest step (exposed for batch backfills and the x69 gate):
    * tokenize `batch` once, write postings/doclen/stats under
    * `ingest_id=<batchId>`. */
  def ingestBatch(spark: SparkSession, path: String, batch: DataFrame,
      batchId: Long): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val marker = new org.apache.hadoop.fs.Path(path, s"_ingested_$batchId")
    val fs = marker.getFileSystem(hconf)
    if (fs.exists(marker)) return
    // one tokenize pass, pinned — postings, doclen and stats all
    // read the token arrays (the x40/x41 discipline)
    val tok = batch.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("toks")).localCheckpoint(true)
    val dl = tok.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"))
    // the three sinks land in DIFFERENT ingest_id-scoped directories
    // off the same pinned frame — concurrent jobs (the x40/x41
    // awaitAll shape); the marker still writes strictly LAST
    RetrievalQueries.awaitAll(
      () => tok.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .withColumn("tbkt",
          pmod(hash(col("term")), lit(RetrievalQueries.lexBuckets)))
        .repartition(RetrievalQueries.lexBuckets, col("tbkt"))
        .write.mode("overwrite").partitionBy("tbkt")
        .parquet(s"$path/postings/ingest_id=$batchId"),
      () => dl.write.mode("overwrite")
        .parquet(s"$path/doclen/ingest_id=$batchId"),
      () => dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .write.mode("overwrite").parquet(s"$path/stats/ingest_id=$batchId"))
    fs.create(marker, true).close()
  }

  /** The streaming wrapper (foreachBatch — the index is a
    * cross-batch external store, the VdmsSink/IndexedDedup shape);
    * AvailableNow drains the source and stops. */
  def start(docs: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, path, batch, id)
      }
      .start()

  /** Serve the streamed index: the exact x40 bucket-pruned BM25 plan
    * over all ingest partitions, with the corpus stats assembled by
    * summing the per-batch one-row partials. */
  def serve(spark: SparkSession, path: String,
      terms: Seq[String]): DataFrame = {
    val ts = terms.sorted
    val post = spark.read.parquet(s"$path/postings")
      .where(RetrievalQueries.bucketPredFor(ts) && col("term").isin(ts: _*))
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_dl")).as("total_dl"))
    RetrievalQueries.bm25ServeFrom(post,
      spark.read.parquet(s"$path/doclen"), stats, ts)
  }
}
