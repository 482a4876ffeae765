package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Components, Dedup}

/** Streaming near-dedup against the PERSISTED d13 index — the
  * production incremental-ingest lifecycle, completing what
  * `StreamingDedup` (LSH-keyed in-query state) and `Dedup.
  * nearDupIndexBuild/Probe` (batch build/probe halves) each cover
  * alone: documents arrive as micro-batches, every batch probes the
  * ON-DISK band table + feature store, and its surviving
  * representatives are APPENDED to that same index, so later batches
  * dedup against everything that came before without the corpus ever
  * living in query state or being rescanned.
  *
  * Per-batch semantics (deterministic, order-free within a batch):
  *  1. WITHIN-batch near-dup pairs (the exact d2 LSH + Jaccard
  *     pipeline) collapse transitively — each connected family keeps
  *     its min-doc_id representative, the rest are dups with reason
  *     'batch' (what a production ingest does: batch-local dedup
  *     before touching the shared index);
  *  2. representatives probe the persisted index
  *     (Dedup.nearDupIndexProbe — batch side is the only thing
  *     scanned); any hit is a dup with reason 'corpus';
  *  3. survivors' band rows + feature sets append to the index
  *     (probe BEFORE append, so a doc never matches itself), and the
  *     per-doc verdicts land under `path/verdicts/ingest_id=<batch>`.
  *
  * Idempotence: the whole step is guarded by a `_ingested_<id>`
  * marker written LAST — a restart that replays a completed batch
  * sees the marker and skips, so neither the index nor the verdicts
  * double up (the VdmsSink batch-id discipline). Markers use the
  * local FS API; on a cluster the path lives on the shared FS and
  * the marker check is the same one-file read.
  *
  * Note on the mega-bucket cap: the build-time cap is a
  * corpus-population property; appends are uncapped (a batch can't
  * see the population). The documented lifecycle is periodic
  * re-build/compaction (the s21 analog), which re-applies it.
  *
  * 100 TB shape: each micro-batch costs (batch-sized LSH + CC over
  * batch-local pairs) + two keyed joins against the band/feature
  * tables pruned to the batch's band hashes — the standing corpus is
  * only ever touched through the posting-list join, never rescanned.
  */
object IndexedDedup {

  /** One ingest step (exposed for the parity spec and for batch
    * backfills): probe-then-append `batch` against the index at
    * `path`, writing verdicts (doc_id, is_dup, reason) under
    * `path/verdicts`. */
  def ingestBatch(spark: SparkSession, path: String, batch: DataFrame,
      threshold: Double, batchId: Long): Unit = {
    val marker = java.nio.file.Paths.get(path, s"_ingested_$batchId")
    if (java.nio.file.Files.exists(marker)) return
    val docs = batch.select(col("doc_id"), col("text"))
      .localCheckpoint(true) // a streaming micro-batch frame is
                             // re-evaluated per action; pin it once
    // 1. within-batch transitive collapse to min-id representatives
    val pairs = Dedup.nearDupPairs(docs, threshold)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val batchDups = Components.connectedComponents(pairs)
      .filter(col("label") =!= col("node"))
      .select(col("node").as("doc_id"))
    val reps = docs.join(batchDups, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // 2. representatives probe the standing index
    val corpusHits =
      if (new java.io.File(s"$path/bands").exists())
        Dedup.nearDupIndexProbe(spark, path, reps, threshold)
          .select(col("doc_batch").as("doc_id")).distinct()
      else docs.filter(lit(false)).select(col("doc_id"))
    val verdicts = docs.select(col("doc_id"))
      .join(batchDups.withColumn("batch_dup", lit(true)),
        Seq("doc_id"), "left")
      .join(corpusHits.withColumn("corpus_dup", lit(true)),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("batch_dup"), lit(false)) ||
          coalesce(col("corpus_dup"), lit(false))).as("is_dup"),
        when(col("batch_dup"), "batch")
          .when(col("corpus_dup"), "corpus").as("reason"))
      .localCheckpoint(true)
    // 3. append survivors to the index, then verdicts, then marker
    val survivors = reps.join(
      verdicts.filter(col("is_dup")).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val features = Dedup.shingleFeatures(survivors)
    graft.sources.Writers.writePartitioned(
      Dedup.bandRowsOf(features), s"$path/bands", Seq("band"),
      mode = "append")
    features.select(col("doc_id"), col("hashes"))
      .write.mode("append").parquet(s"$path/features")
    verdicts.write.mode("overwrite")
      .parquet(s"$path/verdicts/ingest_id=$batchId")
    java.nio.file.Files.createFile(marker)
  }

  /** The streaming wrapper: every micro-batch runs `ingestBatch`
    * with its batch id (foreachBatch — the index is a cross-batch
    * external store, exactly the VdmsSink sink shape). AvailableNow
    * drains the source and stops, the batch-friendly trigger the
    * parity spec relies on. */
  def start(docs: DataFrame, path: String, threshold: Double,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, path, batch, threshold, id)
      }
      .start()
}
